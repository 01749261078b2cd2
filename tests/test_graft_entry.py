"""Driver-contract checks for __graft_entry__ (trace-level; the driver does
the real compile/execute)."""

import sys

sys.path.insert(0, "/root/repo")

import jax


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (16, 56, 30)
    assert out.dtype == jax.numpy.float32


def test_dryrun_multichip_completes_within_budget():
    """Regression guard for the driver's multi-chip check: round 1 shipped a
    full-size-model dryrun that timed out the external scoreboard (rc=124,
    MULTICHIP_r01.json) and no test exercised it. Runs the real
    dryrun_multichip(8) in a fresh interpreter under a hard wall-clock
    budget well inside the driver's window."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
