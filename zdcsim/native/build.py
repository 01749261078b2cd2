"""Build the native kernels shared library with g++.

Invoked lazily on first import of :mod:`zdcsim.native`; the .so is cached
next to the sources. ``python -m zdcsim.native.build`` forces a rebuild.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(__file__), "src", "prep_kernels.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libzdc_native.so")


def lib_path() -> str:
    return _LIB


def build(force: bool = False) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-march=native", "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise RuntimeError(f"native build failed: {detail}") from e
    return _LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
