"""On-device tiled-switch MoE dispatch — single-program grouped decoding.

The serving problem: dense all-expert decoding costs E x the FLOPs; host-side
grouped dispatch costs device->host round trips per batch (fatal on
remote-relay links, expensive anywhere). This module does grouped dispatch
entirely INSIDE one XLA program with static shapes:

1. route: ``idx = argmax(router(cond))``;
2. stable-sort samples by expert: each expert's samples become contiguous;
3. align each expert's segment up to a multiple of the tile size ``T`` in a
   virtual padded layout (clamp-replicated boundary samples fill the pad);
4. ``lax.scan`` over the static chunk count ``K = B/T + E``; each chunk
   belongs to exactly ONE expert (alignment guarantees it) and decodes its
   ``T`` samples through ``lax.switch`` over per-expert generator closures —
   only the owning expert's weights are touched;
5. scatter chunk outputs back to original sample order (pad rows write to a
   dummy slot).

Cost: ``B + (<= E*T)`` single-expert decodes vs ``E*B`` dense — e.g. at
B=1024, E=3, T=128 that is <=1.4k vs 3k sample-decodes. All data-dependent
quantities (counts, offsets) stay on device as dynamic *indices*, never as
shapes. ``lax.switch`` under ``scan`` (not ``vmap``!) keeps branches real:
vmapping a switch would lower it to an execute-all-branches select — dense
again.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def tiled_switch_decode(
    decode_fns: Sequence[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]],
    idx: jnp.ndarray,
    cond: jnp.ndarray,
    noise: jnp.ndarray,
    out_shape: Tuple[int, ...],
    tile: int = 128,
    in_scan_scatter: bool = False,
    decode_dyn: Callable | None = None,
) -> jnp.ndarray:
    """Decode each sample with its routed expert, one XLA program.

    Args:
        decode_fns: per-expert closures ``(noise[T,Z], cond[T,C]) -> [T,*out]``.
        idx: ``[B]`` int expert assignment.
        cond: ``[B, C]`` conditioning; noise: ``[B, Z]``.
        out_shape: per-sample output shape (e.g. ``(H, W)``).
        tile: chunk size ``T`` (must divide B).
        in_scan_scatter: scatter each tile's output into the result buffer
            INSIDE the scan (buffer as carry, in-place per XLA loop aliasing)
            instead of stacking ``[K, T, *out]`` and scattering afterwards.
            Skips materializing + re-reading the stacked intermediate (the
            w=0.125 leaf-op budget shows the stack write as 11% and the
            post-scan unpermute as ~13% of bulk runtime — BENCH_LOG
            "round-4 student budget").
        decode_dyn: optional BRANCHLESS decoder ``(e_k, noise, cond) ->
            [T, *out]`` taking the tile's expert index as a traced scalar
            (typically gathering that expert's weights by dynamic index).
            Replaces the per-tile ``lax.switch`` — the scan body becomes
            uniform (no conditional machinery; the w=0.125 leaf-op budget
            shows the conditional wrapper at ~23% of branch time). Cost:
            one weight-tree gather per tile instead of a picked branch.
            ``decode_fns`` still provides the expert count and output
            dtype and must decode identically.
    Returns:
        ``[B, *out_shape]`` routed outputs.
    """
    e_count = len(decode_fns)
    b = idx.shape[0]
    if b % tile != 0:
        raise ValueError(f"batch {b} must be a multiple of tile {tile}")
    k_chunks = b // tile + e_count  # static upper bound on aligned chunks

    counts = jnp.bincount(idx, length=e_count)  # [E]
    padded = ((counts + tile - 1) // tile) * tile
    aligned_off = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(padded)])  # [E+1]
    seg_start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])  # [E+1]
    perm = jnp.argsort(idx, stable=True)  # [B] sorted-order -> source row
    total_aligned = aligned_off[-1]

    lane = jnp.arange(tile)

    def chunk_rows(k):
        """Source rows [T] for aligned chunk k, or dummy row b for unused."""
        pos = k * tile
        e_k = jnp.clip(
            jnp.searchsorted(aligned_off[1:], pos, side="right"), 0, e_count - 1
        )
        local = pos - aligned_off[e_k] + lane
        # clamp into the expert's real segment: pad lanes replicate the last
        # real sample (same expert + same per-row noise => same output).
        src = seg_start[e_k] + jnp.minimum(local, jnp.maximum(counts[e_k] - 1, 0))
        rows = perm[src]
        used = (pos < total_aligned) & (counts[e_k] > 0)
        return jnp.where(used, rows, b), e_k

    def run_tile(e_k, z, c):
        if decode_dyn is not None:
            return decode_dyn(e_k, z, c)
        return jax.lax.switch(e_k, list(decode_fns), z, c)

    if in_scan_scatter:
        def body_scatter(out, k):
            rows, e_k = chunk_rows(k)
            c = cond[jnp.minimum(rows, b - 1)]
            z = noise[jnp.minimum(rows, b - 1)]
            img = run_tile(e_k, z, c)
            # dummy row b absorbs unused lanes; duplicates rewrite the same
            # value (replicated pad samples are bit-identical).
            return out.at[rows].set(img, mode="drop"), None

        img_dtype = jax.eval_shape(
            decode_fns[0],
            jax.ShapeDtypeStruct((tile, noise.shape[1]), noise.dtype),
            jax.ShapeDtypeStruct((tile, cond.shape[1]), cond.dtype),
        ).dtype
        out0 = jnp.zeros((b + 1, *out_shape), img_dtype)
        # Under shard_map the inputs carry varying-manual-axes (vma) type
        # annotations; the scan carry must match the body output's vma or
        # tracing fails. Mark the fresh buffer varying over the same axes
        # as the routed indices.
        vma = tuple(getattr(jax.typeof(idx), "vma", ()) or ())
        if vma:
            out0 = jax.lax.pcast(out0, vma, to="varying")
        out, _ = jax.lax.scan(body_scatter, out0, jnp.arange(k_chunks))
        return out[:b]

    def body(carry, k):
        rows, e_k = chunk_rows(k)
        c = cond[jnp.minimum(rows, b - 1)]
        z = noise[jnp.minimum(rows, b - 1)]
        img = run_tile(e_k, z, c)
        return carry, (rows, img)

    _, (rows_all, imgs_all) = jax.lax.scan(body, None, jnp.arange(k_chunks))
    # scatter back; dummy row b absorbs unused lanes, duplicates rewrite the
    # same value (replicated pad samples are bit-identical).
    out = jnp.zeros((b + 1, *out_shape), imgs_all.dtype)
    out = out.at[rows_all.reshape(-1)].set(
        imgs_all.reshape(-1, *out_shape), mode="drop"
    )
    return out[:b]


def tiled_switch_apply(
    apply_fns: Sequence[Callable],
    idx: jnp.ndarray,
    inputs,
    tile: int = 64,
    remat: bool = False,
):
    """Differentiable generalization of :func:`tiled_switch_decode` for
    TRAINING-side dispatch: arbitrary per-sample input/output pytrees.

    Args:
        apply_fns: per-expert closures ``(inputs_chunk_pytree) -> out_pytree``
            mapping ``[T, ...]`` leaves to ``[T, ...]`` leaves.
        idx: ``[B]`` expert assignment (not differentiated — indices).
        inputs: pytree of ``[B, ...]`` arrays, gathered per chunk.
        tile: chunk size (must divide B).

    Returns:
        pytree of ``[B, ...]`` routed outputs.

    Divergence from ``tiled_switch_decode``: pad lanes (the alignment
    replicas of each expert's final samples) scatter to the DUMMY row
    instead of rewriting the real row. For inference both are identical
    (replicas are bit-equal); under ``jax.grad`` the duplicate-scatter
    version would double-count boundary-sample cotangents — scatter-set's
    VJP gathers the output cotangent at EVERY contributing index — so here
    each real row is written exactly once and gradients are exact (tested
    against dense in tests/test_train_step.py).
    """
    e_count = len(apply_fns)
    b = idx.shape[0]
    if b % tile != 0:
        raise ValueError(f"batch {b} must be a multiple of tile {tile}")
    k_chunks = b // tile + e_count

    idx = jax.lax.stop_gradient(idx)
    counts = jnp.bincount(idx, length=e_count)
    padded = ((counts + tile - 1) // tile) * tile
    aligned_off = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(padded)])
    seg_start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])
    perm = jnp.argsort(idx, stable=True)
    total_aligned = aligned_off[-1]
    lane = jnp.arange(tile)

    def chunk_rows(k):
        pos = k * tile
        e_k = jnp.clip(
            jnp.searchsorted(aligned_off[1:], pos, side="right"), 0, e_count - 1
        )
        local = pos - aligned_off[e_k] + lane
        real = local < counts[e_k]
        src = seg_start[e_k] + jnp.minimum(local, jnp.maximum(counts[e_k] - 1, 0))
        rows = perm[src]
        used = (pos < total_aligned) & (counts[e_k] > 0)
        # pad lanes -> dummy row b (exactly-once writes; see docstring)
        return jnp.where(used & real, rows, b), jnp.where(used, rows, b), e_k

    def run_chunk(e_k, chunk_in):
        return jax.lax.switch(e_k, list(apply_fns), chunk_in)

    if remat:
        # Under jax.grad, scan saves every chunk's forward intermediates —
        # [K, T, ...] stacked activation buffers that OOM HBM at production
        # sizes (measured: 14.5G of HLO temps at B=512/T=32, perf_train_r3).
        # Checkpointing the chunk body recomputes them in the backward pass
        # instead: memory drops to one chunk's working set per stage at the
        # cost of one extra forward. Values and gradients are unchanged.
        run_chunk = jax.checkpoint(run_chunk)

    def body(carry, k):
        rows_out, rows_in, e_k = chunk_rows(k)
        safe = jnp.minimum(rows_in, b - 1)
        chunk_in = jax.tree_util.tree_map(lambda a: a[safe], inputs)
        out = run_chunk(e_k, chunk_in)
        return carry, (rows_out, out)

    _, (rows_all, outs_all) = jax.lax.scan(body, None, jnp.arange(k_chunks))
    flat_rows = rows_all.reshape(-1)

    def scatter(leaf):
        buf = jnp.zeros((b + 1,) + leaf.shape[2:], leaf.dtype)
        buf = buf.at[flat_rows].set(
            leaf.reshape((-1,) + leaf.shape[2:]), mode="drop"
        )
        return buf[:b]

    return jax.tree_util.tree_map(scatter, outs_all)
