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
) -> jnp.ndarray:
    """Decode each sample with its routed expert, one XLA program.

    Args:
        decode_fns: per-expert closures ``(noise[T,Z], cond[T,C]) -> [T,*out]``.
        idx: ``[B]`` int expert assignment.
        cond: ``[B, C]`` conditioning; noise: ``[B, Z]``.
        out_shape: per-sample output shape (e.g. ``(H, W)``).
        tile: chunk size ``T`` (must divide B).
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

    def body(carry, k):
        rows, e_k = chunk_rows(k)
        c = cond[jnp.minimum(rows, b - 1)]
        z = noise[jnp.minimum(rows, b - 1)]
        img = jax.lax.switch(e_k, list(decode_fns), z, c)
        return carry, (rows, img)

    _, (rows_all, imgs_all) = jax.lax.scan(body, None, jnp.arange(k_chunks))
    # scatter back; dummy row b absorbs unused lanes, duplicates rewrite the
    # same value (replicated pad samples are bit-identical).
    out = jnp.zeros((b + 1, *out_shape), imgs_all.dtype)
    out = out.at[rows_all.reshape(-1)].set(
        imgs_all.reshape(-1, *out_shape), mode="drop"
    )
    return out[:b]
