"""5-channel ZDC photomultiplier decomposition.

The ZDC readout has 5 towers: the reference models them as 4 spatial-quadrant
checkerboard masks plus the complementary-checkerboard 5th channel
(reference: expertsim/train/utils.py:18-78). This module reproduces those
masks bit-for-bit and computes the per-image channel sums.

TPU-native twist: instead of five masked elementwise reductions, the channel
sums are a single ``[N, H*W] @ [H*W, 5]`` matmul against a constant basis —
one MXU op, fusable with the upstream ``expm1``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def get_channel_masks(shape: Tuple[int, int]) -> Tuple[np.ndarray, ...]:
    """Return the 5 channel masks for an ``(H, W)`` image geometry.

    mask1..mask4: checkerboard (pattern [[0,1],[1,0]]) limited to the
    lower-left / lower-right / upper-left / upper-right quadrant respectively;
    mask5: the complementary checkerboard over the full image.
    Matches reference ``get_channel_masks`` (train/utils.py:18-60) exactly.
    """
    h, w = shape
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    checker = ((rows + cols) % 2 == 1).astype(np.float32)  # pattern[[0,1],[1,0]]
    mask5 = 1.0 - checker

    mid_row, mid_col = h // 2, w // 2
    lower = rows >= mid_row  # "lower" = larger row index
    left = cols < mid_col

    mask1 = checker * (lower & left)
    mask2 = checker * (lower & ~left)
    mask3 = checker * (~lower & left)
    mask4 = checker * (~lower & ~left)
    return (
        mask1.astype(np.float32),
        mask2.astype(np.float32),
        mask3.astype(np.float32),
        mask4.astype(np.float32),
        mask5.astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def channel_basis(shape: Tuple[int, int]) -> np.ndarray:
    """Constant ``[H*W, 5]`` matrix whose columns are the flattened masks."""
    masks = get_channel_masks(shape)
    return np.stack([m.reshape(-1) for m in masks], axis=1)


def sum_channels(images: jnp.ndarray, already_expm1: bool = True) -> jnp.ndarray:
    """Per-image 5-channel sums.

    Args:
        images: ``[N, H, W]`` (or ``[N, 1, H, W]``) shower images in linear
            (photon-count) space unless ``already_expm1=False``, in which case
            they are log-space and ``expm1`` is applied first (the reference
            always stores log-space images and inverts at eval,
            models/moe.py:646).
    Returns:
        ``[N, 5]`` channel sums.
    """
    if images.ndim == 4:
        images = images.reshape(images.shape[0], *images.shape[-2:])
    n, h, w = images.shape
    basis = jnp.asarray(channel_basis((h, w)), images.dtype)
    flat = images.reshape(n, h * w)
    if not already_expm1:
        flat = jnp.expm1(flat)
    return flat @ basis


def sum_channels_np(images: np.ndarray) -> np.ndarray:
    """Host-side numpy version (linear-space input), for eval/plot code."""
    images = np.asarray(images)
    if images.ndim == 4:
        images = images.reshape(images.shape[0], *images.shape[-2:])
    n, h, w = images.shape
    return images.reshape(n, h * w) @ channel_basis((h, w))
