"""Pallas TPU kernels for the fast-sim hot paths.

Two fused epilogues for the serving/eval pipeline (reference equivalents:
``np.expm1`` + ``sum_channels_parallel`` on the CPU, train/utils.py:63,
201, moe.py:646-648):

- :func:`routed_expm1_channel_sums`: all-expert generator output
  ``[E, B, H, W]`` + routing ids ``[B]`` -> per-shower 5-channel sums
  ``[B, 5]`` in ONE pass over HBM. The routed gather is done with
  scalar-prefetch block indexing (the expert id picks the DMA'd block), so
  the ``[E, B, H, W]`` tensor is read only at the routed rows — 1/E of the
  naive traffic — and the expm1 + mask-basis contraction happen in VMEM
  without materializing the linear-space image.
- :func:`expm1_channel_sums`: same epilogue for already-routed images
  ``[B, H, W]`` (the evaluator's real-image path).

Both kernels run in interpreter mode on CPU (tests) and compiled on TPU.
``sum_channels`` in :mod:`zdcsim.ops.channels` remains the reference
implementation; these are drop-in accelerations validated against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zdcsim.ops.channels import channel_basis

_N_CHANNELS = 5


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except (RuntimeError, IndexError):
        return False


def _epilogue_kernel(idx_ref, img_ref, basis_ref, out_ref):
    """One batch-row: expm1 then contract pixels against the channel basis."""
    img = img_ref[0, 0].astype(jnp.float32)  # [H, W]
    lin = jnp.expm1(img)
    h, w = lin.shape
    out_ref[0, :] = jnp.dot(
        lin.reshape(1, h * w), basis_ref[:, :], preferred_element_type=jnp.float32
    )[0]


def routed_expm1_channel_sums(
    imgs: jnp.ndarray, idx: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """``[E, B, H, W]`` log-space images + ``[B]`` expert ids -> ``[B, 5]``.

    Grid is one program per shower; the scalar-prefetched ``idx`` drives the
    input block index map, so only the routed expert's row is DMA'd.
    """
    if interpret is None:
        interpret = not _is_tpu()
    e, b, h, w = imgs.shape
    basis = jnp.asarray(channel_basis((h, w)), jnp.float32)  # [H*W, 5]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, w),
                index_map=lambda i, idx_ref: (idx_ref[i], i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((h * w, _N_CHANNELS), lambda i, idx_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _N_CHANNELS), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _epilogue_kernel,
        out_shape=jax.ShapeDtypeStruct((b, _N_CHANNELS), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), imgs, basis)


def _plain_epilogue_kernel(img_ref, basis_ref, out_ref):
    img = img_ref[0].astype(jnp.float32)
    lin = jnp.expm1(img)
    h, w = lin.shape
    out_ref[0, :] = jnp.dot(
        lin.reshape(1, h * w), basis_ref[:, :], preferred_element_type=jnp.float32
    )[0]


def expm1_channel_sums(images: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """``[B, H, W]`` log-space showers -> ``[B, 5]`` channel sums."""
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w = images.shape
    basis = jnp.asarray(channel_basis((h, w)), jnp.float32)
    return pl.pallas_call(
        _plain_epilogue_kernel,
        out_shape=jax.ShapeDtypeStruct((b, _N_CHANNELS), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * w, _N_CHANNELS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _N_CHANNELS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(images, basis)
