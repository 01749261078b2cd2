"""Serving-optimized forward for the neutron DCGAN generator.

The neutron family (``zdcsim.models.neutron.GeneratorNeutron``; reference
"Generator-neutron-1-original-architecture",
expertsim/models/neutron/generator.py:5-49) interleaves a BatchNorm after
every Dense/Conv. At serving time (eval mode) each BatchNorm is a fixed
per-feature affine of its running statistics — so all five fold EXACTLY
into the preceding layer's kernel/bias (:func:`fold_neutron_params`),
removing every normalization op from the serving program. The fold is the
neutron analog of what ``proton_fast`` buys algebraically: the biggest
single win is the 21632-wide BN affine after Dense_1 (pure HBM bandwidth)
disappearing into the matmul.

Convs follow the round-3 measured TPU lesson from the proton study
(BENCH_LOG: a single plain conv on a materialized nearest-upsample beats
FLOP-reduced phase decompositions — XLA tiles regular convs far better):
the 2x nearest upsamples are materialized (int8 ``repeat`` is cheap) and
the convs run as plain VALID convs, optionally on the int8 MXU with
per-cout weight scales and dynamic per-tensor activation scales
(``int8=True``), exactly the quantization scheme fidelity-gated for the
proton path.

Consumes the standard parameter tree + ``batch_stats`` of
``GeneratorNeutron(norm="batch")``; ``norm="group"`` trees have no
BatchNorm to fold and keep the module forward. Exactness vs the module
eval forward is tested in tests/test_neutron_fast.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zdcsim.models.proton_fast import (
    _conv_i8,
    _leaky,
    _quant_act,
    _quant_per_cout,
)

_BN_EPS = 1e-5  # MaskedBatchNorm.epsilon
_FOLD_PAIRS = (
    ("Dense_0", "MaskedBatchNorm_0"),
    ("Dense_1", "MaskedBatchNorm_1"),
    ("Conv_0", "MaskedBatchNorm_2"),
    ("Conv_1", "MaskedBatchNorm_3"),
    ("Conv_2", "MaskedBatchNorm_4"),
)

# int8 MXU selection for the three inner convs (Conv_0 24x24x256 and
# Conv_1 46x46x128 carry ~85% of the generator FLOPs; Conv_2 is small).
# Toggles mirror proton_fast's measured-default pattern; chip numbers in
# BENCH_LOG decide the production values.
INT8_CONV0 = True
INT8_CONV1 = True
INT8_CONV2 = True


def is_foldable(params) -> bool:
    """True when the tree carries the BatchNorm layers the fold expects
    (``norm="batch"``; ``norm="group"`` trees have GroupNorm/LayerNorm)."""
    return all(bn in params for _, bn in _FOLD_PAIRS)


_FOLDED_KEYS = frozenset(
    [layer for layer, _ in _FOLD_PAIRS] + ["Conv_3"]
)


def is_prefolded(params) -> bool:
    """True when the tree is ALREADY in the folded serving layout — a
    ``GeneratorNeutron(norm="none")`` distilled student's parameter tree
    (Dense_0/Dense_1/Conv_0..3, kernel+bias only). Such trees feed
    :func:`fast_neutron_apply` directly, no fold needed."""
    return set(params) == _FOLDED_KEYS and all(
        set(params[k]) == {"kernel", "bias"} for k in _FOLDED_KEYS
    )


def fold_neutron_params(params, batch_stats):
    """Fold every eval-mode BatchNorm affine into the preceding layer.

    BN_eval(y) = (y - m) * g + beta with g = scale/sqrt(var+eps), applied
    after y = x@W + b (or conv), is exactly y' = x@(W*g) + ((b-m)*g+beta):
    the fold commutes with the conv because g is per-output-channel.
    Returns a reduced tree {Dense_0, Dense_1, Conv_0..2 folded, Conv_3
    verbatim}; computed in float32 (cast afterwards if serving in bf16).
    """
    out = {}
    for layer, bn in _FOLD_PAIRS:
        k = params[layer]["kernel"].astype(jnp.float32)
        b = params[layer]["bias"].astype(jnp.float32)
        s = params[bn]["scale"].astype(jnp.float32)
        beta = params[bn]["bias"].astype(jnp.float32)
        m = batch_stats[bn]["mean"].astype(jnp.float32)
        v = batch_stats[bn]["var"].astype(jnp.float32)
        g = s * jax.lax.rsqrt(v + _BN_EPS)
        out[layer] = {"kernel": k * g, "bias": (b - m) * g + beta}
    out["Conv_3"] = {
        "kernel": params["Conv_3"]["kernel"].astype(jnp.float32),
        "bias": params["Conv_3"]["bias"].astype(jnp.float32),
    }
    return out


def _conv_valid(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(x.dtype)


def _conv_valid_int8(x, k, b, act_scale=None):
    """Plain VALID conv on the int8 MXU: per-tensor dynamic activation
    scale, per-cout weight scales, f32 dequant (the proton-measured
    default — bf16 dequant lost 11% in bulk). ``act_scale`` switches to a
    static calibrated scale (see proton_fast._quant_act)."""
    xq, sx = _quant_act(x, act_scale)
    kq, sk = _quant_per_cout(k)
    y = _conv_i8(xq, kq, ((0, 0), (0, 0)))
    return (
        y.astype(jnp.float32) * (sk * sx).astype(jnp.float32)[None, None, None, :]
        + b.astype(jnp.float32)
    ).astype(x.dtype)


def _up2_conv_valid_int8(x, k, b, act_scale=None):
    """2x nearest upsample + VALID conv, upsample materialized on the
    QUANTIZED activations (int8 repeat; the per-tensor max is unchanged
    by duplication, so the scale is identical to quantizing first)."""
    xq, sx = _quant_act(x, act_scale)
    xu = jnp.repeat(jnp.repeat(xq, 2, axis=1), 2, axis=2)
    kq, sk = _quant_per_cout(k)
    y = _conv_i8(xu, kq, ((0, 0), (0, 0)))
    return (
        y.astype(jnp.float32) * (sk * sx).astype(jnp.float32)[None, None, None, :]
        + b.astype(jnp.float32)
    ).astype(x.dtype)


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def fast_neutron_apply(
    folded, noise: jnp.ndarray, cond: jnp.ndarray, int8: bool = False,
    act_scales=None, amax_out=None,
) -> jnp.ndarray:
    """Eval forward of GeneratorNeutron from a :func:`fold_neutron_params`
    tree. Returns [B, 44, 44, 1] in the input dtype (log-space pixels,
    like the module forward — the engine applies expm1).

    ``act_scales``/``amax_out``: static calibrated activation scales for the
    int8 quant sites / calibration max-abs capture — same contract as
    ``proton_fast.fast_generator_apply``."""
    p = folded
    scales = act_scales or {}

    def _site(t, name):
        if amax_out is not None:
            amax_out[name] = jnp.max(jnp.abs(t.astype(jnp.float32)))
        return t
    x = jnp.concatenate([noise, cond], axis=1)
    x = _leaky(x @ p["Dense_0"]["kernel"].astype(x.dtype)
               + p["Dense_0"]["bias"].astype(x.dtype))
    x = _leaky(x @ p["Dense_1"]["kernel"].astype(x.dtype)
               + p["Dense_1"]["bias"].astype(x.dtype))
    # Channel count from the tree, not hardcoded: width-scaled distilled
    # students (GeneratorNeutron(width<1)) shrink every channel dim.
    x = x.reshape(-1, 13, 13, p["Dense_1"]["kernel"].shape[-1] // (13 * 13))

    c0 = p["Conv_0"]
    x = _site(x, "conv0")
    if int8 and INT8_CONV0:
        x = _up2_conv_valid_int8(
            x, c0["kernel"], c0["bias"], act_scale=scales.get("conv0")
        )  # 24x24x256
    else:
        x = _conv_valid(_up2(x), c0["kernel"], c0["bias"])
    x = _leaky(x)

    c1 = p["Conv_1"]
    x = _site(x, "conv1")
    if int8 and INT8_CONV1:
        x = _up2_conv_valid_int8(
            x, c1["kernel"], c1["bias"], act_scale=scales.get("conv1")
        )  # 46x46x128
    else:
        x = _conv_valid(_up2(x), c1["kernel"], c1["bias"])
    x = _leaky(x)

    c2 = p["Conv_2"]
    x = _site(x, "conv2")
    if int8 and INT8_CONV2:
        x = _conv_valid_int8(
            x, c2["kernel"], c2["bias"], act_scale=scales.get("conv2")
        )  # 45x45x64
    else:
        x = _conv_valid(x, c2["kernel"], c2["bias"])
    x = _leaky(x)

    x = _conv_valid(x, p["Conv_3"]["kernel"], p["Conv_3"]["bias"])  # 44x44x1
    return jax.nn.relu(x)
