"""The fast-sim serving path.

Reference: ``get_predictions_from_experts_results``
(expertsim/train/utils.py:208-266) — route each conditioning vector with the
router, draw noise, decode with the routed expert's generator, invert the log
transform. The reference does this with host-side partitioning, one generator
call per expert, and a scatter back (and a hardcoded 5-expert variant whose
``indx_4`` duplicates expert 2 — a known defect not replicated here).

TPU-native engine: ONE compiled XLA program per fixed batch shape does
router → noise → all-expert decode → routed gather → ``expm1``. At the
reference's expert counts (3-5) the dense all-expert decode wastes <E× FLOPs
on tiny CNNs but eliminates host round-trips, dynamic shapes, and per-expert
kernel launches; the MXU is saturated by the batched matmuls/convs. Optional
bfloat16 decode roughly doubles MXU throughput; channel-count outputs stay in
float32.

Throughput target (BASELINE.json north star): >= 50k showers/sec/chip.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models import MoEModules, build_moe


def _cast_tree(tree, dtype):
    """Cast float leaves to ``dtype`` AND force device residency: committed
    serving artifacts arrive as host numpy, and host-resident weights re-ship
    over the link on every dispatch (measured 2x bulk slowdown through the
    axon tunnel — probe2, round 4). ``jnp.asarray`` is a no-op for arrays
    already on device."""
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else jnp.asarray(x),
        tree,
    )


class FastSim:
    """Compiled ZDC fast-simulation engine.

    Args:
        modules: the MoE module bundle (zdcsim.models.build_moe).
        gen_params / gen_stats: generator weights (pass the EMA shadow from
            a train state for smoothed serving).
        router_params: router weights.
        batch_size: the compiled batch shape; inputs are chunked/padded to it.
            Default (None) picks per path: 8192 for the single-expert-FLOPs
            switch/grouped/stream paths, 2048 for the dense all-expert path
            (dense 8192 at E=3 f32 OOMs a 16 GB chip — measured; an explicit
            batch_size applies to every path unchecked).
        precision: "f32", "bf16" (decode in bfloat16, outputs float32), or
            "int8" (bf16 base + the dominant convs on the int8 MXU —
            measured 1.8x conv throughput on v5e for the proton path;
            the neutron path folds BatchNorm and int8s its three inner
            convs). Requires a fast path (proton Generator, or neutron
            GeneratorNeutron with norm="batch"); falls back to bf16
            otherwise. "int8_pallas"/"int8_pallas_ab"/"int8_fused"/
            "int8_fused_front" select Pallas decode kernels (proton only).
        scaler_cond: optional StandardScaler to standardize raw kinematics.
        mesh: optional jax Mesh — batch shards over its 'data' axis.
        static_act_quant: int8 paths use STATIC calibrated per-tensor
            activation scales instead of per-call dynamic max-reduces — the
            quantize becomes pure elementwise and fuses into the preceding
            norm epilogue. Calibrated once at build time per expert on a
            standard-normal batch (conds are scaler-standardized, so N(0,1)
            is representative) with a safety margin
            (``ACT_SCALE_MARGIN``); out-of-range activations clip at +-127.
            Fidelity-gate any static configuration before serving claims.
    """

    DENSE_SAFE_BATCH = 2048
    # Static-quant calibration: max-abs over CAL_BATCH standard-normal
    # samples, inflated by ACT_SCALE_MARGIN to cover serving-batch tails
    # (serving batches are ~30x larger than the calibration batch; the
    # following GroupNorm renormalizes what clipping distorts).
    CAL_BATCH = 1024
    ACT_SCALE_MARGIN = 1.25

    def __init__(
        self,
        modules: MoEModules,
        gen_params,
        gen_stats,
        router_params,
        batch_size: Optional[int] = None,
        precision: str = "f32",
        scaler_cond=None,
        mesh=None,
        fast: bool = True,
        static_act_quant: bool = False,
    ):
        self.modules = modules
        self.batch_size = int(batch_size) if batch_size is not None else 8192
        self.dense_batch_size = (
            int(batch_size) if batch_size is not None
            else min(self.DENSE_SAFE_BATCH, self.batch_size)
        )
        self.scaler_cond = scaler_cond
        self.noise_dim = modules.noise_dim
        self._mesh = mesh
        h, w = modules.image_shape
        self.image_shape = (h, w)
        _int8_precisions = (
            "int8", "int8_pallas", "int8_pallas_ab", "int8_fused",
            "int8_fused_front",
        )
        dtype = (
            jnp.bfloat16 if precision in ("bf16",) + _int8_precisions
            else jnp.float32
        )
        self._dtype = dtype
        self._int8 = (
            precision in _int8_precisions
            and fast and modules.names.get("generator") == "Generator"
        )
        # "int8_pallas": all four fused Pallas decode kernels
        # (zdcsim/ops/pallas_decode.py); "int8_pallas_ab": Pallas only for
        # the measured winners (fused LN-quant + all-phase Conv_0), XLA int8
        # for the rest; "int8_fused": the ENTIRE post-MLP decode as ONE
        # Pallas kernel (zdcsim/ops/pallas_decode_fused.py);
        # "int8_fused_front": the LN->Conv_0->GN0->resize front half as one
        # Pallas kernel, XLA int8 for the conv1..3 tail (the full fused
        # kernel's tail SIGKILLs the Mosaic compile — see
        # fused_decode_front docstring) — see fast_generator_apply.
        self._int8_backend = {
            "int8_pallas": "pallas", "int8_pallas_ab": "pallas_ab",
            "int8_fused": "fused", "int8_fused_front": "fused_front",
        }.get(precision, "xla")

        # Neutron fast path: fold the eval-mode BatchNorm affines into the
        # Dense/Conv weights ONCE (exact — zdcsim/models/neutron_fast.py),
        # serve the folded tree; int8 additionally puts the three inner
        # convs on the int8 MXU. norm="group" trees (no batch_stats) keep
        # the module forward.
        self._fast_neutron = False
        if fast and modules.names.get("generator") == "GeneratorNeutron":
            from zdcsim.models.neutron_fast import (
                fold_neutron_params, is_foldable, is_prefolded,
            )

            if "batch_stats" in gen_stats and is_foldable(gen_params):
                gen_params = jax.vmap(fold_neutron_params)(
                    gen_params, gen_stats["batch_stats"]
                )
                gen_stats = {}
                self._fast_neutron = True
            elif is_prefolded(gen_params):
                # norm="none" distilled students: the parameter tree is
                # already the folded serving layout.
                self._fast_neutron = True
            if self._fast_neutron and precision in _int8_precisions:
                self._int8 = True

        gen_params = _cast_tree(gen_params, dtype)
        gen_stats = _cast_tree(gen_stats, dtype)
        # Router stays f32 (routing logits are cheap and precision-sensitive)
        # but must be device-resident like everything else.
        router_params = jax.tree_util.tree_map(jnp.asarray, router_params)
        if mesh is not None:
            # Serving replicates weights (these generators are KBs-MBs; the
            # batch is what shards). A state fresh from the expert-sharded
            # train step gets gathered once here.
            from zdcsim.parallel.mesh import replicated

            rep = replicated(mesh)
            place = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), t
            )
            gen_params, gen_stats, router_params = (
                place(gen_params), place(gen_stats), place(router_params)
            )
        self._weights = (gen_params, gen_stats, router_params)

        gen_mod, router_mod = modules.generator, modules.router
        # The proton family gets the FLOP-reduced fused forward
        # (zdcsim/models/proton_fast.py) — exact same outputs from the same
        # parameter tree, ~1.6x fewer generator FLOPs.
        use_fast = fast and modules.names.get("generator") == "Generator"
        self.uses_fast_path = use_fast

        # Static int8 activation scales (see the class docstring): calibrate
        # once per expert at build time; the switch/bulk decoders then run
        # reduce-free elementwise quantizes.
        self._act_scales = None
        if static_act_quant and self._int8 and (use_fast or self._fast_neutron):
            if self._int8_backend != "xla":
                # The Pallas backends quantize inside their kernels and
                # ignore act_scales at the covered sites — a static
                # calibration would silently apply to only part of the
                # program. Static quant is an XLA-backend lever.
                raise ValueError(
                    "static_act_quant requires the XLA int8 backend "
                    f"(precision='int8'), got backend {self._int8_backend!r}"
                )
            self._act_scales = self._calibrate_act_scales(gen_params)

        def sim(weights, cond, key):
            gp, gs, rp = weights
            _, logits = router_mod.apply({"params": rp}, cond)
            idx = jnp.argmax(logits, axis=-1)  # [B]
            noise = jax.random.normal(key, (cond.shape[0], self.noise_dim), dtype)
            if use_fast:
                from zdcsim.models.proton_fast import fast_generator_apply

                imgs = jax.vmap(
                    lambda p, z, c: fast_generator_apply(
                        p, z, c, int8=self._int8, int8_backend=self._int8_backend
                    ),
                    in_axes=(0, None, None),
                )(gp, noise, cond.astype(dtype))
            elif self._fast_neutron:
                from zdcsim.models.neutron_fast import fast_neutron_apply

                imgs = jax.vmap(
                    lambda p, z, c: fast_neutron_apply(p, z, c, int8=self._int8),
                    in_axes=(0, None, None),
                )(gp, noise, cond.astype(dtype))
            else:
                variables = {"params": gp, **gs}
                mutable = list(gs.keys())
                if mutable:
                    imgs, _ = gen_mod.apply(
                        variables, noise, cond.astype(dtype), False, mutable=mutable
                    )
                else:
                    imgs = gen_mod.apply(variables, noise, cond.astype(dtype), False)
            sel = jnp.take_along_axis(imgs, idx[None, :, None, None, None], axis=0)[0, ..., 0]
            return jnp.expm1(sel.astype(jnp.float32)), idx

        if mesh is not None:
            from zdcsim.parallel.mesh import batch_sharding, replicated

            self._sim = jax.jit(
                sim,
                in_shardings=(replicated(mesh), batch_sharding(mesh), replicated(mesh)),
            )
        else:
            self._sim = jax.jit(sim)

    def _calibrate_act_scales(self, gen_params):
        """Per-expert static int8 activation scales.

        Runs the production serving forward once per expert (vmapped) on a
        standard-normal calibration batch and captures each quant site's
        input max-abs via ``amax_out``; returns a dict of ``[E]`` f32 scale
        arrays (``amax * ACT_SCALE_MARGIN / 127``). Conds enter the engine
        scaler-standardized, so N(0,1) is the representative calibration
        distribution."""
        dtype = self._dtype
        if self._fast_neutron:
            from zdcsim.models.neutron_fast import fast_neutron_apply as apply_fn

            in_dim = gen_params["Dense_0"]["kernel"].shape[-2]
        else:
            from zdcsim.models.proton_fast import fast_generator_apply as apply_fn

            in_dim = gen_params["MLPBlock_0"]["Dense_0"]["kernel"].shape[-2]
        cond_dim = in_dim - self.noise_dim
        kz, kc = jax.random.split(jax.random.PRNGKey(0))
        z = jax.random.normal(kz, (self.CAL_BATCH, self.noise_dim), dtype)
        c = jax.random.normal(kc, (self.CAL_BATCH, cond_dim), dtype)

        def amax_one(gp_e):
            d = {}
            apply_fn(gp_e, z, c, int8=True, amax_out=d)
            return d

        amax = jax.jit(jax.vmap(amax_one))(gen_params)  # dict of [E] f32
        # Clip-rate diagnostic (ADVICE r4): re-measure amax on a 4x larger
        # independent batch; site/expert maxima exceeding the margined
        # calibration amax would clip at serve time. Exposed as
        # ``self.act_scale_headroom`` = min over sites/experts of
        # (margined cal amax) / (validation amax) — >1.0 means no observed
        # clipping at 4x the calibration sample size.
        kz2, kc2 = jax.random.split(jax.random.PRNGKey(1))
        z2 = jax.random.normal(kz2, (4 * self.CAL_BATCH, self.noise_dim), dtype)
        c2 = jax.random.normal(kc2, (4 * self.CAL_BATCH, cond_dim), dtype)

        def amax_val(gp_e):
            d = {}
            apply_fn(gp_e, z2, c2, int8=True, amax_out=d)
            return d

        amax_v = jax.jit(jax.vmap(amax_val))(gen_params)
        m = float(self.ACT_SCALE_MARGIN)
        ratios = jax.tree_util.tree_map(
            lambda a, v: (a * m) / jnp.maximum(v, 1e-12), amax, amax_v
        )
        self.act_scale_headroom = float(
            jnp.min(jnp.stack([jnp.min(r) for r in
                               jax.tree_util.tree_leaves(ratios)]))
        )
        return jax.tree_util.tree_map(
            lambda a: jnp.maximum(a * m, 1e-12) / 127.0, amax
        )

    def _build_switch(
        self,
        tile: int = 128,
        in_scan_scatter: bool = True,
        dyn_dispatch: bool = False,
    ):
        """One-program grouped dispatch (zdcsim.inference.switch_dispatch):
        routed decoding at single-expert FLOPs with zero host round trips.

        With a mesh, the batch shards over the 'data' axis and each device
        runs the tiled-switch dispatch LOCALLY on its shard via ``shard_map``
        (weights replicated) — the sort/scan/scatter never crosses devices,
        so scaling is embarrassingly parallel over ICI with zero collectives
        in the hot loop. Per-sample outputs are identical to the single-device
        path (same key -> same global noise; dispatch grouping is
        sample-independent).

        ``dyn_dispatch=True`` decodes each tile BRANCHLESSLY: the tile's
        expert weights are gathered from the stacked tree by the traced
        expert index (``lax.dynamic_index_in_dim``) and fed through ONE
        uniform decode body, instead of ``lax.switch`` over per-expert
        closures — trades the conditional wrapper (~23% of a w=0.125 tile
        branch, round-4 student budget) for one weight-tree gather per tile.
        Value-identical to the switch path (tests/test_switch_dispatch.py).
        """
        from zdcsim.inference.switch_dispatch import tiled_switch_decode
        from zdcsim.models.proton_fast import fast_generator_apply

        dtype = self._dtype
        h, w = self.image_shape
        router_mod = self.modules.router
        gen_single = self.modules.generator_single
        use_fast = self.uses_fast_path
        fast_neutron = self._fast_neutron
        e_count = self.modules.n_experts
        noise_dim = self.noise_dim
        mesh = self._mesh

        int8 = self._int8
        int8_backend = self._int8_backend

        act_scales = self._act_scales

        def make_decoder(gp, gs, e):
            def decode(z, c):
                gp_e = jax.tree_util.tree_map(lambda p: p[e], gp)
                # static per-expert quant scales close over as constants
                sc_e = (
                    jax.tree_util.tree_map(lambda s: s[e], act_scales)
                    if act_scales is not None else None
                )
                if use_fast:
                    img = fast_generator_apply(
                        gp_e, z, c.astype(dtype), int8=int8,
                        int8_backend=int8_backend, act_scales=sc_e,
                    )
                elif fast_neutron:
                    from zdcsim.models.neutron_fast import fast_neutron_apply

                    img = fast_neutron_apply(
                        gp_e, z, c.astype(dtype), int8=int8, act_scales=sc_e
                    )
                else:
                    gs_e = jax.tree_util.tree_map(lambda p: p[e], gs)
                    img = gen_single.apply({"params": gp_e, **gs_e}, z, c.astype(dtype), False)
                return jnp.expm1(img[..., 0].astype(jnp.float32))

            return decode

        def make_dyn_decoder(gp, gs):
            """Branchless tile decoder: gather the expert's weight slice by
            the TRACED tile index, one uniform decode body (no lax.switch)."""
            def decode_dyn(e_k, z, c):
                take = lambda t: jax.tree_util.tree_map(
                    lambda p: jax.lax.dynamic_index_in_dim(
                        p, e_k, axis=0, keepdims=False
                    ),
                    t,
                )
                gp_e = take(gp)
                sc_e = take(act_scales) if act_scales is not None else None
                if use_fast:
                    img = fast_generator_apply(
                        gp_e, z, c.astype(dtype), int8=int8,
                        int8_backend=int8_backend, act_scales=sc_e,
                    )
                elif fast_neutron:
                    from zdcsim.models.neutron_fast import fast_neutron_apply

                    img = fast_neutron_apply(
                        gp_e, z, c.astype(dtype), int8=int8, act_scales=sc_e
                    )
                else:
                    gs_e = take(gs)
                    img = gen_single.apply(
                        {"params": gp_e, **gs_e}, z, c.astype(dtype), False
                    )
                return jnp.expm1(img[..., 0].astype(jnp.float32))

            return decode_dyn

        def sim_switch(weights, cond, key):
            import math

            gp, gs, rp = weights
            _, logits = router_mod.apply({"params": rp}, cond)
            idx = jnp.argmax(logits, axis=-1)
            noise = jax.random.normal(key, (cond.shape[0], noise_dim), dtype)
            if mesh is None:
                fns = [make_decoder(gp, gs, e) for e in range(e_count)]
                # the tile must divide the (static) batch; fall back to the
                # largest common divisor for odd batch sizes
                eff_tile = math.gcd(cond.shape[0], tile)
                imgs = tiled_switch_decode(
                    fns, idx, cond, noise, (h, w), tile=eff_tile,
                    in_scan_scatter=in_scan_scatter,
                    decode_dyn=make_dyn_decoder(gp, gs) if dyn_dispatch else None,
                )
                return imgs, idx

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from zdcsim.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            if cond.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch_size {cond.shape[0]} must be divisible by the "
                    f"'{DATA_AXIS}' mesh axis size {n_data} for sharded-switch "
                    "serving; pick batch_size = k * mesh.shape['data']"
                )
            local_b = cond.shape[0] // n_data
            eff_tile = math.gcd(local_b, tile)

            def local_decode(gp_l, gs_l, idx_l, cond_l, noise_l):
                fns = [make_decoder(gp_l, gs_l, e) for e in range(e_count)]
                return tiled_switch_decode(
                    fns, idx_l, cond_l, noise_l, (h, w), tile=eff_tile,
                    in_scan_scatter=in_scan_scatter,
                    decode_dyn=(
                        make_dyn_decoder(gp_l, gs_l) if dyn_dispatch else None
                    ),
                )

            decode = shard_map(
                local_decode,
                mesh=mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
            )
            return decode(gp, gs, idx, cond, noise), idx

        self._sim_switch_fn = sim_switch
        # Bulk programs close over the previous _sim_switch_fn — a rebuild
        # (e.g. a different tile) must invalidate them or they silently keep
        # serving the old configuration.
        self._sim_bulk_cache = {}
        if mesh is None:
            self._sim_switch = jax.jit(sim_switch)
        else:
            from zdcsim.parallel.mesh import batch_sharding, replicated

            self._sim_switch = jax.jit(
                sim_switch,
                in_shardings=(replicated(mesh), batch_sharding(mesh), replicated(mesh)),
            )

    def simulate_switch(self, cond, key: jax.Array, return_experts: bool = False):
        """Routed generation via on-device tiled-switch dispatch
        (single-expert FLOPs, one XLA program per chunk). For bulk workloads
        prefer :meth:`simulate_bulk`, which wraps this dispatch in one
        ``lax.scan`` program and never pays per-chunk RTT — that is the
        production serving path (bench.py)."""
        if not hasattr(self, "_sim_switch"):
            self._build_switch()
        cond = jnp.asarray(cond, jnp.float32)
        n = cond.shape[0]
        bs = self.batch_size
        outs, idxs = [], []
        for start in range(0, n, bs):
            chunk = cond[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            imgs, idx = self._sim_switch(self._weights, chunk, jax.random.fold_in(key, start))
            outs.append(imgs[: bs - pad])
            idxs.append(idx[: bs - pad])
        images = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        if return_experts:
            return images, (jnp.concatenate(idxs) if len(idxs) > 1 else idxs[0])
        return images

    def simulate_bulk(self, cond, key: jax.Array, return_experts: bool = False):
        """Bulk workload serving: ALL chunks in ONE XLA program.

        ``lax.scan`` over ``batch_size`` chunks of the tiled-switch decode —
        one dispatch + one readback for the whole workload, vs one per chunk
        in :meth:`simulate_switch`. On a remote-relay link each dispatch
        costs ~26 ms (measured, experiments/perf_study2_r2.py), which at
        B=4096 is ~20% of the decode itself; production bulk generation
        (the reference's actual use case: simulate millions of showers for
        analysis) should never pay it per chunk.
        """
        if not hasattr(self, "_sim_switch"):
            self._build_switch()
        cond = jnp.asarray(cond, jnp.float32)
        n = cond.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            cond = jnp.concatenate([cond, jnp.zeros((pad, cond.shape[1]), cond.dtype)])
        chunks = cond.shape[0] // bs
        cache = getattr(self, "_sim_bulk_cache", {})
        if chunks not in cache:
            inner = self._sim_switch_fn

            def bulk(weights, cond_c, k0):
                bs_ = cond_c.shape[1]

                def body(_, inp):
                    c, i = inp
                    # same per-chunk key derivation as simulate_switch
                    # (fold by start offset) -> bit-identical outputs
                    img, idx = inner(weights, c, jax.random.fold_in(k0, i * bs_))
                    return None, (img, idx)

                _, (imgs, idxs) = jax.lax.scan(
                    body, None, (cond_c, jnp.arange(cond_c.shape[0]))
                )
                return imgs, idxs

            cache[chunks] = jax.jit(bulk)
            self._sim_bulk_cache = cache
        imgs, idxs = cache[chunks](
            self._weights, cond.reshape(chunks, bs, -1), key
        )
        h, w = self.image_shape
        imgs = imgs.reshape(chunks * bs, h, w)[:n]
        if return_experts:
            return imgs, idxs.reshape(chunks * bs)[:n]
        return imgs

    def throughput_bulk(self, n_showers: int = 65536, warmup: bool = True, key=None):
        """Steady-state bulk-serving throughput (one program per workload)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = jax.random.normal(
            jax.random.fold_in(key, 1), (n_showers, self.modules.cond_dim)
        )
        if warmup:
            out = self.simulate_bulk(cond, jax.random.fold_in(key, 2))
            float(out.sum())  # force compile+execute
        t0 = time.perf_counter()
        out = self.simulate_bulk(cond, jax.random.fold_in(key, 3))
        # scalar readback forces execution (block_until_ready lies over the
        # tunnel); one extra dispatch amortized over the whole workload
        float(out.sum())
        dt = time.perf_counter() - t0
        return {
            "showers_per_sec": n_showers / dt,
            "batch_size": float(self.batch_size),
            "seconds": dt,
            "n_showers": float(n_showers),
        }

    def throughput_switch(self, n_batches: int = 20, warmup: int = 3, key=None):
        """Steady-state tiled-switch throughput (scalar readback per batch)."""
        if not hasattr(self, "_sim_switch"):
            self._build_switch()
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = jax.random.normal(
            jax.random.fold_in(key, 1), (self.batch_size, self.modules.cond_dim)
        )
        for i in range(max(warmup, 1)):
            out, _ = self._sim_switch(self._weights, cond, jax.random.fold_in(key, i))
        float(out.sum())
        # Depth-2 pipeline: dispatch batch i+1 before reading back batch i's
        # scalar, hiding the host round trip behind device compute (the
        # production consumer overlaps readback the same way).
        t0 = time.perf_counter()
        prev = None
        for i in range(n_batches):
            out, _ = self._sim_switch(self._weights, cond, jax.random.fold_in(key, 100 + i))
            if prev is not None:
                float(prev.sum())
            prev = out
        float(prev.sum())
        dt = time.perf_counter() - t0
        total = n_batches * self.batch_size
        return {
            "showers_per_sec": total / dt,
            "batch_size": float(self.batch_size),
            "seconds": dt,
            "n_showers": float(total),
        }

    def _build_grouped(self):
        """Per-expert decode programs for grouped dispatch.

        Grouped mode routes on device, buckets the batch by expert on the
        host, pads each bucket to a power-of-two size, and decodes each
        bucket with ONLY its expert's generator (params sliced from the
        stacked tree inside jit) — ~E× fewer FLOPs than dense all-expert
        decode at the price of one device->host sync for the routing ids.
        The compiled-program set is E x log2(sizes), cached by XLA.
        """
        import functools

        gen_single = self.modules.generator_single
        if gen_single is None:
            raise ValueError("grouped dispatch needs modules.generator_single")
        dtype = self._dtype

        @functools.partial(jax.jit, static_argnames=("expert",))
        def decode_one(weights, cond, key, expert: int):
            gp, gs, _ = weights
            # One expert's slice of the stacked trees == the unstacked
            # module's parameter structure (nn.vmap variable_axes={'params':0}).
            gp_e = jax.tree_util.tree_map(lambda p: p[expert], gp)
            gs_e = jax.tree_util.tree_map(lambda p: p[expert], gs)
            noise = jax.random.normal(key, (cond.shape[0], self.noise_dim), dtype)
            if self._fast_neutron:
                from zdcsim.models.neutron_fast import fast_neutron_apply

                imgs = fast_neutron_apply(
                    gp_e, noise, cond.astype(dtype), int8=self._int8
                )
                return jnp.expm1(imgs[..., 0].astype(jnp.float32))
            variables = {"params": gp_e, **gs_e}
            mutable = list(gs_e.keys())
            if mutable:
                imgs, _ = gen_single.apply(
                    variables, noise, cond.astype(dtype), False, mutable=mutable
                )
            else:
                imgs = gen_single.apply(variables, noise, cond.astype(dtype), False)
            return jnp.expm1(imgs[..., 0].astype(jnp.float32))

        @jax.jit
        def route(weights, cond):
            _, _, rp = weights
            _, logits = self.modules.router.apply({"params": rp}, cond)
            return jnp.argmax(logits, axis=-1)

        self._decode_one = decode_one
        self._route = route

    @staticmethod
    def _bucket_size(n: int, minimum: int = 256) -> int:
        size = minimum
        while size < n:
            size *= 2
        return size

    def simulate_grouped(self, cond, key: jax.Array):
        """Grouped-dispatch generation (see _build_grouped): [N, 9] -> [N, H, W]."""
        if not hasattr(self, "_decode_one"):
            self._build_grouped()
        cond = jnp.asarray(cond, jnp.float32)
        n = cond.shape[0]
        idx = np.asarray(self._route(self._weights, cond))  # host sync
        h, w = self.image_shape
        out = np.empty((n, h, w), np.float32)
        e_count = self.modules.n_experts
        for e in range(e_count):
            sel = np.flatnonzero(idx == e)
            if sel.size == 0:
                continue
            size = self._bucket_size(sel.size)
            bucket = jnp.zeros((size, cond.shape[1]), jnp.float32)
            bucket = bucket.at[: sel.size].set(cond[sel])
            imgs = self._decode_one(self._weights, bucket, jax.random.fold_in(key, e), e)
            out[sel] = np.asarray(imgs[: sel.size])
        return out

    def simulate_stream(self, cond, key: jax.Array, readback: bool = True):
        """High-throughput grouped generation for large workloads.

        Three phases: (1) route the whole workload (async, one host sync for
        the ids); (2) bucket samples per expert across ALL batches — each
        expert's work becomes mostly-full fixed-size chunks, so the decode
        runs single-expert FLOPs (~E x fewer than dense) with padding waste
        only on each expert's final chunk; (3) enqueue every chunk decode
        back-to-back (device queue stays full; per-call latency amortizes)
        and scatter outputs on the host.

        NOTE: on this image's remote-relay link the per-chunk dispatch RTT
        dominates (measured 1.4k showers/s, BENCH_LOG.md) — the production
        serving path is :meth:`simulate_bulk` with ``precision="int8"`` (what
        bench.py runs); this host-side grouped path exists for API parity
        with the reference's partition+scatter scheme.
        """
        if not hasattr(self, "_decode_one"):
            self._build_grouped()
        cond = jnp.asarray(cond, jnp.float32)
        n = cond.shape[0]
        bs = self.batch_size
        # Phase 1: route (chunked to the compiled shape), single host sync.
        idx_parts = []
        for start in range(0, n, bs):
            chunk = cond[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            idx_parts.append(self._route(self._weights, chunk)[: bs - pad])
        idx = np.concatenate([np.asarray(p) for p in idx_parts])

        # Phase 2+3: per-expert contiguous chunks, all enqueued async.
        h, w = self.image_shape
        pending = []  # (sel, device_array)
        for e in range(self.modules.n_experts):
            sel = np.flatnonzero(idx == e)
            for start in range(0, sel.size, bs):
                part = sel[start : start + bs]
                size = part.size if part.size == bs else self._bucket_size(part.size)
                bucket = jnp.zeros((size, cond.shape[1]), jnp.float32)
                bucket = bucket.at[: part.size].set(cond[part])
                imgs = self._decode_one(
                    self._weights, bucket, jax.random.fold_in(key, e * 100003 + start), e
                )
                pending.append((part, imgs))
        if not readback:
            return pending
        out = np.empty((n, h, w), np.float32)
        for part, imgs in pending:
            out[part] = np.asarray(imgs[: part.size])
        return out

    def throughput_stream(self, n_showers: int = 65536, warmup: bool = True, key=None):
        """Steady-state streaming-grouped throughput on synthetic conditions."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1), (n_showers, self.modules.cond_dim))
        )
        if warmup:
            self.simulate_stream(cond[: self.batch_size * self.modules.n_experts],
                                 jax.random.fold_in(key, 2))
        # Compute-only timing: scalar readback per chunk forces execution
        # without bulk host transfer (which a remote-relay link would
        # bottleneck; on local TPU PCIe the image readback is negligible).
        t0 = time.perf_counter()
        pending = self.simulate_stream(cond, jax.random.fold_in(key, 3), readback=False)
        total_sum = sum(float(imgs.sum()) for _, imgs in pending)
        assert total_sum == total_sum  # NaN guard; forces all executions
        dt = time.perf_counter() - t0
        return {
            "showers_per_sec": n_showers / dt,
            "batch_size": float(self.batch_size),
            "seconds": dt,
            "n_showers": float(n_showers),
        }

    def throughput_grouped(self, n_batches: int = 20, warmup: int = 3, key=None):
        """Steady-state grouped-dispatch throughput (balanced random routing)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1), (self.batch_size, self.modules.cond_dim))
        )
        for i in range(warmup):
            out = self.simulate_grouped(cond, jax.random.fold_in(key, i))
        t0 = time.perf_counter()
        for i in range(n_batches):
            out = self.simulate_grouped(cond, jax.random.fold_in(key, 100 + i))
        dt = time.perf_counter() - t0
        total = n_batches * self.batch_size
        return {
            "showers_per_sec": total / dt,
            "batch_size": float(self.batch_size),
            "seconds": dt,
            "n_showers": float(total),
        }

    @classmethod
    def from_state(cls, modules: MoEModules, state, use_ema: bool = True, **kwargs) -> "FastSim":
        gen_params = state.ema_gen_params if use_ema else state.gen.params
        return cls(modules, gen_params, state.gen.stats, state.router.params, **kwargs)

    @classmethod
    def from_checkpoint(cls, cfg, dir_models: str, epoch: int, **kwargs) -> "FastSim":
        from zdcsim.train.checkpoint import restore_checkpoint
        from zdcsim.train.state import init_state_jit

        modules = build_moe(cfg)
        template = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
        state = restore_checkpoint(dir_models, epoch, template)
        return cls.from_state(modules, state, **kwargs)

    def standardize(self, cond_raw: np.ndarray) -> np.ndarray:
        if self.scaler_cond is None:
            return np.asarray(cond_raw, np.float32)
        return self.scaler_cond.transform(cond_raw)

    def simulate(
        self, cond: np.ndarray, key: jax.Array, return_experts: bool = False
    ):
        """Generate linear-space showers for [N, 9] standardized conditions.

        Chunks to the compiled batch shape; the final partial chunk is padded
        and trimmed (static shapes — one XLA program for any N).
        """
        cond = jnp.asarray(cond, jnp.float32)
        n = cond.shape[0]
        bs = self.dense_batch_size
        outs, idxs = [], []
        for start in range(0, n, bs):
            chunk = cond[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            imgs, idx = self._sim(self._weights, chunk, jax.random.fold_in(key, start))
            outs.append(imgs[: bs - pad])
            idxs.append(idx[: bs - pad])
        images = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        if return_experts:
            return images, (jnp.concatenate(idxs) if len(idxs) > 1 else idxs[0])
        return images

    def throughput(
        self, n_batches: int = 20, warmup: int = 3, key: Optional[jax.Array] = None
    ) -> Dict[str, float]:
        """Measure steady-state showers/sec on synthetic conditions."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = jax.random.normal(jax.random.fold_in(key, 1), (self.dense_batch_size, self.modules.cond_dim))
        for i in range(max(warmup, 1)):
            out, _ = self._sim(self._weights, cond, jax.random.fold_in(key, i))
        float(out.sum())
        # NOTE: a scalar readback per batch forces real execution —
        # block_until_ready is unreliable over remote-relay PJRT backends
        # (observed: "ready" ~0.9 ms for a 14 GFLOP program).
        t0 = time.perf_counter()
        for i in range(n_batches):
            out, _ = self._sim(self._weights, cond, jax.random.fold_in(key, 100 + i))
            float(out.sum())
        dt = time.perf_counter() - t0
        total = n_batches * self.dense_batch_size
        return {
            "showers_per_sec": total / dt,
            "batch_size": float(self.dense_batch_size),
            "seconds": dt,
            "n_showers": float(total),
        }
