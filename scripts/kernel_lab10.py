#!/usr/bin/env python
"""Lab 10: MLP megakernel overhead hunt (ROADMAP item 0).

Measured context (lab6, session 5): mlp_block_megakernel 27.6 us/layer
vs a ~16.2 us weight-stream floor (13.27 MB packed @ 819 GB/s). This lab
A/Bs the three candidate explanations in ONE tunnel session:

  tiles-old   : tn_gu=1536, tn_d=1280 (grid 1x11)   -- round-1 default
  tiles-big   : tn_gu=2304, tn_d=2560 (grid 1x7)    -- design (c)
  unpacked    : same grid, weights pre-unpacked int8 in HBM (4x bytes,
                no in-kernel unpack) -- design (b) diagnosis. Its floor
                is 53.1 MB @ 819 GB/s = 64.8 us; measured-minus-floor
                isolates fixed cost with ZERO unpack work.

Chain-slope timing per the lab5 transport rules (one lax.scan jit, one
np.asarray fetch, slope between two chain lengths).

Run: python scripts/kernel_lab10.py [variant]
With no argument it spawns one subprocess per variant (env-keyed tile
sizes are baked in at trace time, so variants need fresh processes).
"""

import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

VARIANTS = {
    "tiles-old": {"WF_MLP_TN_GU": "1792", "WF_MLP_TN_D": "1792"},
    "tiles-big": {"WF_MLP_TN_GU": "2304", "WF_MLP_TN_D": "2560"},
    "unpacked": {},
}


def main_variant(name: str):
    # env must be set before the kernel TRACE reads the tile knobs —
    # applies both via the spawner and when a variant is run directly
    os.environ.update(VARIANTS.get(name, {}))

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import fuse_projections, init_params
    from wrinklefree_tpu.ops import ternary_pallas as tp

    cfg = BitNetConfig.bitnet_2b()
    L = cfg.num_layers
    H, inter = cfg.hidden_size, cfg.intermediate_size
    params = init_params(cfg, seed=0)
    params = fuse_projections(params, cfg)
    stack = jax.device_put(params["layers"])

    def rows(a, n):
        return jnp.broadcast_to(
            a.astype(jnp.float32).reshape(L, 1, -1)[:, :, :n], (L, 8, n)
        )

    down_rows = rows(stack["down_scale"][:, None] * jnp.ones((1, H)), H)
    pln_rows = rows(stack["input_ln"], H)  # any [L,8,H] norm rows work for timing
    ffn_rows = rows(stack["ffn_sub"], inter)
    gateup_scale = rows(stack["gateup_scale"][:, None] * jnp.ones((1, 2 * inter)), 2 * inter)
    h0 = jnp.ones((1, H), jnp.bfloat16) * 0.01

    if name in ("tiles-old", "tiles-big"):
        gw, dw = stack["gateup_qw"], stack["down_qw"]
        mlp_fn = functools.partial(
            tp.mlp_block_megakernel,
            eps=cfg.rms_norm_eps, act="relu2", norm2=True,
        )
        weights = (gw, dw, gateup_scale, down_rows, pln_rows, ffn_rows)

        def call(h, l, w):
            gw_, dw_, gsc, dro, pro, fro = w
            return mlp_fn(h, gw_, dw_, l, gsc, dro, pro, fro)

        gb = (gw.shape[1] * gw.shape[2] + dw.shape[1] * dw.shape[2]) / 1e9
    else:
        # pre-unpack the planes to int8 in HBM: [L, 4*K4, N]
        def unpack(qw):
            w = qw.astype(jnp.int32)
            planes = [(((w >> (2 * j)) & 3) - 1).astype(jnp.int8) for j in range(4)]
            return jnp.concatenate(planes, axis=1)

        gw8 = jax.jit(unpack)(stack["gateup_qw"])  # [L, H, 2I]
        dw8 = jax.jit(unpack)(stack["down_qw"])  # [L, I, H]
        gw8, dw8 = jax.device_put((gw8, dw8))
        gb = (gw8.shape[1] * gw8.shape[2] + dw8.shape[1] * dw8.shape[2]) / 1e9

        # mirror of _mlp_megakernel with no unpack (weights already int8)
        def _kernel(l_ref, h_ref, hres_ref, gw_ref, dw_ref, nw1_ref, nw2_ref,
                    sw1_ref, sw2_ref, o_ref, gu_ref, xq_ref, sx_ref, xq2_ref,
                    sx2_ref, *, eps, ngu, nd, tn_gu, tn_d, inter):
            del l_ref
            g = pl.program_id(1)

            @pl.when(g == 0)
            def _prologue_a():
                x = h_ref[:]
                xf = x.astype(jnp.float32)
                var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw1_ref[0, 0:1, :].astype(x.dtype)
                xf = x.astype(jnp.float32)
                absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
                sx = 127.0 / absmax
                sx_ref[:] = sx
                xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

            @pl.when(g < ngu)
            def _gateup_tile():
                acc = jax.lax.dot_general(
                    xq_ref[:], gw_ref[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                inv = 1.0 / (sx_ref[:] * sw1_ref[0, 0:1, :])
                gu_ref[:, pl.ds(g * tn_gu, tn_gu)] = (
                    acc.astype(jnp.float32) * inv
                ).astype(gu_ref.dtype)

            @pl.when(g == ngu)
            def _prologue_b():
                gu = gu_ref[:]
                gate, up = gu[:, :inter], gu[:, inter:]
                x = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
                xf = x.astype(jnp.float32)
                var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw2_ref[0, 0:1, :].astype(x.dtype)
                xf = x.astype(jnp.float32)
                absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
                sx = 127.0 / absmax
                sx2_ref[:] = sx
                xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

            @pl.when(g >= ngu)
            def _down_tile():
                acc = jax.lax.dot_general(
                    xq2_ref[:], dw_ref[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                inv = 1.0 / (sx2_ref[:] * sw2_ref[0, 0:1, :])
                d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
                o_ref[:] = hres_ref[:] + d

        n_gu, n_h = 2 * inter, H
        # int8 weights are 4x the packed bytes: tiles sized so double-
        # buffered gw (H*tn_gu) + dw (I*tn_d) stay inside 16 MB VMEM
        tn_gu, tn_d = 1152, 512
        ngu, nd = n_gu // tn_gu, n_h // tn_d
        tb = 8

        def _cd(g):
            return jnp.clip(g - ngu, 0, nd - 1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, ngu + nd),
            in_specs=[
                pl.BlockSpec((tb, H), lambda i, g, l: (i, 0)),
                pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _cd(g))),
                pl.BlockSpec((1, H, tn_gu), lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))),
                pl.BlockSpec((1, inter, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
                pl.BlockSpec((1, 8, H), lambda i, g, l: (l[0], 0, 0)),
                pl.BlockSpec((1, 8, inter), lambda i, g, l: (l[0], 0, 0)),
                pl.BlockSpec((1, 8, tn_gu), lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))),
                pl.BlockSpec((1, 8, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
            ],
            out_specs=pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _cd(g))),
            scratch_shapes=[
                pltpu.VMEM((tb, n_gu), jnp.bfloat16),
                pltpu.VMEM((tb, H), jnp.int8),
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, inter), jnp.int8),
                pltpu.VMEM((tb, 1), jnp.float32),
            ],
        )

        weights = (gw8, dw8, pln_rows.astype(jnp.float32),
                   ffn_rows.astype(jnp.float32),
                   gateup_scale.astype(jnp.float32),
                   down_rows.astype(jnp.float32))

        def call(h, l, w):
            gw8_, dw8_, pro, fro, gsc, dro = w
            h2 = jnp.pad(h, ((0, tb - h.shape[0]), (0, 0)))
            lidx = jnp.asarray(l, jnp.int32).reshape(1)
            out = pl.pallas_call(
                functools.partial(
                    _kernel, eps=cfg.rms_norm_eps,
                    ngu=ngu, nd=nd, tn_gu=tn_gu, tn_d=tn_d, inter=inter,
                ),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((tb, n_h), jnp.bfloat16),
                cost_estimate=pl.CostEstimate(
                    flops=2 * tb * H * n_gu + 2 * tb * inter * n_h,
                    bytes_accessed=H * n_gu + inter * n_h,
                    transcendentals=0,
                ),
            )(lidx, h2, h2, gw8_, dw8_, pro, fro, gsc, dro)
            return out[: h.shape[0]]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(h, w, steps):
        def step(h, l):
            return call(h, l % L, w), None

        h, _ = jax.lax.scan(step, h, jnp.arange(steps, dtype=jnp.int32))
        return h

    def run(n):
        np.asarray(chain(h0, weights, n))

    def slope(n1=256, n2=4096, reps=3):
        # long windows: the (n2-n1) signal must dwarf ~30 ms transport
        # jitter (lab12: 64/512 windows gave +-5 us/layer scatter)
        run(n1)
        run(n2)
        t1 = min(_t(run, n1) for _ in range(reps))
        t2 = min(_t(run, n2) for _ in range(reps))
        return (t2 - t1) / (n2 - n1)

    def _t(fn, n):
        t0 = time.perf_counter()
        fn(n)
        return time.perf_counter() - t0

    s = slope()
    floor = gb / 819.0 * 1e-0  # GB / (GB/s) = s... gb in GB, bw 819 GB/s
    floor_us = gb / 819.0 * 1e6
    print(
        f"{name:10s}: {s*1e6:7.2f} us/layer   floor {floor_us:6.2f} us "
        f"({gb*1e3:.2f} MB/layer)  overhead {s*1e6-floor_us:+6.2f} us",
        flush=True,
    )


def main():
    if len(sys.argv) > 1:
        main_variant(sys.argv[1])
        return
    for name, env in VARIANTS.items():
        e = dict(os.environ)
        e.update(env)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), name], env=e, check=False
        )


if __name__ == "__main__":
    main()
