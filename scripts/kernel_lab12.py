#!/usr/bin/env python
"""Lab 12: MLP megakernel design (a) — per-tile activation.

lab11 showed the tile pattern can stream at 14.8 us/layer and per-tile
pipeline overhead is ~0.15 us with an empty body — so the production
kernel's gap (24.5 measured) is unhidden CRITICAL-PATH COMPUTE: the
serialized prologue_b (activation over [tb, 2I] + norm + quant) plus
unpack VPU time.

Design (a): fetch the gate tile and its MATCHING up tile each iteration
(the same gateup array passed twice with different column index maps —
no weight-layout change), compute relu2(gate)*up per tile into an act
scratch while the next tiles' DMAs run; prologue_b shrinks to
norm+quant over [tb, I]. Bit-exact: identical elementwise math at
identical bf16 rounding points.

Variants: base (production mlp_block_megakernel, tiles 2304/2560) vs
interleave (this design, gate tile 2304 -> 3 gu iterations x 2 DMAs).
Chain-slope timing, same session.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import fuse_projections, init_params
    from wrinklefree_tpu.ops import ternary_pallas as tp
    from wrinklefree_tpu.ops.ternary_pallas import _planes_dot, _silu_mul

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
    pln_rows = rows(stack["input_ln"], H)
    ffn_rows = rows(stack["ffn_sub"], inter)
    gateup_scale = rows(
        stack["gateup_scale"][:, None] * jnp.ones((1, 2 * inter)), 2 * inter)
    h0 = jnp.ones((1, H), jnp.bfloat16) * 0.01
    gw, dw = stack["gateup_qw"], stack["down_qw"]
    k4, i4 = H // 4, inter // 4
    eps = cfg.rms_norm_eps

    # ----- base: production kernel ----------------------------------------
    mlp_fn = functools.partial(
        tp.mlp_block_megakernel, eps=eps, act="relu2", norm2=True)
    base_weights = (gw, dw, gateup_scale, down_rows, pln_rows, ffn_rows)

    def base_call(h, l, w):
        gw_, dw_, gsc, dro, pro, fro = w
        return mlp_fn(h, gw_, dw_, l, gsc, dro, pro, fro)

    # ----- interleave: per-tile activation --------------------------------
    tg = int(os.environ.get("WF_LAB12_TG", "2304"))
    tn_d = int(os.environ.get("WF_LAB12_TD", "2560"))
    ngu, nd = inter // tg, H // tn_d
    tb = 8

    def _kernel(l_ref, h_ref, hres_ref, g_ref, u_ref, dw_ref, nw1_ref,
                nw2_ref, sg_ref, su_ref, sw2_ref, o_ref, act_ref, xq_ref,
                sx_ref, xq2_ref, sx2_ref, *, act, norm2):
        del l_ref
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _prologue_a():
            x = h_ref[:]
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
                * nw1_ref[0, 0:1, :].astype(x.dtype)
            xf = x.astype(jnp.float32)
            absmax = jnp.clip(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
            sx = 127.0 / absmax
            sx_ref[:] = sx
            xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

        @pl.when(g < ngu)
        def _gu_tile():
            xq = xq_ref[:]
            ga = _planes_dot(xq, g_ref[0], jnp.int8)
            ua = _planes_dot(xq, u_ref[0], jnp.int8)
            invg = 1.0 / (sx_ref[:] * sg_ref[0, 0:1, :])
            invu = 1.0 / (sx_ref[:] * su_ref[0, 0:1, :])
            gate = (ga.astype(jnp.float32) * invg).astype(jnp.bfloat16)
            up = (ua.astype(jnp.float32) * invu).astype(jnp.bfloat16)
            if act == "silu":
                a = _silu_mul(gate, up)
            else:
                a = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
            act_ref[:, pl.ds(g * tg, tg)] = a

        @pl.when(g == ngu)
        def _prologue_b():
            x = act_ref[:]
            if norm2:
                xf = x.astype(jnp.float32)
                var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
                    * nw2_ref[0, 0:1, :].astype(x.dtype)
            xf = x.astype(jnp.float32)
            absmax = jnp.clip(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
            sx = 127.0 / absmax
            sx2_ref[:] = sx
            xq2_ref[:] = jnp.clip(
                jnp.round(xf * sx), -128, 127).astype(jnp.int8)

        @pl.when(g >= ngu)
        def _down_tile():
            acc = _planes_dot(xq2_ref[:], dw_ref[0], jnp.int8)
            inv = 1.0 / (sx2_ref[:] * sw2_ref[0, 0:1, :])
            d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
            o_ref[:] = hres_ref[:] + d

    def _cd(g):
        return jnp.clip(g - ngu, 0, nd - 1)

    def _cg(g):
        return jnp.minimum(g, ngu - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, ngu + nd),
        in_specs=[
            pl.BlockSpec((tb, H), lambda i, g, l: (i, 0)),
            pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _cd(g))),
            # gate columns: blocks [0, ngu) of the fused [K4, 2I] array
            pl.BlockSpec((1, k4, tg), lambda i, g, l: (l[0], 0, _cg(g))),
            # matching up columns: blocks [ngu, 2ngu)
            pl.BlockSpec((1, k4, tg), lambda i, g, l: (l[0], 0, ngu + _cg(g))),
            pl.BlockSpec((1, i4, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
            pl.BlockSpec((1, 8, H), lambda i, g, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, inter), lambda i, g, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, tg), lambda i, g, l: (l[0], 0, _cg(g))),
            pl.BlockSpec((1, 8, tg), lambda i, g, l: (l[0], 0, ngu + _cg(g))),
            pl.BlockSpec((1, 8, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
        ],
        out_specs=pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _cd(g))),
        scratch_shapes=[
            pltpu.VMEM((tb, inter), jnp.bfloat16),
            pltpu.VMEM((tb, H), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, inter), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
    )

    il_weights = (gw, dw, gateup_scale, down_rows, pln_rows, ffn_rows)

    def il_call(h, l, w):
        gw_, dw_, gsc, dro, pro, fro = w
        h2 = jnp.pad(h, ((0, tb - h.shape[0]), (0, 0)))
        lidx = jnp.asarray(l, jnp.int32).reshape(1)
        out = pl.pallas_call(
            functools.partial(_kernel, act="relu2", norm2=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tb, H), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * tb * H * 2 * inter + 2 * tb * inter * H,
                bytes_accessed=k4 * 2 * inter + i4 * H,
                transcendentals=0,
            ),
        )(lidx, h2, h2, gw_, gw_, dw_, pro, fro,
          gsc, gsc, dro)
        return out[: h.shape[0]]

    gb = (k4 * 2 * inter + i4 * H) / 1e9

    def measure(tag, call, weights):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(h, w, steps):
            def step(h, l):
                return call(h, l % L, w), None

            h, _ = jax.lax.scan(step, h, jnp.arange(steps, dtype=jnp.int32))
            return h

        def run(n):
            np.asarray(chain(h0, weights, n))

        def t(n):
            t0 = time.perf_counter()
            run(n)
            return time.perf_counter() - t0

        # LONG windows: at ~25 us/layer the (n2-n1) signal must dwarf the
        # ~30 ms transport jitter (short 64/512 windows gave +-5 us/layer
        # noise — measured 24.5 and 6.8 for the SAME kernel)
        n1, n2 = 256, 4096
        run(n1); run(n2)
        s = min((t(n2) - t(n1)) / (n2 - n1) for _ in range(3))
        print(f"{tag:12s}: {s*1e6:7.2f} us/layer  "
              f"(floor {gb/819*1e6:5.2f}, stream-meas 14.81)", flush=True)
        return s

    # correctness first: bit-exact vs the production kernel
    a = np.asarray(base_call(h0, 3, base_weights), np.float32)
    b = np.asarray(il_call(h0, 3, il_weights), np.float32)
    exact = np.array_equal(a, b)
    print(f"bit-exact vs base: {exact}"
          + ("" if exact else f"  maxdiff={np.abs(a-b).max()}"), flush=True)

    measure("base", base_call, base_weights)
    measure("interleave", il_call, il_weights)


if __name__ == "__main__":
    main()
