#!/usr/bin/env python
"""Lab 13: decompose the MLP megakernel's +7.4 us (over the 18.16 us
measured achievable stream) into unpack-VPU vs dot-MXU vs prologue cost.

Four bodies over the EXACT production tile walk (tiles-old 1536/1280,
the current default):
  empty       : touch-only (lab11 re-measure in this harness)
  unpack      : packed-SIMD unpack of every tile, result discarded into
                an 8x128 accumulator (VPU cost on the critical path)
  unpack+dot  : unpack + the real int8 MXU dot per tile (no prologues,
                no scratch writes of gu rows)
  real        : the production mlp_block_megakernel (prologues included)

real - (unpack+dot) ~= prologue/serialization cost
(unpack+dot) - unpack ~= MXU/dot issue cost
unpack - empty ~= unhidden unpack VPU cost
Long windows (256/4096, min of 3).
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
    from wrinklefree_tpu.ops.ternary_pallas import _planes_dot

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
    n_gu, n_h = 2 * inter, H
    tn_gu, tn_d = 1536, 1280
    ngu, nd = n_gu // tn_gu, n_h // tn_d
    tb = 8

    xq0 = jnp.ones((tb, H), jnp.int8)
    xq2_0 = jnp.ones((tb, inter), jnp.int8)

    def make_body(mode):
        def _kernel(l_ref, h_ref, gw_ref, dw_ref, o_ref, acc_ref,
                    xq_ref, xq2_ref, gu_ref):
            del l_ref
            g = pl.program_id(1)

            @pl.when(g == 0)
            def _init():
                xq_ref[:] = h_ref[:].astype(jnp.int8)
                xq2_ref[:] = jnp.ones_like(xq2_ref)

            if mode == "empty":
                @pl.when(g < ngu)
                def _gu():
                    acc_ref[:] += gw_ref[0, :8, :128].astype(jnp.int32).astype(jnp.float32)

                @pl.when(g >= ngu)
                def _d():
                    acc_ref[:] += dw_ref[0, :8, :128].astype(jnp.int32).astype(jnp.float32)
            elif mode == "unpack":
                @pl.when(g < ngu)
                def _gu():
                    w32 = pltpu.bitcast(gw_ref[0], jnp.uint32)
                    m = jnp.uint32(0x03030303)
                    enc = [
                        pltpu.bitcast((w32 >> jnp.uint32(2 * j)) & m,
                                      jnp.uint8)
                        for j in range(4)
                    ]
                    w_full = jnp.concatenate(enc, axis=0).astype(jnp.int8)
                    acc_ref[:] += w_full[:8, :128].astype(jnp.int32).astype(jnp.float32)

                @pl.when(g >= ngu)
                def _d():
                    w32 = pltpu.bitcast(dw_ref[0], jnp.uint32)
                    m = jnp.uint32(0x03030303)
                    enc = [
                        pltpu.bitcast((w32 >> jnp.uint32(2 * j)) & m,
                                      jnp.uint8)
                        for j in range(4)
                    ]
                    w_full = jnp.concatenate(enc, axis=0).astype(jnp.int8)
                    acc_ref[:] += w_full[:8, :128].astype(jnp.int32).astype(jnp.float32)
            elif mode == "dot":
                @pl.when(g < ngu)
                def _gu():
                    acc = _planes_dot(xq_ref[:], gw_ref[0], jnp.int8)
                    acc_ref[:] += acc[:, :128].astype(jnp.float32)

                @pl.when(g >= ngu)
                def _d():
                    acc = _planes_dot(xq2_ref[:], dw_ref[0], jnp.int8)
                    acc_ref[:] += acc[:, :128].astype(jnp.float32)
            else:  # dot+write: per-tile scale multiply + gu scratch write
                @pl.when(g < ngu)
                def _gu():
                    acc = _planes_dot(xq_ref[:], gw_ref[0], jnp.int8)
                    inv = 1.0 / (0.5 * jnp.float32(3.0))
                    gu_ref[:, pl.ds(g * tn_gu, tn_gu)] = (
                        acc.astype(jnp.float32) * inv
                    ).astype(gu_ref.dtype)
                    acc_ref[:] += acc[:, :128].astype(jnp.float32)

                @pl.when(g >= ngu)
                def _d():
                    acc = _planes_dot(xq2_ref[:], dw_ref[0], jnp.int8)
                    acc_ref[:] += acc[:, :128].astype(jnp.float32)

            @pl.when(g == ngu + nd - 1)
            def _out():
                o_ref[:] = (
                    h_ref[:, :128].astype(jnp.float32) + acc_ref[:]
                ).astype(o_ref.dtype)

        return _kernel

    def _cd(g):
        return jnp.clip(g - ngu, 0, nd - 1)

    def make_call(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, ngu + nd),
            in_specs=[
                pl.BlockSpec((tb, H), lambda i, g, l: (i, 0)),
                pl.BlockSpec((1, k4, tn_gu),
                             lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))),
                pl.BlockSpec((1, i4, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
            ],
            out_specs=pl.BlockSpec((tb, 128), lambda i, g, l: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((tb, 128), jnp.float32),
                pltpu.VMEM((tb, H), jnp.int8),
                pltpu.VMEM((tb, inter), jnp.int8),
                pltpu.VMEM((tb, n_gu), jnp.bfloat16),
            ],
        )
        body = make_body(mode)

        def call(h, l, w):
            gw_, dw_ = w
            h2 = jnp.pad(h, ((0, tb - h.shape[0]), (0, 0)))
            lidx = jnp.asarray(l, jnp.int32).reshape(1)
            out = pl.pallas_call(
                body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((tb, 128), jnp.bfloat16),
                cost_estimate=pl.CostEstimate(
                    flops=1, bytes_accessed=k4 * n_gu + i4 * n_h,
                    transcendentals=0,
                ),
            )(lidx, h2, gw_, dw_)
            return jnp.pad(out[: h.shape[0]], ((0, 0), (0, H - 128)))

        return call

    mlp_fn = functools.partial(
        tp.mlp_block_megakernel, eps=cfg.rms_norm_eps, act="relu2",
        norm2=True)
    real_weights = (gw, dw, gateup_scale, down_rows, pln_rows, ffn_rows)

    def real_call(h, l, w):
        gw_, dw_, gsc, dro, pro, fro = w
        return mlp_fn(h, gw_, dw_, l, gsc, dro, pro, fro)

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

        n1, n2 = 256, 4096
        run(n1); run(n2)
        s = min((t(n2) - t(n1)) / (n2 - n1) for _ in range(3))
        print(f"{tag:12s}: {s*1e6:7.2f} us/layer", flush=True)

    w2 = (gw, dw)
    measure("empty", make_call("empty"), w2)
    measure("unpack", make_call("unpack"), w2)
    measure("unpack+dot", make_call("dot"), w2)
    measure("dot+write", make_call("write"), w2)
    measure("real", real_call, real_weights)


if __name__ == "__main__":
    main()
