#!/usr/bin/env python
"""Lab 14: manual-DMA software pipeline for the MLP megakernel.

ROADMAP item 0's stated design: hide the prologue serialization and keep
the DMA queue non-empty across the whole kernel. The auto-pipeliner is
limited to double buffering (pl.Buffered(3) rejected: "Only single (1)
and double (2) buffering are supported") and fetches ALL step-0 inputs
(including the first down tile when its index map clips to 0) before the
first body runs. This lab replaces it with a single grid step that
manages its own DMA ring:

  - ring of gateup weight-tile DMAs (refill targets the slot consumed
    in the PREVIOUS iteration — prefetch distance depth-1 < depth — so
    the in-flight copy never lands on the tile being read; the original
    distance==depth version raced, see ADVICE.md r2)
  - down-tile DMAs started DURING the gateup steps (staged, or
    background-priority from step -1)
  - prologue A (norm+quant) runs while the first tiles stream
  - prologue B (act+sub-norm+quant) runs while the down tiles stream
  - optional `upipe`: software-pipelined unpack — tile g+1's bytes are
    shift/mask-unpacked into an int8 VMEM double buffer while tile g's
    dot occupies the MXU (the dot is issued BEFORE the next unpack so
    the scheduler can overlap them).

Bit-exactness is asserted against the production mlp_block_megakernel
(3 runs per variant — a raced ring can pass a single run flakily)
before timing. Long windows (256/4096, min of 3) per the transport
lesson in RESULTS.md.
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
    eps = cfg.rms_norm_eps
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
    gateup_rows = rows(
        stack["gateup_scale"][:, None] * jnp.ones((1, 2 * inter)), 2 * inter)
    gw, dw = stack["gateup_qw"], stack["down_qw"]
    k4, i4 = H // 4, inter // 4
    n_gu, n_h = 2 * inter, H
    tb = 8

    h0 = (jax.random.normal(jax.random.PRNGKey(0), (1, H)) * 0.05).astype(
        jnp.bfloat16)

    def _unpack_into(w_bytes, up_ref):
        """Shift/mask the packed tile into an int8 plane-stacked buffer
        (encoded 0..3; the -1 is folded into the row-sum correction,
        same algebra as _planes_dot)."""
        kk4 = w_bytes.shape[0]
        w32 = pltpu.bitcast(w_bytes, jnp.uint32)
        m = jnp.uint32(0x03030303)
        for j in range(4):
            up_ref[pl.ds(j * kk4, kk4), :] = pltpu.bitcast(
                pltpu.bitcast((w32 >> jnp.uint32(2 * j)) & m, jnp.uint8),
                jnp.int8)

    def _enc_dot(xq, w_enc):
        """dot against encoded {0,1,2} planes + exact row-sum fixup."""
        acc = jax.lax.dot_general(
            xq, w_enc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        corr = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        return acc - corr

    def make_manual(tn_gu, tn_d, depth, dw_starts, dw_priority, upipe=False):
        """dw_starts: tuple of gateup step at which each down-tile DMA
        is issued (len == nd; -1 = before the loop). dw_priority: DMA
        priority for those. upipe: software-pipeline the gateup unpack
        through an int8 double buffer."""
        ngu, nd = n_gu // tn_gu, n_h // tn_d
        assert len(dw_starts) == nd
        dring = min(2, nd)
        # a down DMA issued before the down loop's wait(t - dring) would
        # reuse a ring slot that still has an in-flight copy; with all
        # starts during the gateup phase this requires nd <= dring
        assert nd <= dring, (nd, dring)
        assert all(-1 <= s < ngu for s in dw_starts), dw_starts
        # refill distance depth-1 requires at least 2 slots
        assert depth >= 2

        def body(l_ref, h_ref, gw_hbm, dw_hbm, nw1_ref, nw2_ref, sw1_ref,
                 sw2_ref, o_ref, ring_gw, ring_dw, up_gw, gu_ref, xq_ref,
                 sx_ref, xq2_ref, sx2_ref, sem_gw, sem_dw):
            l = l_ref[0]

            def gw_dma(t):
                return pltpu.make_async_copy(
                    gw_hbm.at[l, :, pl.ds(t * tn_gu, tn_gu)],
                    ring_gw.at[t % depth], sem_gw.at[t % depth])

            def dw_dma(t):
                return pltpu.make_async_copy(
                    dw_hbm.at[l, :, pl.ds(t * tn_d, tn_d)],
                    ring_dw.at[t % dring], sem_dw.at[t % dring])

            # warm-up: fill depth-1 ring slots (the last slot stays free
            # so refills never target the tile being consumed) and any
            # down tiles staged at "step -1"
            for t in range(min(depth - 1, ngu)):
                gw_dma(t).start()
            for t, s in enumerate(dw_starts):
                if s < 0:
                    dw_dma(t).start(priority=dw_priority)

            # prologue A overlaps the warm-up stream
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

            def store_gu(g, acc):
                inv = 1.0 / (sx_ref[:] * sw1_ref[0, 0:1,
                                                 g * tn_gu:(g + 1) * tn_gu])
                gu_ref[:, g * tn_gu:(g + 1) * tn_gu] = (
                    acc.astype(jnp.float32) * inv
                ).astype(gu_ref.dtype)

            # gateup tiles (static unroll: ngu is compile-time)
            if upipe:
                # prime: unpack tile 0 into buffer 0
                gw_dma(0).wait()
                _unpack_into(ring_gw[0], up_gw.at[0])
                gw_dma(depth - 1).start()
                for g in range(ngu):
                    # issue the dot for tile g FIRST, then do the
                    # independent VPU work (next tile's unpack) while
                    # the MXU drains, and only then consume acc
                    acc = _enc_dot(xq_ref[:], up_gw[g % 2])
                    if g + 1 < ngu:
                        gw_dma(g + 1).wait()
                        _unpack_into(ring_gw[(g + 1) % depth],
                                     up_gw.at[(g + 1) % 2])
                        if g + depth < ngu:
                            # slot (g+depth)%depth == g%depth: consumed
                            # by THIS iteration's unpack source? no —
                            # ring slot g%depth was read by the unpack
                            # at iteration g-1; free by program order
                            gw_dma(g + depth).start()
                    for t, s in enumerate(dw_starts):
                        if s == g:
                            dw_dma(t).start(priority=dw_priority)
                    store_gu(g, acc)
            else:
                for g in range(ngu):
                    gw_dma(g).wait()
                    # refill distance depth-1: targets slot (g-1)%depth,
                    # consumed at iteration g-1 (never the live tile)
                    if g + depth - 1 < ngu:
                        gw_dma(g + depth - 1).start()
                    for t, s in enumerate(dw_starts):
                        if s == g:
                            dw_dma(t).start(priority=dw_priority)
                    acc = _planes_dot(xq_ref[:], ring_gw[g % depth], jnp.int8)
                    store_gu(g, acc)

            # prologue B overlaps the down-tile stream
            gu = gu_ref[:]
            gate, up = gu[:, :inter], gu[:, inter:]
            act = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
            xf = act.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            act = (xf * jax.lax.rsqrt(var + eps)).astype(act.dtype) \
                * nw2_ref[0, 0:1, :].astype(act.dtype)
            xf = act.astype(jnp.float32)
            absmax = jnp.clip(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
            sx2 = 127.0 / absmax
            sx2_ref[:] = sx2
            xq2_ref[:] = jnp.clip(
                jnp.round(xf * sx2), -128, 127).astype(jnp.int8)

            # down tiles + residual
            for g in range(nd):
                dw_dma(g).wait()
                acc = _planes_dot(xq2_ref[:], ring_dw[g % dring], jnp.int8)
                inv = 1.0 / (sx2_ref[:] * sw2_ref[0, 0:1,
                                                  g * tn_d:(g + 1) * tn_d])
                d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
                o_ref[:, g * tn_d:(g + 1) * tn_d] = (
                    h_ref[:, g * tn_d:(g + 1) * tn_d] + d)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((tb, H), lambda i, l: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 8, H), lambda i, l: (l[0], 0, 0)),
                pl.BlockSpec((1, 8, inter), lambda i, l: (l[0], 0, 0)),
                pl.BlockSpec((1, 8, n_gu), lambda i, l: (l[0], 0, 0)),
                pl.BlockSpec((1, 8, n_h), lambda i, l: (l[0], 0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, n_h), lambda i, l: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((depth, k4, tn_gu), jnp.uint8),
                pltpu.VMEM((dring, i4, tn_d), jnp.uint8),
                pltpu.VMEM((2 if upipe else 1, 4 * k4,
                            tn_gu if upipe else 128), jnp.int8),
                pltpu.VMEM((tb, n_gu), jnp.bfloat16),
                pltpu.VMEM((tb, H), jnp.int8),
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, inter), jnp.int8),
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((dring,)),
            ],
        )

        def call(h, l, w):
            gw_, dw_, gsc, dro, pro, fro = w
            h2 = jnp.pad(h, ((0, tb - h.shape[0]), (0, 0)))
            lidx = jnp.asarray(l, jnp.int32).reshape(1)
            out = pl.pallas_call(
                body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((tb, n_h), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=15 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=2 * tb * H * n_gu + 2 * tb * inter * n_h,
                    # packed weights dominate; scale rows (f32) and the
                    # activations/scratch round-trips are the remainder
                    bytes_accessed=(k4 * n_gu + i4 * n_h)
                    + 4 * 8 * (n_gu + n_h + H + inter)
                    + tb * (H * 2 + n_gu * 2 + inter + H),
                    transcendentals=0,
                ),
            )(lidx, h2, gw_, dw_, pro, fro, gsc, dro)
            return out[: h.shape[0]]

        return call

    mlp_fn = functools.partial(
        tp.mlp_block_megakernel, eps=eps, act="relu2", norm2=True)
    weights = (gw, dw, gateup_rows, down_rows, pln_rows, ffn_rows)

    def prod_call(h, l, w):
        gw_, dw_, gsc, dro, pro, fro = w
        return mlp_fn(h, gw_, dw_, l, gsc, dro, pro, fro)

    def measure(tag, call):
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
        print(f"{tag:28s}: {s*1e6:7.2f} us/layer", flush=True)

    # correctness gate: bit-exact vs production on layer 0 and 17,
    # repeated 3x (a raced DMA ring can pass a single run flakily)
    print("computing production reference...", flush=True)
    ref0 = np.asarray(prod_call(h0, 0, weights))
    ref17 = np.asarray(prod_call(h0, 17, weights))
    print("reference done", flush=True)
    import json
    sel = json.loads(os.environ.get(
        "WF_LAB14_VARIANTS",
        '[["d3 1536/1280 dw@7,8", 1536, 1280, 3, [7, 8], 0, 0],'
        ' ["d3 1536/1280 dw@-1 bg", 1536, 1280, 3, [-1, -1], 1, 0],'
        ' ["upipe 1152/1280 dw@9,10", 1152, 1280, 2, [9, 10], 0, 1],'
        ' ["upipe 1152/1280 dw@-1 bg", 1152, 1280, 2, [-1, -1], 1, 1]]'))
    variants = [
        (tag, make_manual(tn_gu, tn_d, depth, tuple(starts), prio,
                          upipe=bool(up)))
        for tag, tn_gu, tn_d, depth, starts, prio, up in sel
    ]
    print("variants built", flush=True)
    ok = []
    for tag, call in variants:
        try:
            exact = True
            for _ in range(3):
                got0 = np.asarray(call(h0, 0, weights))
                got17 = np.asarray(call(h0, 17, weights))
                exact = exact and np.array_equal(got0, ref0) \
                    and np.array_equal(got17, ref17)
            print(f"{tag:28s}: exact={exact}"
                  + ("" if exact else
                     f" maxdiff={np.abs(got0.astype(np.float32) - ref0.astype(np.float32)).max()}"),
                  flush=True)
            if exact:
                ok.append((tag, call))
        except Exception as e:
            print(f"{tag:28s}: FAIL {str(e)[:160]}", flush=True)

    if os.environ.get("WF_LAB14_BASE", "1") == "1":
        measure("production", prod_call)
    for tag, call in ok:
        measure(tag, call)


if __name__ == "__main__":
    main()
