#!/usr/bin/env python
"""Lab 15: manual-DMA attention megakernel (batch-1 decode).

After the MLP manual pipeline (lab14, 25.5 -> 21.9 us/layer), the
attention block is the largest remaining per-token component:
27.8 us/layer (lab6) against a ~6-8 us weight+cache stream floor. The
auto kernel's structural costs:

  1. the WHOLE static-T cache is a BlockSpec operand: DMA'd in, copied
     VMEM->VMEM (ck_out[:] = ck_ref[:]), and DMA'd back out in full
     every layer — ~3x the cache bytes actually needed, through the VPU
  2. the auto pipeliner double-buffers the 5 weight tiles and
     serializes the input fetch ahead of the first body (lab13/14)
  3. the attention phase is one serialized grid step with no weight
     streaming behind it

Manual variant: single grid step; caches stay in HBM (aliased operands,
memory_space=ANY) viewed as [T*KV, 128] rows; only rows < pos are
DMA-read (tiles predicated on pos — read bytes scale with the actual
context, not static T); the new token's roped k / v rows land via an
aligned read-modify-write of the 40-row window covering the slot's
8-slot group ((pos//8)*40 is provably 8-divisible, which Mosaic
requires for dynamic HBM slices — a direct [8,128] write at pos*KV is
rejected; the RMW preserves every non-target row exactly); qkv/o
weight tiles and all cache tiles are started up front and waited
just-in-time, with the norm/quant prologues overlapping the streams.
Scores go through a full-precision two-pass softmax (f32 scores
buffer, exact row max) with the new-token column merged analytically,
so there is no flash-accumulation drift.

Usage: python scripts/kernel_lab15.py [--T 1024] [--tt 512]
       [--pos 16,256,512,1000] [--windows 64,512] [--reps 3]
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.ops import ternary_pallas as tp  # noqa: E402
from wrinklefree_tpu.ops.ternary_pallas import _planes_dot  # noqa: E402


def _rotate_half_lanes(x):
    return tp._rotate_half_lanes(x)


def _attn_manual_kernel(
    pos_ref, h_ref, qw_hbm, ow_hbm, nw_ref, subw_ref, sq_ref, so_ref,
    cos_ref, sin_ref, ckr_hbm, cvr_hbm,
    o_ref, ck_out, cv_out,
    w_qw, w_ow, k_res, v_res, scores, qkv_s, qh_s,
    xq_ref, sx_ref, xq2_ref, sx2_ref, knew, vnew, kwin, vwin, oacc_ref,
    sem_qw, sem_ow, sem_k, sem_v, sem_wr,
    *, dot_dtype, eps, norm2, nq, no, tn_q, tn_o, nt, tt, q_dim,
    n_kv, n_heads, head_dim,
):
    SKIP = set(os.environ.get("WF_LAB15_SKIP", "").split(","))
    pos = pos_ref[0]
    D = head_dim
    KV = n_kv
    G = n_heads // n_kv
    kvd = KV * D
    R = KV * 8  # packed q rows (G real per kv head)

    def qw_dma(g):
        return pltpu.make_async_copy(
            qw_hbm.at[:, pl.ds(g * tn_q, tn_q)], w_qw.at[g], sem_qw.at[g])

    def ow_dma(g):
        return pltpu.make_async_copy(
            ow_hbm.at[:, pl.ds(g * tn_o, tn_o)], w_ow.at[g], sem_ow.at[g])

    def k_dma(t):
        return pltpu.make_async_copy(
            ckr_hbm.at[pl.ds(t * tt * KV, tt * KV)],
            k_res.at[pl.ds(t * tt * KV, tt * KV)], sem_k.at[t])

    def v_dma(t):
        return pltpu.make_async_copy(
            cvr_hbm.at[pl.ds(t * tt * KV, tt * KV)],
            v_res.at[pl.ds(t * tt * KV, tt * KV)], sem_v.at[t])

    # aligned RMW window for the new-token row write: the 8-slot group
    # holding slot pos, rows [grp*8*KV, grp*8*KV + 8*KV)
    grp = pos // 8
    W = 8 * KV
    rd_k = pltpu.make_async_copy(
        ckr_hbm.at[pl.ds(grp * W, W)], kwin, sem_wr.at[0])
    rd_v = pltpu.make_async_copy(
        cvr_hbm.at[pl.ds(grp * W, W)], vwin, sem_wr.at[1])

    # ---- warm-up: every stream starts now; waits are just-in-time ----
    for g in range(nq):
        qw_dma(g).start()
    rd_k.start()
    rd_v.start()
    for t in range(nt):
        @pl.when(pos > t * tt)
        def _():
            k_dma(t).start()
            v_dma(t).start()
    for g in range(no):
        ow_dma(g).start(priority=int(os.environ.get("WF_LAB15_OWPRI", "1")))

    # ---- prologue A (overlaps the streams): norm + quant ----
    x = h_ref[:]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * nw_ref[0:1, :].astype(x.dtype)
    xf = x.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx = 127.0 / absmax
    sx_ref[:] = sx
    xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    # ---- qkv tiles ----
    for g in range(nq):
        qw_dma(g).wait()
        if "qkvdot" not in SKIP:
            acc = _planes_dot(xq_ref[:], w_qw[g], dot_dtype)
            inv = 1.0 / (sx_ref[:] * sq_ref[0:1, pl.ds(g * tn_q, tn_q)])
            qkv_s[:, pl.ds(g * tn_q, tn_q)] = (
                acc.astype(jnp.float32) * inv
            ).astype(qkv_s.dtype)

    # ---- attention ----
    qkv = qkv_s[:]
    cos = cos_ref[0:1, :].astype(qkv.dtype)
    sin = sin_ref[0:1, :].astype(qkv.dtype)
    scale = 1.0 / float(np.sqrt(D))

    # new-token roped k / v -> staging rows 0..KV-1 (padding rows must
    # be FINITE: vnew feeds a masked dot where a NaN times a zero
    # weight would still poison the accumulator)
    knew[:] = jnp.zeros((8, D), knew.dtype)
    vnew[:] = jnp.zeros((8, D), vnew.dtype)
    for kvh in range(KV):
        k_h = qkv[:, q_dim + kvh * D : q_dim + (kvh + 1) * D]
        k_roped = k_h * cos + _rotate_half_lanes(k_h) * sin
        knew[kvh : kvh + 1, :] = k_roped[0:1, :]
        v_h = qkv[:, q_dim + kvd + kvh * D : q_dim + kvd + (kvh + 1) * D]
        vnew[kvh : kvh + 1, :] = v_h[0:1, :]

    # overlay the new rows into the RMW window at sublane offset
    # (pos%8)*KV and write the whole aligned window back
    off = (pos % 8) * KV
    rd_k.wait()
    rd_v.wait()
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    sel = (wrow >= off) & (wrow < off + KV)
    pad8 = jnp.zeros((W - 8, 128), jnp.float32)

    def _place(new_ref):
        # dynamic rotate is 32-bit only: roll in f32, cast back
        stacked = jnp.concatenate([new_ref[:].astype(jnp.float32), pad8], 0)
        return pltpu.roll(stacked, off, 0).astype(kwin.dtype)

    if "rmw" not in SKIP:
        kwin[:] = jnp.where(sel, _place(knew), kwin[:])
        vwin[:] = jnp.where(sel, _place(vnew), vwin[:])
    wr_k = pltpu.make_async_copy(
        kwin, ck_out.at[pl.ds(grp * W, W)], sem_wr.at[2])
    wr_v = pltpu.make_async_copy(
        vwin, cv_out.at[pl.ds(grp * W, W)], sem_wr.at[3])
    wr_k.start()
    wr_v.start()

    # packed q heads: row kvh*8+g holds head (kvh*G+g); rows g>=G unused
    for kvh in range(KV):
        for gg in range(G):
            off = (kvh * G + gg) * D
            qh_s[kvh * 8 + gg : kvh * 8 + gg + 1, :] = qkv[0:1, off : off + D]
    q_roped = qh_s[:] * cos + _rotate_half_lanes(qh_s[:]) * sin  # [R, D]

    # scores pass: one joint dot per tile over the [tt*KV, D] rows;
    # column c of tile t is (time t*tt + c//KV, head c%KV); the head
    # mask keeps each packed q row on its own kv head
    scores[:] = jnp.full((R, nt * tt * KV), -1e30, jnp.float32)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 0) // 8
    col_head = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 1) % KV
    col_time0 = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 1) // KV
    for t in range(nt):
        @pl.when(pos > t * tt)
        def _():
            k_dma(t).wait()
            if "scoredot" not in SKIP:
                s = jax.lax.dot_general(
                    q_roped, k_res[pl.ds(t * tt * KV, tt * KV), :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [R, tt*KV]
                ok = (col_head == row_head) & (col_time0 + (t * tt) < pos)
                scores[:, pl.ds(t * tt * KV, tt * KV)] = jnp.where(ok, s, -1e30)

    # new-token scores [R, 8] (cols >= KV masked; head-matched)
    kn = knew[:]  # [8, D] rows 0..KV-1 real
    s_new = jax.lax.dot_general(
        q_roped, kn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    colh = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 0) // 8
    s_new = jnp.where((colh == rowh) & (colh < KV), s_new, -1e30)

    # exact two-pass softmax over buffer + new column
    m = jnp.maximum(
        jnp.max(scores[:], axis=-1, keepdims=True),
        jnp.max(s_new, axis=-1, keepdims=True),
    )  # [R, 1]
    if "softmax" not in SKIP:
        scores[:] = jnp.exp(scores[:] - m)
    e_new = jnp.exp(s_new - m)  # [R, 8]
    denom = (
        jnp.sum(scores[:], axis=-1, keepdims=True)
        + jnp.sum(e_new, axis=-1, keepdims=True)
    )

    # PV: tiled accumulation (VMEM ref — pl.when bodies can't carry
    # Python values out) from resident v + new-token term
    oacc_ref[:] = jax.lax.dot_general(
        e_new, vnew[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, D] — vnew rows >= KV are zero and masked by e_new == 0
    for t in range(nt):
        @pl.when(pos > t * tt)
        def _():
            v_dma(t).wait()
            if "pvdot" not in SKIP:
                p = scores[:, pl.ds(t * tt * KV, tt * KV)].astype(qkv.dtype)
                oacc_ref[:] += jax.lax.dot_general(
                    p, v_res[pl.ds(t * tt * KV, tt * KV), :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_all = (oacc_ref[:] / denom).astype(qkv.dtype)  # [R, D]

    # repack head rows into qkv_s columns, then sub-norm + quant
    for kvh in range(KV):
        for gg in range(G):
            off = (kvh * G + gg) * D
            qkv_s[0:1, pl.ds(off, D)] = out_all[kvh * 8 + gg : kvh * 8 + gg + 1, :]
    x = qkv_s[:, :q_dim]
    if norm2:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
            * subw_ref[0:1, :].astype(x.dtype)
    xf = x.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx2 = 127.0 / absmax
    sx2_ref[:] = sx2
    xq2_ref[:] = jnp.clip(jnp.round(xf * sx2), -128, 127).astype(jnp.int8)

    # ---- o tiles + residual ----
    for g in range(no):
        ow_dma(g).wait()
        if "odot" not in SKIP:
            acc = _planes_dot(xq2_ref[:], w_ow[g], dot_dtype)
            inv = 1.0 / (sx2_ref[:] * so_ref[0:1, pl.ds(g * tn_o, tn_o)])
            d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
            o_ref[:, pl.ds(g * tn_o, tn_o)] = h_ref[:, pl.ds(g * tn_o, tn_o)] + d
        else:
            o_ref[:, pl.ds(g * tn_o, tn_o)] = h_ref[:, pl.ds(g * tn_o, tn_o)]

    wr_k.wait()
    wr_v.wait()


def make_manual(cfg, T_pad, tt, tn_q=1280, tn_o=1280):
    H, Q = cfg.hidden_size, cfg.q_dim
    KV, D = cfg.num_kv_heads, cfg.head_dim
    n_q = Q + 2 * KV * D
    nq, no = n_q // tn_q, H // tn_o
    assert T_pad % tt == 0 and tt % 8 == 0
    nt = T_pad // tt
    R = KV * 8
    k4, q4 = H // 4, Q // 4

    kern = functools.partial(
        _attn_manual_kernel, dot_dtype=jnp.int8, eps=cfg.rms_norm_eps,
        norm2=cfg.sub_norms, nq=nq, no=no, tn_q=tn_q, tn_o=tn_o, nt=nt,
        tt=tt, q_dim=Q, n_kv=KV, n_heads=cfg.num_heads, head_dim=D,
    )

    @jax.jit
    def call(h2, ckr, cvr, qw, ow, pos, sq, so, nw, subw, cos8, sin8):
        pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, H), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # qkv weights
                pl.BlockSpec(memory_space=pltpu.ANY),  # o weights
                pl.BlockSpec((8, H), lambda i: (0, 0)),  # input_ln rows
                pl.BlockSpec((8, Q), lambda i: (0, 0)),  # attn_sub rows
                pl.BlockSpec((8, n_q), lambda i: (0, 0)),  # qkv scale rows
                pl.BlockSpec((8, H), lambda i: (0, 0)),  # o scale rows
                pl.BlockSpec((8, D), lambda i: (0, 0)),  # cos
                pl.BlockSpec((8, D), lambda i: (0, 0)),  # sin
                pl.BlockSpec(memory_space=pltpu.ANY),  # k rows [T_pad*KV, D]
                pl.BlockSpec(memory_space=pltpu.ANY),  # v rows
            ],
            out_specs=[
                pl.BlockSpec((8, H), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((8, H), jnp.bfloat16),
                jax.ShapeDtypeStruct(ckr.shape, ckr.dtype),
                jax.ShapeDtypeStruct(cvr.shape, cvr.dtype),
            ],
            input_output_aliases={10: 1, 11: 2},
            scratch_shapes=[
                pltpu.VMEM((nq, k4, tn_q), jnp.uint8),
                pltpu.VMEM((no, q4, tn_o), jnp.uint8),
                pltpu.VMEM((nt * tt * KV, D), jnp.bfloat16),  # k resident
                pltpu.VMEM((nt * tt * KV, D), jnp.bfloat16),  # v resident
                pltpu.VMEM((R, nt * tt * KV), jnp.float32),  # scores
                pltpu.VMEM((8, n_q), jnp.bfloat16),
                pltpu.VMEM((R, D), jnp.bfloat16),
                pltpu.VMEM((8, H), jnp.int8),
                pltpu.VMEM((8, 1), jnp.float32),
                pltpu.VMEM((8, Q), jnp.int8),
                pltpu.VMEM((8, 1), jnp.float32),
                pltpu.VMEM((8, D), jnp.bfloat16),  # knew staging
                pltpu.VMEM((8, D), jnp.bfloat16),  # vnew staging
                pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # k RMW window
                pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # v RMW window
                pltpu.VMEM((R, D), jnp.float32),  # PV accumulator
                pltpu.SemaphoreType.DMA((nq,)),
                pltpu.SemaphoreType.DMA((no,)),
                pltpu.SemaphoreType.DMA((nt,)),
                pltpu.SemaphoreType.DMA((nt,)),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 8 * H * n_q + 2 * 8 * Q * H,
                bytes_accessed=k4 * n_q + q4 * H + 4 * T_pad * KV * D,
                transcendentals=R * T_pad,
            ),
        )(pos_arr, h2, qw, ow, nw, subw, sq, so, cos8, sin8, ckr, cvr)

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=1024, help="logical cache slots")
    ap.add_argument("--tt", type=int, default=512)
    ap.add_argument("--pos", default="16,256,512,1000")
    ap.add_argument("--windows", default="64,512")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    cfg = BitNetConfig.bitnet_2b()
    H, Q = cfg.hidden_size, cfg.q_dim
    KV, D = cfg.num_kv_heads, cfg.head_dim
    n_q = Q + 2 * KV * D
    T = args.T
    T_pad = -(-T // args.tt) * args.tt
    rng = np.random.default_rng(0)

    qw = jnp.asarray(rng.integers(0, 255, (H // 4, n_q), np.uint8))
    ow = jnp.asarray(rng.integers(0, 255, (Q // 4, H), np.uint8))
    sq = jnp.asarray(rng.uniform(0.01, 0.02, (8, n_q)), jnp.float32)
    so = jnp.asarray(rng.uniform(0.01, 0.02, (8, H)), jnp.float32)
    nw = jnp.asarray(rng.uniform(0.9, 1.1, (8, H)), jnp.float32)
    subw = jnp.asarray(rng.uniform(0.9, 1.1, (8, Q)), jnp.float32)
    cos8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
        * jnp.ones((8, 1), jnp.float32)
    sin8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
        * jnp.ones((8, 1), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((1, H)) * 0.05, jnp.bfloat16)
    h2 = jnp.pad(h0, ((0, 7), (0, 0)))

    ck0 = jnp.asarray(rng.standard_normal((T_pad * KV, D)) * 0.1, jnp.bfloat16)
    cv0 = jnp.asarray(rng.standard_normal((T_pad * KV, D)) * 0.1, jnp.bfloat16)

    manual = make_manual(cfg, T_pad, args.tt)
    out = {"T": T, "T_pad": T_pad, "tt": args.tt}

    # -- correctness vs the production static kernel ------------------
    if not args.skip_baseline:
        base_T = min(T, 1536)  # auto kernel VMEM cap
        ck_b = ck0[: base_T * KV].reshape(1, base_T, KV, D)
        cv_b = cv0[: base_T * KV].reshape(1, base_T, KV, D)
        for pos in (0, 7, base_T - 2):
            hb, ckb, cvb = tp.attn_block_megakernel_static(
                h0, ck_b, cv_b, qw, ow, pos, sq, so, nw, subw, cos8, sin8,
                q_dim=Q, n_kv=KV, n_heads=cfg.num_heads, head_dim=D,
                eps=cfg.rms_norm_eps, norm2=cfg.sub_norms)
            hm, ckm, cvm = manual(h2, ck0, cv0, qw, ow, pos, sq, so, nw,
                                  subw, cos8, sin8)
            db = np.abs(np.asarray(hb, np.float32)
                        - np.asarray(hm[:1], np.float32))
            rel = db.max() / max(np.abs(np.asarray(hb, np.float32)).max(),
                                 1e-6)
            # written row must match exactly; rows < pos untouched
            kb = np.asarray(ckb[0, pos], np.float32)
            km = np.asarray(
                ckm[pos * KV : pos * KV + KV].reshape(KV, D), np.float32)
            row_ok = bool(np.array_equal(kb, km))
            # RMW must preserve EVERY row outside slot pos
            before = np.asarray(ck0)
            after = np.asarray(ckm)
            untouched = np.ones(len(before), bool)
            untouched[pos * KV : pos * KV + KV] = False
            hist_ok = bool(np.array_equal(before[untouched], after[untouched]))
            out[f"check_pos{pos}"] = {
                "max_abs": float(db.max()), "rel": float(rel),
                "krow_exact": row_ok, "hist_exact": hist_ok}
            print(f"pos={pos}: max_abs={db.max():.5f} rel={rel:.5f} "
                  f"krow_exact={row_ok} hist_exact={hist_ok}",
                  file=sys.stderr, flush=True)

    # -- chain-slope timing -------------------------------------------
    n1, n2 = (int(x) for x in args.windows.split(","))

    def chain_time(fn, pos, steps):
        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(1, 2))
        def chain(h, ck, cv, n):
            def step(carry, _):
                h, ck, cv = carry
                h, ck, cv = fn(h, ck, cv, pos)
                return (h, ck, cv), None
            (h, ck, cv), _ = jax.lax.scan(step, (h, ck, cv),
                                          jnp.arange(n), unroll=1)
            return h, ck, cv
        h, ck, cv = chain(h2, ck0 + 0, cv0 + 0, n=steps)
        t0 = time.perf_counter()
        h, ck, cv = chain(h, ck, cv, n=steps)
        np.asarray(h)
        return time.perf_counter() - t0

    def man_fn(h, ck, cv, pos):
        return manual(h, ck, cv, qw, ow, pos, sq, so, nw, subw, cos8, sin8)

    for pos in (int(p) for p in args.pos.split(",")):
        best = min(
            (chain_time(man_fn, pos, n2) - chain_time(man_fn, pos, n1))
            / (n2 - n1)
            for _ in range(args.reps)
        )
        out[f"manual_pos{pos}_us"] = round(best * 1e6, 2)
        print(f"manual pos={pos}: {best*1e6:.2f} us/layer",
              file=sys.stderr, flush=True)

    if not args.skip_baseline:
        base_T = min(T, 1536)
        ck_b = ck0[: base_T * KV].reshape(1, base_T, KV, D)
        cv_b = cv0[: base_T * KV].reshape(1, base_T, KV, D)

        def base_fn(h, ck, cv, pos):
            return tp.attn_block_megakernel_static(
                h[:1], ck, cv, qw, ow, pos, sq, so, nw, subw, cos8, sin8,
                q_dim=Q, n_kv=KV, n_heads=cfg.num_heads, head_dim=D,
                eps=cfg.rms_norm_eps, norm2=cfg.sub_norms)

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(1, 2))
        def bchain(h, ck, cv, n, pos):
            def step(carry, _):
                h, ck, cv = carry
                h1, ck, cv = base_fn(h, ck, cv, pos)
                return (jnp.pad(h1, ((0, 7), (0, 0))), ck, cv), None
            (h, ck, cv), _ = jax.lax.scan(step, (h, ck, cv),
                                          jnp.arange(n), unroll=1)
            return h, ck, cv

        def btime(pos, steps):
            h, ck, cv = bchain(h2, ck_b + 0, cv_b + 0, n=steps, pos=pos)
            t0 = time.perf_counter()
            h, ck, cv = bchain(h, ck, cv, n=steps, pos=pos)
            np.asarray(h)
            return time.perf_counter() - t0

        for pos in (16, min(1000, base_T - 8)):
            best = min((btime(pos, n2) - btime(pos, n1)) / (n2 - n1)
                       for _ in range(args.reps))
            out[f"auto_pos{pos}_us"] = round(best * 1e6, 2)
            print(f"auto   pos={pos}: {best*1e6:.2f} us/layer (T={base_T})",
                  file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
