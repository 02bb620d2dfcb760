"""Blockwise (flash) causal GQA attention — Pallas TPU kernel.

Online-softmax prefill attention: never materializes the [S, T] score
matrix in HBM. This is the TPU-native replacement for the reference's
full-softmax SDPA (its long-context plan was windowed/sparse attention,
reference docs/research/notebook.md:856-863; blockwise attention is the
capability upgrade SURVEY.md §5.7 calls for).

Supports a per-call `q_offset` so chunked prefill can attend into an
existing KV prefix: query row s sees key t iff t <= q_offset + s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _flash_kernel(qoff_ref, q_ref, k_ref, v_ref, o_ref, *, ts, tc, t_total, scale):
    s_idx = pl.program_id(2)
    # HIGHEST precision only for f32 inputs (CPU oracle exactness); Mosaic
    # rejects fp32 contract precision on bf16 operands, and bf16 runs on
    # the MXU natively anyway.
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    qdt = jnp.float32 if q_ref.dtype == jnp.float32 else q_ref.dtype
    q = (q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)).astype(qdt)  # [TS, D]
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0)
        + s_idx * ts
        + qoff_ref[0]
    )  # absolute query positions [TS,1]

    num_tc = t_total // tc

    def body(c, carry):
        m, l, acc = carry
        kblk = k_ref[0, 0, pl.ds(c * tc, tc)].astype(qdt)  # [TC, D]
        vblk = v_ref[0, 0, pl.ds(c * tc, tc)]
        s_ = jax.lax.dot_general(
            q, kblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [TS, TC]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1) + c * tc
        s_ = jnp.where(cols <= rows, s_, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s_, axis=-1, keepdims=True))
        p = jnp.exp(s_ - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return m_new, l, acc

    ts_, d = q.shape
    init = (
        jnp.full((ts_, 1), NEG_INF, jnp.float32),
        jnp.zeros((ts_, 1), jnp.float32),
        jnp.zeros((ts_, d), jnp.float32),
    )
    # only key blocks at or below the diagonal of this q tile contribute
    last_needed = jnp.minimum(
        (qoff_ref[0] + (s_idx + 1) * ts + tc - 1) // tc, num_tc
    )
    m, l, acc = jax.lax.fori_loop(0, last_needed, body, init)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_prefill(
    q: jax.Array,  # [B, S, NH, D]
    k: jax.Array,  # [B, T, KV, D]
    v: jax.Array,  # [B, T, KV, D]
    q_offset: jax.Array | int = 0,  # scalar
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    B, S, NH, D = q.shape
    T, KV = k.shape[1], k.shape[2]
    G = NH // KV
    scale = 1.0 / np.sqrt(D)

    ts = min(block_q, S)
    tc = min(block_k, T)
    if S % ts or T % tc:
        raise ValueError(f"S ({S}) and T ({T}) must tile by ({ts},{tc}); pad upstream")

    qt = q.transpose(0, 2, 1, 3)  # [B, NH, S, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, KV, T, D]
    vt = v.transpose(0, 2, 1, 3)

    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NH, S // ts),
        in_specs=[
            pl.BlockSpec((1, 1, ts, D), lambda b, h, s, qo: (b, h, s, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, s, qo: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, s, qo: (b, h // G, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ts, D), lambda b, h, s, qo: (b, h, s, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, ts=ts, tc=tc, t_total=T, scale=scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * S * T * D // 2,
            bytes_accessed=(q.size + k.size + v.size) * 2 + q.size * 2,
            transcendentals=B * NH * S * T // 2,
        ),
        interpret=interpret,
    )(qoff, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Paged-prefill flash attention: history (gathered pool) + current chunk
# ---------------------------------------------------------------------------


def _paged_flash_kernel(
    meta_ref, q_ref, k_ref, v_ref, o_ref, *, ts, tc, t_total, hist_len, scale
):
    """Like _flash_kernel but keys are [history ++ current-chunk]:

    - history key col < hist_len: valid iff col < kv_valid (= seq_len);
      causality is implied (all history positions precede the chunk).
    - current key col >= hist_len: rel = col - hist_len; valid iff
      rel <= (query's chunk-relative row) and rel < new_len (bucket pad).
    meta = [kv_valid..., new_len...] per batch row (scalar prefetch) —
    batched prefill rounds give every row its own lengths.
    """
    b_idx = pl.program_id(0)
    s_idx = pl.program_id(2)
    B = meta_ref.shape[0] // 2
    kv_valid = meta_ref[b_idx]
    new_len = meta_ref[B + b_idx]
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    qdt = jnp.float32 if q_ref.dtype == jnp.float32 else q_ref.dtype
    q = (q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)).astype(qdt)  # [TS, D]
    rows_rel = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0) + s_idx * ts
    )  # chunk-relative query rows [TS,1]

    def body(c, carry):
        m, l, acc = carry
        kblk = k_ref[0, 0, pl.ds(c * tc, tc)].astype(qdt)
        vblk = v_ref[0, 0, pl.ds(c * tc, tc)]
        s_ = jax.lax.dot_general(
            q, kblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1) + c * tc
        is_hist = cols < hist_len
        rel = cols - hist_len
        # pure i1 logic — a select between BOOLEAN branches lowers to an
        # i8->i1 trunci that current Mosaic rejects
        ok = (is_hist & (cols < kv_valid)) | (
            (~is_hist) & (rel <= rows_rel) & (rel < new_len)
        )
        s_ = jnp.where(ok, s_, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s_, axis=-1, keepdims=True))
        p = jnp.exp(s_ - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return m_new, l, acc

    ts_, d = q.shape
    init = (
        jnp.full((ts_, 1), NEG_INF, jnp.float32),
        jnp.zeros((ts_, 1), jnp.float32),
        jnp.zeros((ts_, d), jnp.float32),
    )
    # needed key blocks: all valid history (< kv_valid) plus the current
    # chunk up to this q tile's diagonal
    hist_blocks = (jnp.minimum(kv_valid, hist_len) + tc - 1) // tc
    cur_last = (hist_len + jnp.minimum((s_idx + 1) * ts, new_len) + tc - 1) // tc
    last_needed = jnp.clip(jnp.maximum(hist_blocks, cur_last), 0, t_total // tc)
    # blocks between valid history and hist_len are masked (wasted work
    # only when the page table is much longer than the sequence)
    m, l, acc = jax.lax.fori_loop(0, last_needed, body, init)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hist_len", "block_q", "block_k", "interpret"))
def flash_paged_prefill(
    q: jax.Array,  # [B, S, NH, D] current chunk queries
    k_full: jax.Array,  # [B, Tt, KV, D]  history(hist_len) ++ current(S) ++ pad
    v_full: jax.Array,
    kv_valid,  # [B] int (or scalar): valid history length per row
    new_len,  # [B] int (or scalar): real tokens in each row's chunk
    *,
    hist_len: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Online-softmax attention for chunked-prefill rows over a gathered
    paged history — never materializes the [B, S, T] scores the jnp
    oracle builds (which OOMs outright for batched 4K-prompt rounds)."""
    B, S, NH, D = q.shape
    Tt, KV = k_full.shape[1], k_full.shape[2]
    G = NH // KV
    scale = 1.0 / np.sqrt(D)
    ts = min(block_q, S)
    tc = None
    for cand in (min(block_k, Tt), 512, 256, 128):
        if cand <= Tt and Tt % cand == 0:
            tc = cand
            break
    if tc is None or S % ts:
        raise ValueError(f"S ({S}) / Tt ({Tt}) must tile (ts={ts})")

    qt = q.transpose(0, 2, 1, 3)
    kt = k_full.transpose(0, 2, 1, 3)
    vt = v_full.transpose(0, 2, 1, 3)
    meta = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(kv_valid, jnp.int32).reshape(-1), (B,)),
        jnp.broadcast_to(jnp.asarray(new_len, jnp.int32).reshape(-1), (B,)),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NH, S // ts),
        in_specs=[
            pl.BlockSpec((1, 1, ts, D), lambda b, h, s, m: (b, h, s, 0)),
            pl.BlockSpec((1, 1, Tt, D), lambda b, h, s, m: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Tt, D), lambda b, h, s, m: (b, h // G, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ts, D), lambda b, h, s, m: (b, h, s, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_flash_kernel, ts=ts, tc=tc, t_total=Tt,
            hist_len=hist_len, scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * S * Tt * D // 2,
            bytes_accessed=(q.size + k_full.size + v_full.size) * 2,
            transcendentals=B * NH * S * Tt // 2,
        ),
        interpret=interpret,
    )(meta, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Paged flash DECODE: in-kernel page-table gather over the layer-major pool
# ---------------------------------------------------------------------------


def _paged_decode_kernel(
    pt_ref, lens_ref, lay_ref,  # scalar prefetch
    q_ref, *rest,
    pp, mp, n_kv, g_heads, scale,
):
    """One decode query per slot, attention over that slot's pages read
    STRAIGHT from the layer-major main pool (no XLA gather materializing
    [B, MP, ps, KVD] to HBM first — the gather's extra write+read round
    trip is the dominant decode-attention traffic at serving batch).

    Grid (B, MP/pp + 1): step j < MP/pp covers pp pages (the pool is
    passed pp times with index maps selecting consecutive page-table
    entries); the last step folds in the staging page + current token
    and finalizes. Online softmax state [KV*8, *] lives in VMEM scratch
    across a slot's steps (grid is row-major, slot-major).
    """
    kp_refs = rest[:pp]
    vp_refs = rest[pp : 2 * pp]
    ks_ref, vs_ref, kc_ref, vc_ref, o_ref, m_s, l_s, acc_s = rest[2 * pp :]
    b = pl.program_id(0)
    j = pl.program_id(1)
    jp = mp // pp  # page-group steps
    ps = kp_refs[0].shape[2]
    D = q_ref.shape[2] // 1  # lane dim of q rows
    full = lens_ref[b]  # tokens committed to main pages
    B = lens_ref.shape[0] // 2
    off = lens_ref[B + b]  # tokens in staging

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [KV*8, D]

    def _update(k_all, v_all, ok_cols):
        # k_all/v_all [T, KVD]; ok_cols [1, T] bool validity
        T = k_all.shape[0]
        scores = []
        for h in range(n_kv):
            k_h = k_all[:, h * D : (h + 1) * D]  # [T, D]
            s_ = jax.lax.dot_general(
                q[h * 8 : (h + 1) * 8, :], k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8, T]
            scores.append(s_)
        s_all = jnp.concatenate(scores, axis=0)  # [KV*8, T]
        s_all = jnp.where(ok_cols, s_all, NEG_INF)
        m_new = jnp.maximum(m_s[:], jnp.max(s_all, axis=-1, keepdims=True))
        p = jnp.exp(s_all - m_new)
        # fully-masked blocks: exp(NEG_INF - NEG_INF) = 1 would corrupt l
        p = jnp.where(ok_cols, p, 0.0)
        alpha = jnp.exp(m_s[:] - m_new)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(v_all.dtype)
        outs = []
        for h in range(n_kv):
            v_h = v_all[:, h * D : (h + 1) * D]
            o_h = jax.lax.dot_general(
                pc[h * 8 : (h + 1) * 8, :], v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8, D]
            outs.append(o_h)
        acc_s[:] = acc_s[:] * alpha + jnp.concatenate(outs, axis=0)
        m_s[:] = m_new

    @pl.when((j < jp) & (j * pp * ps < full))
    def _pages():
        k_all = jnp.concatenate([r[0, 0] for r in kp_refs], axis=0)  # [pp*ps, KVD]
        v_all = jnp.concatenate([r[0, 0] for r in vp_refs], axis=0)
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (1, pp * ps), 1) + j * pp * ps
        )
        _update(k_all, v_all, cols < full)

    @pl.when(j == jp)
    def _tail():
        ks = ks_ref[0]  # [ps, KVD] staging tokens (layer pre-sliced)
        vs = vs_ref[0]
        kc = kc_ref[0]  # [8, KVD] row 0 = current token
        vc = vc_ref[0]
        k_all = jnp.concatenate([ks, kc], axis=0)  # [ps+8, KVD]
        v_all = jnp.concatenate([vs, vc], axis=0)
        t = jax.lax.broadcasted_iota(jnp.int32, (1, ps + 8), 1)
        ok = (t < off) | (t == ps)  # staging prefix + the current token
        _update(k_all, v_all, ok)
        o_ref[0] = (acc_s[:] / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pages_per_step", "interpret")
)
def flash_paged_decode(
    q: jax.Array,  # [B, NH, D] roped decode queries
    k_cur: jax.Array,  # [B, KV, D] roped current-token keys
    v_cur: jax.Array,  # [B, KV, D]
    main: jax.Array,  # [P, 2Lp, ps, KVD] layer-major main pool
    staging_b: jax.Array,  # [B, ps, 2Lp, KVD] this batch's staging pages
    layer,  # int32 scalar
    page_table: jax.Array,  # [B, MP] int32
    seq_lens: jax.Array,  # [B] int32 history BEFORE this token
    *,
    pages_per_step: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Decode-step paged GQA attention with the page gather INSIDE the
    kernel: block index maps read scalar-prefetched page-table entries,
    so each page moves HBM->VMEM exactly once (the XLA-gather path
    writes the gathered [B, MP, ps, KVD] copy back to HBM and re-reads
    it in the attention einsum). Returns [B, NH, D]."""
    B, NH, D = q.shape
    KV = k_cur.shape[1]
    G = NH // KV
    assert G <= 8, "query-head group must pack into 8 sublanes"
    P, two_lp, ps, KVD = main.shape
    LP = two_lp // 2
    MP = page_table.shape[1]
    pp = pages_per_step
    while MP % pp:
        pp //= 2
    scale = 1.0 / np.sqrt(D)

    # pack the G query heads of each KV head into 8 sublanes
    qp = jnp.pad(
        q.reshape(B, KV, G, D), ((0, 0), (0, 0), (0, 8 - G), (0, 0))
    ).reshape(B, KV * 8, D)
    kc = jnp.pad(k_cur.reshape(B, 1, KVD), ((0, 0), (0, 7), (0, 0)))
    vc = jnp.pad(v_cur.reshape(B, 1, KVD), ((0, 0), (0, 7), (0, 0)))

    pt_flat = page_table.reshape(-1).astype(jnp.int32)
    full = ((seq_lens // ps) * ps).astype(jnp.int32)
    off = (seq_lens - full).astype(jnp.int32)
    lens = jnp.concatenate([full, off])
    lay = jnp.asarray(layer, jnp.int32).reshape(1)

    # Slice this layer's staging rows OUTSIDE the kernel: a [B, ps, KVD]
    # dynamic slice is ~kilobytes and legal XLA; blocking the layer dim
    # inside the kernel is an illegal Mosaic block shape (second-minor
    # block 1 over a 2Lp-sized dim) and the gather saved nothing — the
    # page pool is where the traffic is.
    lay_i = jnp.asarray(layer, jnp.int32)
    k_stage = jax.lax.dynamic_index_in_dim(staging_b, lay_i, axis=2, keepdims=False)
    v_stage = jax.lax.dynamic_index_in_dim(staging_b, LP + lay_i, axis=2, keepdims=False)

    def _kpage(i):
        def idx(b, j, pt, lens, lay):
            e = jnp.clip(j * pp + i, 0, MP - 1)
            return (pt[b * MP + e], lay[0], 0, 0)
        return pl.BlockSpec((1, 1, ps, KVD), idx)

    def _vpage(i):
        def idx(b, j, pt, lens, lay):
            e = jnp.clip(j * pp + i, 0, MP - 1)
            return (pt[b * MP + e], LP + lay[0], 0, 0)
        return pl.BlockSpec((1, 1, ps, KVD), idx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, MP // pp + 1),
        in_specs=[
            pl.BlockSpec((1, KV * 8, D), lambda b, j, pt, lens, lay: (b, 0, 0)),
        ]
        + [_kpage(i) for i in range(pp)]
        + [_vpage(i) for i in range(pp)]
        + [
            pl.BlockSpec((1, ps, KVD), lambda b, j, pt, lens, lay: (b, 0, 0)),
            pl.BlockSpec((1, ps, KVD), lambda b, j, pt, lens, lay: (b, 0, 0)),
            pl.BlockSpec((1, 8, KVD), lambda b, j, pt, lens, lay: (b, 0, 0)),
            pl.BlockSpec((1, 8, KVD), lambda b, j, pt, lens, lay: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, KV * 8, D), lambda b, j, pt, lens, lay: (b, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((KV * 8, 1), jnp.float32),
            pltpu.VMEM((KV * 8, 1), jnp.float32),
            pltpu.VMEM((KV * 8, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_decode_kernel, pp=pp, mp=MP, n_kv=KV, g_heads=G,
            scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV * 8, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * (MP * ps + ps + 1) * D,
            bytes_accessed=2 * B * MP * ps * KVD * 2 + B * ps * KVD * 4,
            transcendentals=B * NH * (MP * ps + ps + 8),
        ),
        interpret=interpret,
    )(pt_flat, lens, lay, qp, *([main] * pp), *([main] * pp),
      k_stage, v_stage, kc, vc)
    return out.reshape(B, KV, 8, D)[:, :, :G].reshape(B, NH, D)
