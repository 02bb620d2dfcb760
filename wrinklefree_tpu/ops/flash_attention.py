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
