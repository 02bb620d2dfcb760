"""Paged KV cache in HBM + the paged model forward.

Page-table spec follows the reference's C++ paged cache (reference
tests/test_kv_cache_cpp.py:21-146: storage [pages, ...], free-list
allocation, gather by page/slot indices) re-laid-out for TPU:

    k_pool, v_pool : [L, P, page_size, KV, D]   (optionally quantized)
    page_table     : [num_slots, max_pages]  int32 (page ids; 0 = trash)
    seq_lens       : [num_slots]             int32

Page 0 is a reserved TRASH page: inactive slots and bucket padding write
into it, so the jitted step never branches on slot liveness. One
`paged_forward` covers chunked prefill (S = chunk) and batched decode
(S = 1); everything is static-shaped for XLA.

This jnp gather implementation is the correctness oracle; the Pallas
flash-decode kernel (ops/flash_decode.py) reads pages from HBM directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig
from ..models.bitnet import LinearFn, default_linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin
from .quantized import KV_DTYPES, dequantize_kv, needs_scale, quantize_kv


class PagedKV(NamedTuple):
    k: jax.Array  # [L, P, ps, KV, D]
    v: jax.Array
    k_scale: Optional[jax.Array] = None  # [L, P, ps, KV, 1] (quantized modes)
    v_scale: Optional[jax.Array] = None

    @classmethod
    def zeros(
        cls,
        cfg: BitNetConfig,
        num_pages: int,
        page_size: int,
        kv_dtype: str = "bf16",
    ) -> "PagedKV":
        shape = (cfg.num_layers, num_pages, page_size, cfg.num_kv_heads, cfg.head_dim)
        dt = KV_DTYPES[kv_dtype]
        k = jnp.zeros(shape, dt)
        v = jnp.zeros(shape, dt)
        if needs_scale(kv_dtype):
            s = jnp.ones(shape[:-1] + (1,), jnp.float32)
            return cls(k, v, s, s)
        return cls(k, v, None, None)

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def kv_dtype_name(self) -> str:
        for name, dt in KV_DTYPES.items():
            if dt == self.k.dtype:
                return name
        raise ValueError(self.k.dtype)


def _write_tokens(pool_l, scale_l, new, page_ids, offsets, kv_dtype):
    """Scatter new [B,S,KV,D] into pool_l [P,ps,KV,D] at (page_ids, offsets)
    [B,S]. Returns updated (pool_l, scale_l)."""
    q, s = quantize_kv(new, kv_dtype)
    pool_l = pool_l.at[page_ids, offsets].set(q)
    if scale_l is not None:
        scale_l = scale_l.at[page_ids, offsets].set(s)
    return pool_l, scale_l


def _paged_attention_jnp(
    q, pool_k, pool_v, sk, sv, page_table, q_pos, kv_len, cfg: BitNetConfig
):
    """Gather-based paged GQA attention (oracle path).

    q [B,S,NH,D]; pools [P,ps,KV,D]; page_table [B,MP]; q_pos [B,S];
    kv_len [B] = total valid tokens (including the S just written).
    """
    B, S, NH, D = q.shape
    ps = pool_k.shape[1]
    MP = page_table.shape[1]
    KV = pool_k.shape[2]
    G = NH // KV
    T = MP * ps

    k = dequantize_kv(pool_k[page_table], sk[page_table] if sk is not None else None)
    v = dequantize_kv(pool_v[page_table], sv[page_table] if sv is not None else None)
    k = k.reshape(B, T, KV, D)
    v = v.reshape(B, T, KV, D)

    scale = 1.0 / np.sqrt(D)
    qg = q.reshape(B, S, KV, G, D)
    scores = (
        jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
        * scale
    )
    key_idx = jnp.arange(T)[None, None, None, None, :]
    mask = key_idx <= q_pos[:, None, None, :, None]
    mask &= key_idx < kv_len[:, None, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(B, S, NH, D)


def paged_forward(
    params,
    cfg: BitNetConfig,
    tokens: jax.Array,  # [B, S] int32 (padded; padding positions >= seq_len+real_S)
    pools: PagedKV,
    page_table: jax.Array,  # [B, MP] int32
    seq_lens: jax.Array,  # [B] int32 tokens already cached (before this call)
    new_lens: jax.Array,  # [B] int32 how many of the S tokens are real
    *,
    linear_fn: Optional[LinearFn] = None,
    attention_fn=None,
) -> Tuple[jax.Array, PagedKV]:
    """Run S new tokens per slot against the paged cache.

    Returns (last-real-token logits [B, V] float32, updated pools).
    Covers batched decode (S=1, new_lens=1) and chunked prefill
    (B=1..n, S=bucket, new_lens=true chunk length).
    """
    lf = linear_fn or default_linear
    attn_impl = attention_fn or _paged_attention_jnp
    B, S = tokens.shape
    ps = pools.page_size
    kv_dtype = pools.kv_dtype_name
    dtype = cfg.dtype

    embed = params["embed"]
    hidden = embed[tokens].astype(dtype)

    positions = seq_lens[:, None] + jnp.arange(S)[None, :]  # [B,S]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, dtype)

    # page/offset for each new token; padding beyond the allocated range
    # must land in the trash page (page_table stores 0 there already).
    page_slot = positions // ps  # [B,S] logical page index
    in_range = page_slot < page_table.shape[1]
    page_ids = jnp.where(
        in_range,
        jnp.take_along_axis(
            page_table, jnp.clip(page_slot, 0, page_table.shape[1] - 1), axis=1
        ),
        0,
    )
    offsets = positions % ps
    kv_len = seq_lens + new_lens

    def layer_step(h, xs):
        lp, pk, pv, sk, sv = xs
        normed = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)

        q = lf(normed, lp["q_qw"], lp["q_scale"]).reshape(B, S, -1, cfg.head_dim)
        k = lf(normed, lp["k_qw"], lp["k_scale"]).reshape(B, S, -1, cfg.head_dim)
        v = lf(normed, lp["v_qw"], lp["v_scale"]).reshape(B, S, -1, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)

        pk, sk = _write_tokens(pk, sk, k, page_ids, offsets, kv_dtype)
        pv, sv = _write_tokens(pv, sv, v, page_ids, offsets, kv_dtype)

        attn = attn_impl(q, pk, pv, sk, sv, page_table, positions, kv_len, cfg)
        attn = attn.reshape(B, S, -1)
        attn = rms_norm(attn, lp["attn_sub"], cfg.rms_norm_eps)
        h = h + lf(attn, lp["o_qw"], lp["o_scale"])

        normed = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        gate = lf(normed, lp["gate_qw"], lp["gate_scale"])
        up = lf(normed, lp["up_qw"], lp["up_scale"])
        act = jnp.square(jax.nn.relu(gate)) * up
        act = rms_norm(act, lp["ffn_sub"], cfg.rms_norm_eps)
        h = h + lf(act, lp["down_qw"], lp["down_scale"])
        return h, (pk, pv, sk, sv)

    xs = (params["layers"], pools.k, pools.v, pools.k_scale, pools.v_scale)
    hidden, (nk, nv, nsk, nsv) = jax.lax.scan(layer_step, hidden, xs)

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    # last REAL token per slot
    last_idx = jnp.clip(new_lens - 1, 0, S - 1)
    hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]

    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jax.lax.dot_general(
        hidden, head,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return logits, PagedKV(nk, nv, nsk, nsv)
