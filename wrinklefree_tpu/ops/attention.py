"""Attention reference implementations (jnp/XLA) — oracles for the Pallas
flash kernels, and the default compute path on CPU.

Semantics: GQA scaled-dot-product attention, causal, with an absolute
`q_offset` so a chunk of S query tokens can attend into T cached keys
(key index t is visible to query row s iff t <= q_offset + s).
(reference scripts/direct_inference_full.py:210-251 — SDPA with enable_gqa)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gqa_attention_reference(
    q: jax.Array,  # [B, S, NH, D]
    k: jax.Array,  # [B, T, KV, D]
    v: jax.Array,  # [B, T, KV, D]
    q_offset: jax.Array | int = 0,  # [B] or scalar
    *,
    kv_len: jax.Array | None = None,  # [B] valid key count (defaults to visibility mask only)
) -> jax.Array:
    B, S, NH, D = q.shape
    T, KV = k.shape[1], k.shape[2]
    G = NH // KV
    scale = 1.0 / np.sqrt(D)

    q_off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    qg = q.reshape(B, S, KV, G, D)
    # precision=HIGHEST: CPU XLA otherwise computes even f32 dots through
    # reduced-precision passes, which breaks oracle comparisons. On TPU the
    # inputs are bf16 so this costs nothing.
    scores = jnp.einsum(
        "bskgd,btkd->bkgst", qg, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = scores * scale
    key_idx = jnp.arange(T)[None, None, None, None, :]
    q_pos = (q_off[:, None] + jnp.arange(S)[None, :])[:, None, None, :, None]
    mask = key_idx <= q_pos
    if kv_len is not None:
        mask &= key_idx < kv_len[:, None, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bkgst,btkd->bskgd", probs, v, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape(B, S, NH, D)
