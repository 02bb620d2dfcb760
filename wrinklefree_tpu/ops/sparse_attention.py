"""Attention sparsity — functional JAX implementation.

TPU-native analog of the reference's sparse-attention module
(reference src/wrinklefree_inference/sglang_backend/sparse_attention.py:30-303):
long-context attention cost reduction via

- TOP_K:      keep the k largest post-softmax weights per query, renormalize.
- THRESHOLD:  zero weights below a probability floor, renormalize.
- WINDOW:     Longformer-style local window + global tokens + strided keys,
              applied PRE-softmax as an additive mask (O(n*w) useful work).
- DYNAMIC:    entropy-adaptive top-k — peaked rows keep few keys, diffuse
              rows keep many (reference sparse_attention.py:211-259;
              53% sparsity at 0.990 cos-sim, docs/research/notebook.md:843-852).

All policies are static-shape / jit-friendly: DYNAMIC computes a per-row
keep-count and masks by magnitude rank instead of materializing ragged key
sets. Every function operates on the LAST axis (keys) of an arbitrarily
batched array, so they compose with any attention layout.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class AttentionSparsityMode(str, enum.Enum):
    NONE = "none"
    TOP_K = "top_k"
    THRESHOLD = "threshold"
    WINDOW = "window"
    DYNAMIC = "dynamic"


@dataclasses.dataclass(frozen=True)
class AttentionSparsityConfig:
    """Static attention-sparsity policy (reference sparse_attention.py:39-80).

    top_k: keys kept per query (TOP_K mode).
    threshold: post-softmax probability floor (THRESHOLD mode).
    window_size / global_tokens / stride: WINDOW mode geometry — keep keys
        within `window_size` of the query, the first `global_tokens` keys,
        and every `stride`-th key (stride=0 disables striding).
    min_keep_frac / max_keep_frac: DYNAMIC mode entropy->keep mapping range.
    """

    mode: AttentionSparsityMode = AttentionSparsityMode.NONE
    top_k: int = 64
    threshold: float = 1e-3
    window_size: int = 256
    global_tokens: int = 1
    stride: int = 64
    min_keep_frac: float = 0.1
    max_keep_frac: float = 0.5


def create_window_mask(
    q_pos: jax.Array,  # [...] absolute query positions (int)
    num_keys: int,
    window_size: int,
    global_tokens: int = 1,
    stride: int = 0,
) -> jax.Array:
    """Boolean [..., num_keys] mask: True = key visible.

    Key index == absolute position (contiguous cache). Combines causality
    with the window/global/stride pattern of the reference
    (sparse_attention.py:83-119).
    """
    key_idx = jnp.arange(num_keys)
    shape = (1,) * q_pos.ndim + (num_keys,)
    key_idx = key_idx.reshape(shape)
    qp = q_pos[..., None]
    causal = key_idx <= qp
    in_window = key_idx >= (qp - (window_size - 1))
    is_global = key_idx < global_tokens
    keep = in_window | is_global
    if stride and stride > 0:
        keep = keep | (key_idx % stride == 0)
    return causal & keep


def apply_top_k_attention(probs: jax.Array, k: int) -> jax.Array:
    """Keep the k largest weights per query (last axis), renormalize."""
    n = probs.shape[-1]
    if k >= n:
        return probs
    pf = probs.astype(jnp.float32)
    kth = jax.lax.top_k(pf, k)[0][..., -1:]
    kept = jnp.where(pf >= kth, pf, 0.0)
    total = jnp.sum(kept, axis=-1, keepdims=True)
    return (kept / jnp.maximum(total, 1e-9)).astype(probs.dtype)


def apply_threshold_attention(probs: jax.Array, threshold: float) -> jax.Array:
    """Zero weights below the probability floor, renormalize.

    The max weight per row is always kept so a row can never become
    all-zero (same safeguard as the reference, sparse_attention.py:160-186).
    """
    pf = probs.astype(jnp.float32)
    row_max = jnp.max(pf, axis=-1, keepdims=True)
    kept = jnp.where((pf >= threshold) | (pf >= row_max), pf, 0.0)
    total = jnp.sum(kept, axis=-1, keepdims=True)
    return (kept / jnp.maximum(total, 1e-9)).astype(probs.dtype)


def apply_dynamic_attention(
    probs: jax.Array,
    min_keep_frac: float = 0.1,
    max_keep_frac: float = 0.5,
) -> jax.Array:
    """Entropy-adaptive top-k, static shapes.

    Per row: normalized entropy e in [0,1] maps linearly to a keep
    fraction in [min, max]; keys are kept by probability RANK so the
    per-row k varies while every array stays fixed-shape.
    """
    n = probs.shape[-1]
    pf = probs.astype(jnp.float32)
    p_safe = jnp.maximum(pf, 1e-12)
    ent = -jnp.sum(pf * jnp.log(p_safe), axis=-1, keepdims=True)
    ent_norm = ent / jnp.log(float(n))  # [.. ,1] in [0,1]
    keep_frac = min_keep_frac + (max_keep_frac - min_keep_frac) * ent_norm
    keep_k = jnp.clip(jnp.round(keep_frac * n), 1, n)  # [..,1] float

    # rank 0 = largest probability
    order = jnp.argsort(pf, axis=-1, descending=True)
    ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)
    kept = jnp.where(ranks < keep_k, pf, 0.0)
    total = jnp.sum(kept, axis=-1, keepdims=True)
    return (kept / jnp.maximum(total, 1e-9)).astype(probs.dtype)


def apply_attention_sparsity(
    probs: jax.Array, cfg: AttentionSparsityConfig
) -> jax.Array:
    """Post-softmax dispatcher (reference sparse_attention.py:262-303).
    WINDOW mode is pre-softmax — use `create_window_mask` on the scores."""
    mode = AttentionSparsityMode(cfg.mode)
    if mode in (AttentionSparsityMode.NONE, AttentionSparsityMode.WINDOW):
        return probs
    if mode == AttentionSparsityMode.TOP_K:
        return apply_top_k_attention(probs, cfg.top_k)
    if mode == AttentionSparsityMode.THRESHOLD:
        return apply_threshold_attention(probs, cfg.threshold)
    if mode == AttentionSparsityMode.DYNAMIC:
        return apply_dynamic_attention(probs, cfg.min_keep_frac, cfg.max_keep_frac)
    raise ValueError(f"unknown attention sparsity mode: {cfg.mode}")


def attention_sparsity_ratio(probs: jax.Array) -> jax.Array:
    """Fraction of zeroed attention weights."""
    return jnp.mean((probs == 0).astype(jnp.float32))
