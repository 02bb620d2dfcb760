"""Rotary position embeddings, HF rotate-half (non-interleaved) convention.

cos/sin are computed in float32 (HF BitNetRotaryEmbedding forces fp32) and
applied in the activation dtype. theta defaults to 5e5 (BitNet 2B,
reference scripts/direct_inference_full.py:31-70).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float, dtype=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array]:
    """positions [...,] int -> (cos, sin) each [..., head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """q [..., S, NH, D], k [..., S, NK, D]; cos/sin [..., S, D]."""
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos + _rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
