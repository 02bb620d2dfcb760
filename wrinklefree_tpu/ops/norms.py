"""RMSNorm, numerically identical to HF LlamaRMSNorm/BitNetRMSNorm:
variance in float32, normalized value cast back to input dtype, then
scaled by the (bf16) weight. (reference direct_inference_full.py:181-184)"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * weight
