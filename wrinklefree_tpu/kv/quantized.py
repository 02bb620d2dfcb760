"""KV-cache quantization: BF16 / FP16 / FP32 / FP8(e4m3, e5m2) / INT8.

Same dtype menu as the reference (reference kv_cache/kv_cache.py:30-37),
re-designed for per-(token, head) symmetric scales so dequantization is a
cheap broadcast multiply inside the attention gather. Reference quality
bar: cosine >= 0.998 at INT8/FP8 with 50% memory (notebook.md:690-709).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

KV_DTYPES = {
    "f32": jnp.float32,
    "fp16": jnp.float16,
    "bf16": jnp.bfloat16,
    "int8": jnp.int8,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}

_FP8_MAX = {"fp8_e4m3": 448.0, "fp8_e5m2": 57344.0}


def needs_scale(kv_dtype: str) -> bool:
    return kv_dtype in ("int8", "fp8_e4m3", "fp8_e5m2")


def quantize_kv(x: jax.Array, kv_dtype: str) -> Tuple[jax.Array, jax.Array | None]:
    """x [..., D] -> (stored values, scale [..., 1] or None).

    Symmetric per-vector (token x head) absmax scaling; INT8 rounds to
    [-127, 127], FP8 scales into the format's dynamic range.
    """
    dt = KV_DTYPES[kv_dtype]
    if not needs_scale(kv_dtype):
        return x.astype(dt), None
    absmax = jnp.clip(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-6, None
    )
    if kv_dtype == "int8":
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(dt)
    else:
        scale = absmax / _FP8_MAX[kv_dtype]
        q = (x.astype(jnp.float32) / scale).astype(dt)
    return q, scale.astype(jnp.float32)


def dequantize_kv(
    q: jax.Array, scale: jax.Array | None, out_dtype=jnp.bfloat16
) -> jax.Array:
    if scale is None:
        return q.astype(out_dtype)
    return (q.astype(jnp.float32) * scale).astype(out_dtype)
