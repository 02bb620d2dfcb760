"""Ternary (1.58-bit) weight quantization core — TPU-native layout.

The reference engine keeps two *incompatible* CPU pack layouts (an AVX
"blocked" layout, reference cache/bitnet_converter.py:26-92, and an
interleaved one, reference kernels/native.py:181-215); the drift between
them caused its historical gibberish bug (reference tests/test_bitnet_core.py:1-12).
We define exactly ONE layout here, chosen for TPU lane tiling:

wf-tpu packed format v1 ("plane-major K"):
    A ternary weight matrix W[in=K, out=N] (stored K-major, i.e. already
    transposed for `x @ W`) with values in {-1, 0, +1} is encoded as
    uint8 ``qweight[K//4, N]``:

        qweight[r, n] bits (2j, 2j+1)  <->  W[j*(K//4) + r, n] + 1

    i.e. the K axis is split into 4 contiguous *planes*; byte row r holds
    one 2-bit value from each plane. A fused kernel therefore never
    reshuffles lanes: it computes 4 independent MXU dots

        acc = sum_j  x[:, j*K4 + r] . ((qweight >> 2j) & 3 - 1)

    and adds them — no cross-lane interleave, unlike both CPU layouts.

Scale semantics follow HuggingFace's BitLinear exactly
(transformers.integrations.bitnet.BitLinear.forward):

    x_q, s_x = activation_quant(x)         # per-token int8, s_x = 127/absmax
    y = (x_q @ W_ternary) / (s_x * weight_scale)

`weight_scale` DIVIDES (it is the HF-stored scalar, e.g. ~ 1/mean|w|).
The reference's encoded-{0,1,2} kernel + activation-sum correction hack
(reference scripts/direct_inference_full.py:186-208) is intentionally NOT
replicated — we compute signed ternary directly; a cross-check of that
formula lives in tests/test_ternary.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_ternary",
    "unpack_ternary",
    "pack_ternary_np",
    "unpack_ternary_np",
    "unpack_hf_packed",
    "hf_packed_to_wf",
    "quantize_weights_ternary",
    "quantize_activations",
    "ternary_matmul_reference",
    "ternary_linear",
    "make_xla_linear_stacked",
]


# ---------------------------------------------------------------------------
# Packing / unpacking (numpy versions for converters, jnp for on-device)
# ---------------------------------------------------------------------------


def pack_ternary_np(w_kn: np.ndarray) -> np.ndarray:
    """Pack ternary weights (K-major ``[K, N]``, values in {-1,0,+1}) to
    uint8 ``[K//4, N]`` in wf-tpu plane-major layout."""
    k, n = w_kn.shape
    if k % 4 != 0:
        raise ValueError(f"K ({k}) must be divisible by 4")
    if np.issubdtype(w_kn.dtype, np.integer):
        enc = (w_kn.astype(np.int8, copy=False) + 1).astype(np.uint8)
    else:
        enc = (
            np.rint(np.asarray(w_kn, dtype=np.float32)).clip(-1, 1).astype(np.int32) + 1
        ).astype(np.uint8)
    planes = enc.reshape(4, k // 4, n)
    # ascontiguousarray matters: packing a transposed view yields an
    # F-ordered result, and safetensors 0.8 serializes the raw buffer
    # without honoring strides — silently corrupting saved caches.
    return np.ascontiguousarray(
        (planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)).astype(
            np.uint8
        )
    )


def unpack_ternary_np(qweight: np.ndarray) -> np.ndarray:
    """Unpack wf-tpu uint8 ``[K//4, N]`` to int8 ternary ``[K, N]``."""
    q = np.asarray(qweight)
    planes = [((q >> (2 * j)) & 3).astype(np.int8) - 1 for j in range(4)]
    return np.concatenate(planes, axis=0)


def pack_i2s_np(w_nk: np.ndarray) -> np.ndarray:
    """Pack ternary ``[N, K]`` (llama.cpp row-major [out, in], values in
    {-1,0,+1}) into BitNet.cpp/llama.cpp **i2_s** bytes ``[N, K//4]``.

    The i2_s byte layout (documented by the reference's quantizer,
    reference sglang_backend/bitnet_quantization.py:96-109): byte ``c``
    packs input columns ``4c..4c+3`` encoded as ``w+1`` in {0,1,2}, with
    column ``4c+i`` at bit shift ``6-2i`` (first column in the TOP bits).
    This is the wire format BitNet.cpp artifacts use — distinct from the
    wf-tpu plane-major kernel layout (:func:`pack_ternary_np`).
    """
    n, k = w_nk.shape
    if k % 4 != 0:
        raise ValueError(f"K ({k}) must be divisible by 4")
    enc = (np.asarray(w_nk).astype(np.int8, copy=False) + 1).astype(np.uint8)
    b = enc.reshape(n, k // 4, 4)
    return np.ascontiguousarray(
        (b[..., 0] << 6) | (b[..., 1] << 4) | (b[..., 2] << 2) | b[..., 3]
    )


def unpack_i2s_np(qbytes: np.ndarray) -> np.ndarray:
    """Unpack i2_s bytes ``[N, K//4]`` to int8 ternary ``[N, K]``
    (inverse of :func:`pack_i2s_np`)."""
    q = np.asarray(qbytes)
    n, k4 = q.shape
    cols = np.stack(
        [((q >> s) & 3).astype(np.int8) - 1 for s in (6, 4, 2, 0)], axis=-1
    )
    return cols.reshape(n, 4 * k4)


def pack_ternary(w_kn: jax.Array) -> jax.Array:
    """jnp version of :func:`pack_ternary_np` (traceable, runs on device)."""
    k, n = w_kn.shape
    if k % 4 != 0:
        raise ValueError(f"K ({k}) must be divisible by 4")
    enc = (jnp.clip(jnp.rint(w_kn.astype(jnp.float32)), -1, 1).astype(jnp.int32) + 1).astype(
        jnp.uint8
    )
    planes = enc.reshape(4, k // 4, n)
    return planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)


def unpack_ternary(qweight: jax.Array) -> jax.Array:
    """jnp unpack: uint8 ``[K//4, N]`` -> int8 ternary ``[K, N]``."""
    planes = [
        ((qweight >> (2 * j)) & 3).astype(jnp.int8) - 1 for j in range(4)
    ]
    return jnp.concatenate(planes, axis=0)


# ---------------------------------------------------------------------------
# HF checkpoint format interop
# ---------------------------------------------------------------------------


def unpack_hf_packed(hf_packed: np.ndarray) -> np.ndarray:
    """Unpack HuggingFace BitNet packed weights to ternary.

    HF stores ``uint8 [out//4, in]`` with the OUT axis split into 4 planes:
    bits (2i, 2i+1) of packed row r give ternary row ``i*(out//4) + r``
    (transformers.integrations.bitnet.unpack_weights; same semantics as
    reference tests/test_bitnet_core.py:21-53). Returns int8 ``[out, in]``.
    """
    q = np.asarray(hf_packed)
    planes = [((q >> (2 * i)) & 3).astype(np.int8) - 1 for i in range(4)]
    return np.concatenate(planes, axis=0)


def hf_packed_to_wf(hf_packed: np.ndarray) -> np.ndarray:
    """HF ``uint8 [out//4, in]`` -> wf-tpu ``uint8 [in//4, out]``.

    Both layouts are plane-major, just along different axes, so the repack
    is a transpose + bit regroup (all vectorized; the reference's repack
    loops byte-by-byte, reference cache/bitnet_converter.py:63-71).
    """
    w_nk = unpack_hf_packed(hf_packed)  # [out, in] int8
    return pack_ternary_np(w_nk.T)  # [in//4, out]


def quantize_weights_ternary(w: np.ndarray) -> Tuple[np.ndarray, float]:
    """'Naive' FP weight -> ternary conversion (WrinkleFree converter).

    w_ternary = round(clip(w / mean|w|, -1, 1)); returns HF-semantics
    weight_scale = 1/mean|w| so that ``W_ternary / weight_scale ~= w``.
    (Analog of reference legacy/benchmark/naive_converter.py and HF
    WeightQuant: scale = 1/mean|w|, w_q = round(w*scale).clip(-1,1).)
    """
    w = np.asarray(w, dtype=np.float32)
    scale = 1.0 / max(float(np.mean(np.abs(w))), 1e-5)
    ternary = np.rint(w * scale).clip(-1, 1)
    return ternary.astype(np.int8), float(scale)


# ---------------------------------------------------------------------------
# Activation quantization + reference matmul (the oracle for Pallas kernels)
# ---------------------------------------------------------------------------


def quantize_activations(
    x: jax.Array, hf_exact: bool = False, quant_axis: str | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-token int8 activation quantization.

    ``scale = 127 / clamp(absmax, 1e-5)``; returns (int8 values, scale with
    shape ``x.shape[:-1] + (1,)``). Matches HF BitLinear.activation_quant.
    With ``hf_exact=True`` the scale/multiply run in x.dtype (bf16) to
    reproduce HF rounding bit-for-bit; default computes them in float32.

    ``quant_axis``: mesh axis name to pmax the absmax over — required for
    row-parallel (TP) linears where each device sees only a slice of the
    feature axis but the quantization scale must be the global per-token one.
    """
    dt = x.dtype if hf_exact else jnp.float32
    xf = x.astype(dt)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if quant_axis is not None:
        absmax = jax.lax.pmax(absmax, quant_axis)
    absmax = jnp.clip(absmax, 1e-5, None)
    scale = (jnp.asarray(127.0, dt) / absmax).astype(dt)
    q = jnp.clip(jnp.round(xf * scale), -128, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def ternary_matmul_reference(
    x_q: jax.Array, qweight: jax.Array, *, preferred_int: jnp.dtype = jnp.int32
) -> jax.Array:
    """Oracle: int8 activations ``[..., K]`` x packed ``[K//4, N]`` -> int32.

    Pure jnp (XLA), exact integer math. Every Pallas ternary kernel must
    match this bit-for-bit (analog of reference bitnet_gemv_reference,
    tests/test_bitnet_core.py:149-166 — but in signed ternary, no
    activation-sum correction needed).
    """
    w = unpack_ternary(qweight)  # [K, N] int8
    return jax.lax.dot_general(
        x_q,
        w,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=preferred_int,
    )


def ternary_linear(
    x: jax.Array,
    qweight: jax.Array,
    weight_scale: jax.Array,
    *,
    out_dtype: jnp.dtype = jnp.bfloat16,
    hf_exact: bool = False,
    kernel=None,
    quant_axis: str | None = None,
) -> jax.Array:
    """Full BitLinear: quantize activations, integer matmul, rescale.

    y = (x_q @ W_ternary) / (act_scale * weight_scale)   [HF semantics]

    ``kernel`` optionally overrides the integer matmul with a fused Pallas
    implementation taking ``(x_q, qweight) -> int32``.
    """
    x_q, act_scale = quantize_activations(x, hf_exact=hf_exact, quant_axis=quant_axis)
    matmul = kernel if kernel is not None else ternary_matmul_reference
    acc = matmul(x_q, qweight)
    if hf_exact:
        # HF casts the (exact-integer) fp32 accumulation to bf16, then
        # divides by bf16 scales — emulate that rounding exactly.
        y = acc.astype(out_dtype)
        denom = (act_scale.astype(out_dtype) * weight_scale.astype(out_dtype)).astype(out_dtype)
        return (y / denom).astype(out_dtype)
    inv = 1.0 / (act_scale * weight_scale.astype(jnp.float32))
    return (acc.astype(jnp.float32) * inv).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def ternary_linear_jit(x, qweight, weight_scale, out_dtype=jnp.bfloat16):
    return ternary_linear(x, qweight, weight_scale, out_dtype=out_dtype)


def make_xla_linear_stacked():
    """Stacked-weights XLA linear_fn — drop-in for the Pallas stacked fn
    (same (x, qw_stack [L,K4,N], scale_stack, layer, ...) signature,
    `.stacked = True`). Slices the stack at `layer` and runs the
    XLA-fused unpack+int8-dot oracle path; the per-layer slice copy is
    amortized over prefill-sized row counts, which is the intended use:
    prefill programs where the MXU-bound GEMM shape may favor XLA over
    the GEMV-oriented Pallas kernels (EngineConfig.prefill_linear)."""

    def linear_fn(x, qw_stack, scale_stack, layer, out_dtype=jnp.bfloat16,
                  quant_axis=None):
        qw = jax.lax.dynamic_index_in_dim(qw_stack, layer, 0, keepdims=False)
        sc = jax.lax.dynamic_index_in_dim(
            scale_stack, layer, 0, keepdims=False
        )
        if sc.ndim == 2:
            # fused per-column scale rows [8, N] (models.fuse_projections)
            sc = sc[0]
        return ternary_linear(
            x, qw, sc, out_dtype=out_dtype, quant_axis=quant_axis
        )

    linear_fn.stacked = True
    return linear_fn
