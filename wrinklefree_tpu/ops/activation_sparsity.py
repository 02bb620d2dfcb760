"""Activation sparsity (Q-Sparse style) — functional JAX implementation.

TPU-native analog of the reference's activation-sparsity module
(reference src/wrinklefree_inference/sglang_backend/activation_sparsity.py:24-252):
per-token zeroing of low-magnitude activations before the ternary linears,
as threshold / top-k / entropy-adaptive policies.

Design differences from the reference (torch, dynamic shapes):
- Every policy is jit-friendly with STATIC shapes: top-k uses a per-row
  magnitude cutoff derived from `jax.lax.top_k`, adaptive mode derives the
  threshold from per-row statistics instead of data-dependent resizing.
- No mutable stats objects inside jit: `sparsity_ratio` is a pure function
  the caller can jit alongside the transform.

Quality points carried over from the reference's research notes
(docs/research/notebook.md:793-813): 30% sparsity keeps cosine similarity
~0.992 (the "inference-safe" preset); 60% (the Q-Sparse paper point)
requires QAT and is exposed but off by default.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp


class SparsityMode(str, enum.Enum):
    NONE = "none"
    THRESHOLD = "threshold"
    TOP_K = "top_k"
    ADAPTIVE = "adaptive"


@dataclasses.dataclass(frozen=True)
class ActivationSparsityConfig:
    """Static (trace-time) sparsity policy.

    mode: which policy.
    threshold: absolute magnitude cutoff (THRESHOLD mode).
    sparsity_ratio: fraction of entries to ZERO per token (TOP_K mode);
        0.6 means keep the top 40% magnitudes.
    adaptive_alpha: threshold = alpha * std(|x|) per token (ADAPTIVE mode).
    min_keep: lower bound on kept entries per token (TOP_K/ADAPTIVE).
    """

    mode: SparsityMode = SparsityMode.NONE
    threshold: float = 0.1
    sparsity_ratio: float = 0.3
    adaptive_alpha: float = 1.0
    min_keep: int = 8

    @classmethod
    def qsparse(cls) -> "ActivationSparsityConfig":
        """Q-Sparse paper point: 60% sparsity (needs QAT for full quality;
        reference configs/sparsity/qsparse.yaml:1-20)."""
        return cls(mode=SparsityMode.TOP_K, sparsity_ratio=0.6)

    @classmethod
    def inference_safe(cls) -> "ActivationSparsityConfig":
        """30% sparsity, ~0.992 cos-sim without retraining
        (reference docs/research/notebook.md:793-813)."""
        return cls(mode=SparsityMode.TOP_K, sparsity_ratio=0.3)


def apply_threshold_sparsity(x: jax.Array, threshold: float) -> jax.Array:
    """Zero entries with |x| < threshold."""
    return jnp.where(jnp.abs(x) >= threshold, x, jnp.zeros((), x.dtype))


def apply_top_k_sparsity(
    x: jax.Array, sparsity_ratio: float, min_keep: int = 1
) -> jax.Array:
    """Keep the top-(1-ratio) magnitudes per token (last axis), zero the rest.

    Static-shape formulation: find the k-th largest |x| per row with
    `lax.top_k` and use it as an inclusive cutoff. Ties at the cutoff are
    all kept (may keep slightly more than k — the quality-safe direction).
    """
    n = x.shape[-1]
    k = max(min_keep, min(n, int(round(n * (1.0 - sparsity_ratio)))))
    if k >= n:
        return x
    mag = jnp.abs(x.astype(jnp.float32))
    kth = jax.lax.top_k(mag, k)[0][..., -1:]
    return jnp.where(mag >= kth, x, jnp.zeros((), x.dtype))


def apply_adaptive_sparsity(
    x: jax.Array, alpha: float = 1.0, min_keep: int = 1
) -> jax.Array:
    """Per-token statistical threshold: zero |x| < alpha * std(x).

    Rows with near-uniform magnitudes (high entropy) self-select low
    sparsity; peaked rows sparsify aggressively — the same intent as the
    reference's entropy-adaptive mode without data-dependent shapes.
    """
    xf = x.astype(jnp.float32)
    std = jnp.std(xf, axis=-1, keepdims=True)
    thresh = alpha * std
    mag = jnp.abs(xf)
    keep = mag >= thresh
    if min_keep > 1:
        # Guarantee min_keep survivors per row.
        kth = jax.lax.top_k(mag, min(min_keep, x.shape[-1]))[0][..., -1:]
        keep = keep | (mag >= kth)
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def apply_sparsity(x: jax.Array, cfg: ActivationSparsityConfig) -> jax.Array:
    """Dispatch on the (static) mode — mirrors the reference dispatcher
    (activation_sparsity.py:204-235)."""
    mode = SparsityMode(cfg.mode)
    if mode == SparsityMode.NONE:
        return x
    if mode == SparsityMode.THRESHOLD:
        return apply_threshold_sparsity(x, cfg.threshold)
    if mode == SparsityMode.TOP_K:
        return apply_top_k_sparsity(x, cfg.sparsity_ratio, cfg.min_keep)
    if mode == SparsityMode.ADAPTIVE:
        return apply_adaptive_sparsity(x, cfg.adaptive_alpha, cfg.min_keep)
    raise ValueError(f"unknown sparsity mode: {cfg.mode}")


def sparsity_ratio(x: jax.Array) -> jax.Array:
    """Fraction of exact zeros (the reference tracks this per call,
    activation_sparsity.py:51-64)."""
    return jnp.mean((x == 0).astype(jnp.float32))


def make_sparse_linear_fn(
    linear_fn, cfg: Optional[ActivationSparsityConfig]
):
    """Wrap a model `linear_fn` so every ternary linear sees sparsified
    activations (the reference hooks this inside BitNetLinearMethod,
    bitnet_quantization.py:255-425)."""
    if cfg is None or SparsityMode(cfg.mode) == SparsityMode.NONE:
        return linear_fn

    def sparse_linear(x, qweight, scale, **kw):
        return linear_fn(apply_sparsity(x, cfg), qweight, scale, **kw)

    return sparse_linear
