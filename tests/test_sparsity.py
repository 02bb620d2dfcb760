"""Activation + attention sparsity tests.

Mirrors the reference's suites (tests/test_activation_sparsity.py — per-mode
math and ≥0.80 cosine similarity at 50% sparsity; sparse-attention mask
geometry and renormalization invariants).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
from wrinklefree_tpu.ops.activation_sparsity import (
    ActivationSparsityConfig,
    SparsityMode,
    apply_adaptive_sparsity,
    apply_sparsity,
    apply_threshold_sparsity,
    apply_top_k_sparsity,
    make_sparse_linear_fn,
    sparsity_ratio,
)
from wrinklefree_tpu.ops.sparse_attention import (
    AttentionSparsityConfig,
    AttentionSparsityMode,
    apply_attention_sparsity,
    apply_dynamic_attention,
    apply_threshold_attention,
    apply_top_k_attention,
    attention_sparsity_ratio,
    create_window_mask,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestActivationSparsity:
    def test_threshold_zeroes_small(self):
        x = jnp.asarray([[0.05, -0.5, 0.2, -0.01]])
        out = apply_threshold_sparsity(x, 0.1)
        np.testing.assert_allclose(np.asarray(out), [[0.0, -0.5, 0.2, 0.0]])

    def test_top_k_keeps_largest(self):
        x = jnp.asarray([[1.0, -3.0, 0.1, 2.0, -0.2, 0.05, 4.0, -1.5]])
        out = apply_top_k_sparsity(x, sparsity_ratio=0.5, min_keep=1)
        nz = np.nonzero(np.asarray(out)[0])[0]
        assert set(nz) == {1, 3, 6, 7}  # 4 largest magnitudes

    def test_top_k_respects_min_keep(self):
        x = jnp.ones((2, 16))
        out = apply_top_k_sparsity(x, sparsity_ratio=0.99, min_keep=4)
        # ties at the cutoff are all kept; min_keep guarantees >= 4
        assert int(np.count_nonzero(np.asarray(out)[0])) >= 4

    def test_adaptive_sparsifies_peaked_rows_more(self):
        rng = np.random.default_rng(0)
        flat = jnp.asarray(rng.normal(0, 1, (1, 256)).astype(np.float32))
        peaked = flat.at[0, :8].mul(50.0)
        s_flat = float(sparsity_ratio(apply_adaptive_sparsity(flat, 1.0)))
        s_peak = float(sparsity_ratio(apply_adaptive_sparsity(peaked, 1.0)))
        assert s_peak > s_flat

    def test_dispatcher_none_is_identity(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 32)), jnp.float32)
        out = apply_sparsity(x, ActivationSparsityConfig(mode=SparsityMode.NONE))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_quality_at_50pct(self):
        """Cosine similarity >= 0.80 at 50% sparsity (reference
        tests/test_activation_sparsity.py:242-270)."""
        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.normal(0, 1, (16, 512)).astype(np.float32))
        out = apply_top_k_sparsity(x, sparsity_ratio=0.5)
        assert _cos(x, out) >= 0.80
        assert 0.45 <= float(sparsity_ratio(out)) <= 0.55

    def test_presets(self):
        assert ActivationSparsityConfig.qsparse().sparsity_ratio == 0.6
        assert ActivationSparsityConfig.inference_safe().sparsity_ratio == 0.3

    def test_sparse_linear_fn_wraps(self):
        calls = {}

        def fake_linear(x, qw, s, **kw):
            calls["x"] = x
            return x

        cfg = ActivationSparsityConfig(mode=SparsityMode.THRESHOLD, threshold=0.5)
        fn = make_sparse_linear_fn(fake_linear, cfg)
        x = jnp.asarray([[0.1, 1.0]])
        fn(x, None, None)
        np.testing.assert_allclose(np.asarray(calls["x"]), [[0.0, 1.0]])

    def test_jit_compatible(self):
        cfg = ActivationSparsityConfig(mode=SparsityMode.TOP_K, sparsity_ratio=0.5)
        f = jax.jit(lambda x: apply_sparsity(x, cfg))
        out = f(jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)), jnp.float32))
        assert float(sparsity_ratio(out)) > 0.3


class TestAttentionSparsity:
    def _probs(self, shape=(2, 4, 8, 128), seed=0):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        return jax.nn.softmax(logits, axis=-1)

    def test_top_k_renormalizes(self):
        p = self._probs()
        out = apply_top_k_attention(p, 16)
        sums = np.asarray(jnp.sum(out, axis=-1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-5)
        assert int(np.count_nonzero(np.asarray(out)[0, 0, 0])) <= 16

    def test_threshold_keeps_row_max(self):
        p = jnp.full((1, 8), 1.0 / 8)  # all below a high floor
        out = apply_threshold_attention(p, 0.9)
        assert int(np.count_nonzero(np.asarray(out))) >= 1
        np.testing.assert_allclose(float(jnp.sum(out)), 1.0, atol=1e-5)

    def test_dynamic_peaked_rows_keep_fewer(self):
        n = 128
        peaked = jax.nn.softmax(jnp.asarray([[0.0] * (n - 1) + [20.0]]), axis=-1)
        flat = jnp.full((1, n), 1.0 / n)
        out_p = apply_dynamic_attention(peaked, 0.1, 0.5)
        out_f = apply_dynamic_attention(flat, 0.1, 0.5)
        assert float(attention_sparsity_ratio(out_p)) > float(
            attention_sparsity_ratio(out_f)
        )
        np.testing.assert_allclose(float(jnp.sum(out_p)), 1.0, atol=1e-5)

    def test_window_mask_geometry(self):
        q_pos = jnp.asarray([[10]])
        mask = create_window_mask(q_pos, 16, window_size=4, global_tokens=2, stride=0)
        m = np.asarray(mask)[0, 0]
        assert m[7] and m[8] and m[9] and m[10]  # window
        assert m[0] and m[1]  # global
        assert not m[5]  # outside window, not global
        assert not m[11]  # acausal

    def test_window_mask_stride(self):
        q_pos = jnp.asarray([[100]])
        mask = create_window_mask(q_pos, 128, window_size=8, global_tokens=0, stride=16)
        m = np.asarray(mask)[0, 0]
        assert m[64] and m[80]  # strided keys
        assert not m[65]

    def test_dispatcher_modes(self):
        p = self._probs()
        for mode in AttentionSparsityMode:
            cfg = AttentionSparsityConfig(mode=mode, top_k=8)
            out = apply_attention_sparsity(p, cfg)
            assert out.shape == p.shape

    def test_quality_topk(self):
        """Sparse attention output close to dense on realistic weights
        (reference notebook.md:843-852: 0.99 at ~53% sparsity)."""
        rng = np.random.default_rng(7)
        scores = jnp.asarray(rng.normal(0, 2, (4, 8, 256)).astype(np.float32))
        p = jax.nn.softmax(scores, axis=-1)
        v = jnp.asarray(rng.normal(0, 1, (4, 256, 64)).astype(np.float32))
        dense = jnp.einsum("hqt,htd->hqd", p, v)
        sparse = jnp.einsum("hqt,htd->hqd", apply_top_k_attention(p, 128), v)
        assert _cos(dense, sparse) >= 0.98


class TestModelWithSparsity:
    def test_forward_with_sparsity_runs_and_is_close(self):
        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        cache = KVCache.zeros(cfg, 1, 16)
        start = jnp.zeros((1,), jnp.int32)

        dense_logits, _ = forward(params, cfg, tokens, cache, start)
        sp_logits, _ = forward(
            params, cfg, tokens, cache, start,
            act_sparsity=ActivationSparsityConfig.inference_safe(),
            attn_sparsity=AttentionSparsityConfig(
                mode=AttentionSparsityMode.TOP_K, top_k=8
            ),
        )
        assert np.isfinite(np.asarray(sp_logits)).all()
        assert _cos(dense_logits, sp_logits) >= 0.80

    def test_forward_with_window_attention(self):
        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        cache = KVCache.zeros(cfg, 1, 16)
        start = jnp.zeros((1,), jnp.int32)
        logits, _ = forward(
            params, cfg, tokens, cache, start,
            attn_sparsity=AttentionSparsityConfig(
                mode=AttentionSparsityMode.WINDOW, window_size=4, global_tokens=1
            ),
        )
        assert np.isfinite(np.asarray(logits)).all()
