"""Ternary quantization core tests.

Ports the reference test battery (reference tests/test_bitnet_core.py):
pack/unpack round-trips, HF-format conversion, weight-scale handling,
activation quant math, gibberish detectors — plus a cross-check that our
signed-ternary formula equals the reference's encoded-{0,1,2} kernel
formula with activation-sum correction.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wrinklefree_tpu.ops import ternary as T


def rand_ternary(k, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-1, 2, size=(k, n)).astype(np.int8)


class TestPackRoundtrip:
    @pytest.mark.parametrize("k,n", [(128, 128), (256, 512), (512, 256), (2560, 2560)])
    def test_np_roundtrip(self, k, n):
        w = rand_ternary(k, n)
        q = T.pack_ternary_np(w)
        assert q.shape == (k // 4, n) and q.dtype == np.uint8
        assert np.array_equal(T.unpack_ternary_np(q), w)

    def test_jnp_matches_np(self):
        w = rand_ternary(256, 128, seed=1)
        q_np = T.pack_ternary_np(w)
        q_j = np.asarray(T.pack_ternary(jnp.asarray(w, dtype=jnp.float32)))
        assert np.array_equal(q_np, q_j)
        assert np.array_equal(np.asarray(T.unpack_ternary(jnp.asarray(q_np))), w)

    def test_all_constant_values(self):
        for val, byte in [(-1, 0b00000000), (0, 0b01010101), (1, 0b10101010)]:
            w = np.full((8, 4), val, dtype=np.int8)
            q = T.pack_ternary_np(w)
            assert np.all(q == byte), f"value {val} should pack to {byte:#010b}"


class TestHFInterop:
    """HF stores uint8 [out//4, in], planes along OUT (reference
    tests/test_bitnet_core.py:172-239 semantics)."""

    def _rand_hf_packed(self, out_f, in_f, seed=0):
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 3, size=(out_f, in_f)).astype(np.uint8)  # {0,1,2}
        planes = vals.reshape(4, out_f // 4, in_f)
        packed = planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)
        return packed.astype(np.uint8), vals.astype(np.int8) - 1

    def test_hf_unpack_all_values(self):
        assert np.all(T.unpack_hf_packed(np.zeros((1, 4), np.uint8)) == -1)
        assert np.all(T.unpack_hf_packed(np.full((1, 4), 85, np.uint8)) == 0)
        assert np.all(T.unpack_hf_packed(np.full((1, 4), 170, np.uint8)) == 1)

    def test_hf_unpack_matches_construction(self):
        packed, w = self._rand_hf_packed(256, 512)
        out = T.unpack_hf_packed(packed)
        assert out.shape == (256, 512)
        assert np.array_equal(out, w)

    def test_hf_to_wf_roundtrip(self):
        packed, w_nk = self._rand_hf_packed(256, 512, seed=3)
        q_wf = T.hf_packed_to_wf(packed)
        assert q_wf.shape == (512 // 4, 256)
        assert np.array_equal(T.unpack_ternary_np(q_wf), w_nk.T)

    def test_hf_unpack_matches_transformers(self):
        torch = pytest.importorskip("torch")
        from transformers.integrations.bitnet import unpack_weights

        packed, _ = self._rand_hf_packed(128, 64, seed=4)
        ours = T.unpack_hf_packed(packed)
        theirs = unpack_weights(torch.from_numpy(packed), dtype=torch.float32).numpy()
        assert np.array_equal(ours.astype(np.float32), theirs)


class TestActivationQuant:
    def test_scale_and_values(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        q, scale = T.quantize_activations(x)
        assert q.dtype == jnp.int8 and scale.shape == (4, 1)
        absmax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(scale), 127.0 / absmax, rtol=1e-6)
        # round-trip error bounded by half a quantization step
        err = np.abs(np.asarray(q, np.float32) / np.asarray(scale) - np.asarray(x))
        assert err.max() <= 0.5 / np.asarray(scale).min() + 1e-6

    def test_zero_input_safe(self):
        q, scale = T.quantize_activations(jnp.zeros((1, 64)))
        assert np.all(np.isfinite(np.asarray(scale)))
        assert np.all(np.asarray(q) == 0)


class TestTernaryLinear:
    def test_matmul_reference_exact_int(self):
        w = rand_ternary(256, 128, seed=5)
        q = jnp.asarray(T.pack_ternary_np(w))
        rng = np.random.default_rng(5)
        x_q = jnp.asarray(rng.integers(-128, 128, size=(4, 256)), dtype=jnp.int8)
        out = np.asarray(T.ternary_matmul_reference(x_q, q))
        expect = np.asarray(x_q, np.int64) @ w.astype(np.int64)
        assert np.array_equal(out.astype(np.int64), expect)

    def test_weight_scale_divides(self):
        """HF semantics: doubling weight_scale HALVES the output."""
        w = rand_ternary(256, 128, seed=6)
        q = jnp.asarray(T.pack_ternary_np(w))
        x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 256)), dtype=jnp.float32)
        y1 = np.asarray(T.ternary_linear(x, q, jnp.float32(1.0), out_dtype=jnp.float32))
        y2 = np.asarray(T.ternary_linear(x, q, jnp.float32(2.0), out_dtype=jnp.float32))
        ratio = np.abs(y1).mean() / np.abs(y2).mean()
        assert 1.9 < ratio < 2.1

    def test_matches_hf_bitlinear(self):
        """End-to-end vs transformers BitLinear on identical weights."""
        torch = pytest.importorskip("torch")
        from transformers.integrations.bitnet import BitLinear, pack_weights

        out_f, in_f = 128, 256
        w_nk = rand_ternary(in_f, out_f, seed=7).T  # [out, in]
        lin = BitLinear(in_f, out_f, bias=False, dtype=torch.bfloat16)
        lin.weight = pack_weights(torch.from_numpy(w_nk.astype(np.int64)))
        lin.weight_scale = torch.tensor([1.3], dtype=torch.bfloat16)

        x = np.random.default_rng(7).normal(size=(4, in_f)).astype(np.float32)
        y_hf = lin(torch.from_numpy(x).to(torch.bfloat16)).float().numpy()

        q = jnp.asarray(T.pack_ternary_np(w_nk.T))
        y = np.asarray(
            T.ternary_linear(
                jnp.asarray(x, dtype=jnp.bfloat16), q, jnp.float32(1.3), hf_exact=True
            ).astype(jnp.float32)
        )
        cos = np.dot(y.ravel(), y_hf.ravel()) / (
            np.linalg.norm(y.ravel()) * np.linalg.norm(y_hf.ravel())
        )
        # HF's activation_quant is @torch.compile'd and rounds borderline
        # values differently at bf16; agreement is bounded by one int8
        # quantum, not bitwise.
        assert cos > 0.9999, f"cos={cos}"
        np.testing.assert_allclose(y, y_hf, rtol=0.1, atol=0.3)

    def test_equivalent_to_reference_encoded_formula(self):
        """Cross-check vs the reference kernel's encoded-{0,1,2} math +
        activation-sum correction (reference direct_inference_full.py:186-208):
        scale'*(sum((w+1)*a) - sum(a)) == scale'*sum(w*a)."""
        w = rand_ternary(128, 64, seed=8).astype(np.float32)
        rng = np.random.default_rng(8)
        a = rng.integers(-128, 128, size=(128,)).astype(np.float32)
        ws_mult = 1.7  # reference multiplies by its weight scale
        kernel_out = ws_mult * ((w.T + 1.0) @ a)
        corrected = kernel_out - ws_mult * a.sum()
        direct = ws_mult * (w.T @ a)
        np.testing.assert_allclose(corrected, direct, rtol=1e-5, atol=1e-3)


class TestNaiveConverter:
    def test_ternary_distribution_sane(self):
        """Analog of reference tests/test_naive_converter.py: a gaussian
        weight matrix should convert to a mix of -1/0/+1."""
        rng = np.random.default_rng(9)
        w = rng.normal(0, 0.02, size=(512, 512)).astype(np.float32)
        tern, scale = T.quantize_weights_ternary(w)
        vals, counts = np.unique(tern, return_counts=True)
        assert set(vals.tolist()) <= {-1, 0, 1}
        frac = counts / tern.size
        assert all(f > 0.05 for f in frac), f"degenerate distribution {dict(zip(vals, frac))}"
        # dequantized weights should correlate with originals
        deq = tern.astype(np.float32) / scale
        cos = np.dot(deq.ravel(), w.ravel()) / (
            np.linalg.norm(deq) * np.linalg.norm(w) + 1e-9
        )
        # ~0.887 is the theoretical correlation of mean-|w| ternary
        # quantization on a gaussian; anything above 0.85 is healthy.
        assert cos > 0.85


class TestGibberishDetectors:
    """Variance/constancy tripwires (reference tests/test_bitnet_core.py:337-386)."""

    def test_output_variance_matches_dense(self):
        w = rand_ternary(512, 256, seed=10)
        q = jnp.asarray(T.pack_ternary_np(w))
        x = np.random.default_rng(10).normal(size=(8, 512)).astype(np.float32)
        ref = (x @ w.astype(np.float32)) / 1.5
        out = np.asarray(
            T.ternary_linear(jnp.asarray(x), q, jnp.float32(1.5), out_dtype=jnp.float32)
        )
        ratio = out.std() / ref.std()
        assert 0.5 < ratio < 2.0

    def test_different_inputs_different_outputs(self):
        w = rand_ternary(512, 256, seed=11)
        q = jnp.asarray(T.pack_ternary_np(w))
        rng = np.random.default_rng(11)
        x1, x2 = (jnp.asarray(rng.normal(size=(1, 512)), dtype=jnp.float32) for _ in range(2))
        o1 = np.asarray(T.ternary_linear(x1, q, jnp.float32(1.0), out_dtype=jnp.float32))
        o2 = np.asarray(T.ternary_linear(x2, q, jnp.float32(1.0), out_dtype=jnp.float32))
        assert np.abs(o1 - o2).mean() > 0.1
