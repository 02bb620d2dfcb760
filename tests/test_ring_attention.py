"""Ring attention vs full-attention oracle (new capability beyond the
reference — SURVEY.md §5.7 names it the TPU-native long-context path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wrinklefree_tpu.ops.ring_attention import make_ring_attention


def _full_causal(q, k, v):
    """Dense GQA causal attention oracle in f32."""
    B, S, NH, D = q.shape
    KV = k.shape[2]
    G = NH // KV
    qg = q.astype(jnp.float32).reshape(B, S, KV, G, D)
    s = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.float32))
    s = s / np.sqrt(D)
    mask = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(mask[None, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32))
    return out.reshape(B, S, NH, D)


def _mesh(n, axis="seq"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), (axis,))


def _qkv(B=2, S=32, NH=4, KV=2, D=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, S, NH, D)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (B, S, KV, D)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (B, S, KV, D)), dtype)
    return q, k, v


class TestRingAttention:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_full_causal(self, n_dev):
        mesh = _mesh(n_dev)
        q, k, v = _qkv()
        ref = _full_causal(q, k, v)
        out = make_ring_attention(mesh)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_matches_full_noncausal(self):
        mesh = _mesh(4)
        q, k, v = _qkv(seed=1)
        # non-causal oracle: softmax over all keys
        B, S, NH, D = q.shape
        KV, G = k.shape[2], NH // k.shape[2]
        qg = q.astype(jnp.float32).reshape(B, S, KV, G, D)
        s = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.float32)) / np.sqrt(D)
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32)).reshape(B, S, NH, D)
        out = make_ring_attention(mesh, causal=False)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self):
        mesh = _mesh(4)
        q, k, v = _qkv(dtype=jnp.bfloat16, seed=2)
        ref = _full_causal(q, k, v)
        out = make_ring_attention(mesh)(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
        )

    def test_mha_no_gqa(self):
        mesh = _mesh(2)
        q, k, v = _qkv(NH=4, KV=4, seed=3)
        ref = _full_causal(q, k, v)
        out = make_ring_attention(mesh)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
