"""Tensor/data-parallel correctness on a virtual 8-device CPU mesh.

TP-sharded forward must reproduce the single-device forward — this is the
real version of what the reference fakes with FakeProcessGroup
(SURVEY.md §2.3, §4 "multi-host testable on one host").
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
from wrinklefree_tpu.parallel.sharding import (
    cache_partition_spec,
    make_mesh,
    make_tp_forward,
    param_partition_specs,
    repack_params_for_tp,
    shard_params,
)

CFG = BitNetConfig(
    vocab_size=256,
    hidden_size=256,  # == num_heads * head_dim (HF attn_sub_norm assumption)
    intermediate_size=512,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=32,
    max_position=128,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _sharded_setup(n_data, n_model, batch, max_len):
    params = init_params(CFG, seed=0)
    mesh = make_mesh(n_data, n_model)
    params_tp = repack_params_for_tp(params, n_model)
    params_tp = shard_params(params_tp, mesh)
    from jax.sharding import NamedSharding

    cache = KVCache.zeros(CFG, batch, max_len)
    cspec = cache_partition_spec()
    cache = KVCache(
        jax.device_put(cache.k, NamedSharding(mesh, cspec)),
        jax.device_put(cache.v, NamedSharding(mesh, cspec)),
    )
    return params, params_tp, mesh, cache


@pytest.mark.parametrize("n_data,n_model", [(1, 4), (2, 4), (1, 2)])
def test_tp_matches_single_device(n_data, n_model):
    batch, S, max_len = 2, 8, 32
    params, params_tp, mesh, cache = _sharded_setup(n_data, n_model, batch, max_len)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(batch, S)), jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)

    ref_cache = KVCache.zeros(CFG, batch, max_len)
    ref_logits, ref_cache = forward(params, CFG, tokens, ref_cache, start)

    step = make_tp_forward(CFG, mesh, logits_all=True)
    tp_logits, tp_cache = step(params_tp, tokens, cache, start)

    a, b = np.asarray(tp_logits), np.asarray(ref_logits)
    assert a.shape == b.shape
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.9999, f"cos={cos}"
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    # greedy agreement
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9


def test_tp_decode_after_prefill():
    """Prefill then a decode step under TP tracks the unsharded model."""
    batch, S, max_len = 2, 8, 32
    params, params_tp, mesh, cache = _sharded_setup(2, 4, batch, max_len)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(batch, S)), jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)

    step = make_tp_forward(CFG, mesh, logits_all=False)
    _, tp_cache = step(params_tp, tokens, cache, start)
    next_tok = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(batch, 1)), jnp.int32)
    tp_logits, _ = step(params_tp, next_tok, tp_cache, jnp.full((batch,), S, jnp.int32))

    ref_cache = KVCache.zeros(CFG, batch, max_len)
    _, ref_cache = forward(params, CFG, tokens, ref_cache, start)
    ref_logits, _ = forward(
        params, CFG, next_tok, ref_cache, jnp.full((batch,), S, jnp.int32),
    )
    a = np.asarray(tp_logits)
    b = np.asarray(ref_logits)[:, -1]
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_repack_for_tp_preserves_weights():
    params = init_params(CFG, seed=0)
    from wrinklefree_tpu.ops.ternary import unpack_ternary_np

    p2 = repack_params_for_tp(params, 4)
    for name in ("o", "down"):
        w0 = unpack_ternary_np(np.asarray(params["layers"][f"{name}_qw"][0]))
        w1 = np.asarray(p2["layers"][f"{name}_qw"][0])
        k4 = w1.shape[0]
        chunks = np.split(w1, 4, axis=0)
        rebuilt = np.concatenate([unpack_ternary_np(c) for c in chunks], axis=0)
        assert np.array_equal(rebuilt, w0)


def test_tp_flagship_geometry_kv_replicated():
    """make_tp_forward on the REAL 20q/5kv head geometry (reference
    legacy/src/models/bitnet.py:27-37, reduced hidden): tp=4 does not
    divide 5 KV heads, so the KV-replicated layout engages
    (parallel/sharding.tp_kv_replicated). Must track the single-device
    forward. VERDICT r3 item 3."""
    from jax.sharding import NamedSharding

    from wrinklefree_tpu.parallel.sharding import tp_kv_replicated

    cfg = BitNetConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=20, num_kv_heads=5, head_dim=8,
        max_position=128,
    )
    tp = 4
    assert tp_kv_replicated(cfg, tp)
    batch, S, max_len = 2, 8, 32
    params = init_params(cfg, seed=0)
    mesh = make_mesh(2, tp)
    params_tp = shard_params(
        repack_params_for_tp(params, tp), mesh, kv_replicated=True
    )
    cache = KVCache.zeros(cfg, batch, max_len)
    cspec = cache_partition_spec(kv_replicated=True)
    cache = KVCache(
        jax.device_put(cache.k, NamedSharding(mesh, cspec)),
        jax.device_put(cache.v, NamedSharding(mesh, cspec)),
    )

    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, S)), jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)

    ref_cache = KVCache.zeros(cfg, batch, max_len)
    ref_logits, ref_cache = forward(params, cfg, tokens, ref_cache, start)

    step = make_tp_forward(cfg, mesh, logits_all=True)
    tp_logits, tp_cache = step(params_tp, tokens, cache, start)

    a, b = np.asarray(tp_logits), np.asarray(ref_logits)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9

    # decode step continues to track
    nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, 1)), jnp.int32)
    tp_l2, _ = step(params_tp, nxt, tp_cache, jnp.full((batch,), S, jnp.int32))
    ref_l2, _ = forward(params, cfg, nxt, ref_cache, jnp.full((batch,), S, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(tp_l2)[:, -1], np.asarray(ref_l2)[:, -1],
        rtol=0.05, atol=0.05,
    )


def test_tp_kv_replicated_decider():
    from wrinklefree_tpu.parallel.sharding import tp_kv_replicated

    flagship = BitNetConfig.bitnet_2b()
    assert tp_kv_replicated(flagship, 2) is True
    assert tp_kv_replicated(flagship, 4) is True
    assert tp_kv_replicated(flagship, 5) is False
    with pytest.raises(ValueError):
        tp_kv_replicated(flagship, 8)  # 20 Q heads % 8 != 0
    llama = BitNetConfig.llama3_8b_ternary()
    assert tp_kv_replicated(llama, 4) is False
    assert tp_kv_replicated(llama, 8) is False
