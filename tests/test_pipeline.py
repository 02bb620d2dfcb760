"""Pipeline-parallel forward vs single-device oracle (SURVEY.md §2.3 PP
row — the reference stubs PP at world_size=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
from wrinklefree_tpu.parallel.pipeline import make_pp_forward, shard_params_pp

CFG = BitNetConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=64,
)


def _mesh(n, axis="stage"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), (axis,))


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 2), (2, 4)])
def test_pp_matches_single_device(stages, microbatches):
    mesh = _mesh(stages)
    params = init_params(CFG, seed=0)
    B, S, T = microbatches * 2, 8, 16
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, S)), jnp.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, ref_cache = forward(
        params, CFG, tokens, KVCache.zeros(CFG, B, T), start, logits_all=False
    )

    pp = make_pp_forward(CFG, mesh, num_microbatches=microbatches)
    sparams = shard_params_pp(params, mesh)
    logits, cache = pp(sparams, tokens, KVCache.zeros(CFG, B, T), start)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-2, rtol=0
    )
    # KV caches must match too (they feed subsequent decode steps)
    np.testing.assert_allclose(
        np.asarray(cache.k, np.float32), np.asarray(ref_cache.k, np.float32),
        atol=2e-2, rtol=0,
    )


def test_pp_then_decode_step():
    """Prefill through the pipeline, then one more pipelined step reusing
    the cache (decode-style, S=1 per microbatch)."""
    mesh = _mesh(2)
    params = init_params(CFG, seed=0)
    B, S, T = 4, 8, 16
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, S)), jnp.int32)
    start = jnp.zeros((B,), jnp.int32)

    # oracle
    cache0 = KVCache.zeros(CFG, B, T)
    ref_logits, ref_cache = forward(params, CFG, tokens, cache0, start, logits_all=False)
    nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)[:, None]
    ref_logits2, _ = forward(
        params, CFG, nxt, ref_cache, jnp.full((B,), S, jnp.int32), logits_all=False
    )

    pp = make_pp_forward(CFG, mesh, num_microbatches=2)
    sparams = shard_params_pp(params, mesh)
    logits, cache = pp(sparams, tokens, KVCache.zeros(CFG, B, T), start)
    nxt_pp = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    logits2, _ = pp(sparams, nxt_pp, cache, jnp.full((B,), S, jnp.int32))

    np.testing.assert_array_equal(np.asarray(nxt_pp), np.asarray(nxt))
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(ref_logits2), atol=3e-2, rtol=0
    )
