"""Long-context serving via ring prefill + context-parallel decode.

VERDICT r1 item 9: a request LONGER than the paged engine's max_context
is served on the virtual mesh through engine/long_context.py. Exactness
is proven in f32 (reduction-order drift can flip bf16 argmax on random
near-tied logits; dtype plumbing honors cfg.dtype since round 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.engine.long_context import LongContextEngine
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return jax.sharding.Mesh(np.asarray(devs[:n]), ("seq",))


CFG = BitNetConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_position=32768,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0, fast=False)


class TestLongContext:
    def test_matches_dense_forward(self, params):
        """Ring prefill + 8 decode steps == dense forward greedy (f32)."""
        mesh = _mesh(4)
        eng = LongContextEngine(params, CFG, mesh)
        rng = np.random.default_rng(0)
        prompt = rng.integers(1, CFG.vocab_size, size=37).tolist()
        got = eng.generate(prompt, max_new_tokens=8)

        # dense reference: full forward, token-by-token greedy
        cache = KVCache.zeros(CFG, 1, 64)
        toks = jnp.asarray([prompt], jnp.int32)
        logits, cache = forward(
            params, CFG, toks, cache, jnp.zeros((1,), jnp.int32))
        want = [int(np.asarray(logits)[0, -1].argmax())]
        pos = len(prompt)
        for _ in range(7):
            logits, cache = forward(
                params, CFG, jnp.asarray([[want[-1]]], jnp.int32), cache,
                jnp.asarray([pos], jnp.int32))
            want.append(int(np.asarray(logits)[0, -1].argmax()))
            pos += 1
        assert got == want, (got, want)

    def test_qchunked_prefill_matches_unchunked(self, params):
        """The blockwise-q ring prefill (engages when s_loc >
        PREFILL_Q_CHUNK — the path a 16K single-chip prompt needs to
        not OOM on [s_loc, s_loc] scores) is exact vs the plain path."""
        mesh = _mesh(4)
        rng = np.random.default_rng(3)
        prompt = rng.integers(1, CFG.vocab_size, size=64).tolist()
        eng = LongContextEngine(params, CFG, mesh)
        want = eng.generate(prompt, max_new_tokens=6)
        eng2 = LongContextEngine(params, CFG, mesh)
        eng2.PREFILL_Q_CHUNK = 8  # s_loc=16 -> 2 chunks per device
        got = eng2.generate(prompt, max_new_tokens=6)
        assert got == want, (got, want)

    def test_prompt_not_multiple_of_devices(self, params):
        mesh = _mesh(8)
        eng = LongContextEngine(params, CFG, mesh)
        out = eng.generate(list(range(1, 14)), max_new_tokens=4)
        assert len(out) == 4

    @pytest.mark.slow
    def test_16k_context_served(self, params):
        """A 16K-token prompt is served on the 8-device mesh — per-device
        sequence shard is 2K; the full [S,S] score matrix never exists."""
        mesh = _mesh(8)
        eng = LongContextEngine(params, CFG, mesh)
        rng = np.random.default_rng(1)
        prompt = rng.integers(1, CFG.vocab_size, size=16384).tolist()
        out = eng.generate(prompt, max_new_tokens=4)
        assert len(out) == 4 and all(0 <= t < CFG.vocab_size for t in out)

    def test_engine_fallback_routes_long_prompts(self, params):
        """Engine.generate falls back to the ring path past max_context
        instead of raising, when long_context_mesh is given."""
        mesh = _mesh(4)
        ecfg = EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                            max_context=64, prefill_buckets=(8, 16, 32))
        eng = Engine(params, CFG, ecfg, long_context_mesh=mesh)
        long_prompt = list(range(1, 100))  # 99 >= max_context 64
        r = eng.generate(long_prompt,
                         SamplingParams(max_new_tokens=4, temperature=0.0))
        assert r.finished and len(r.output_ids) == 4
        # short prompts still use the paged engine
        r2 = eng.generate([1, 5, 9],
                          SamplingParams(max_new_tokens=4, temperature=0.0))
        assert r2.finished and len(r2.output_ids) == 4
        # without the mesh, long prompts still raise
        eng2 = Engine(params, CFG, ecfg)
        with pytest.raises(ValueError):
            eng2.generate(long_prompt, SamplingParams(max_new_tokens=4))

    def test_rejects_sampling(self, params):
        mesh = _mesh(4)
        ecfg = EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                            max_context=64, prefill_buckets=(8, 16, 32))
        eng = Engine(params, CFG, ecfg, long_context_mesh=mesh)
        with pytest.raises(ValueError):
            eng.generate(list(range(1, 100)),
                         SamplingParams(max_new_tokens=4, temperature=0.8))
