"""Output-quality tripwires + stress behavior at the engine level.

Reference analogs: tests/test_sglang_correctness.py (no repetition at
temp=0 across lengths, determinism, max_tokens respected),
test_bitnet_core.py:337-386 (gibberish detectors via output variance) and
test_stress.py (concurrency waves, recovery after bursts). The gibberish
variance detectors exist because two incompatible pack layouts once
produced syntactically-valid-but-garbage output (reference
tests/test_bitnet_core.py:1-12) — cheap end-to-end tripwires.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

CFG = BitNetConfig.tiny()


@pytest.fixture(scope="module")
def engine():
    params = init_params(CFG, seed=0)
    return Engine(
        params, CFG,
        EngineConfig(max_batch_slots=4, page_size=8, num_pages=256,
                     max_context=128, prefill_buckets=(8, 16, 32, 64)),
    )


def _repetition_run(ids, max_run=None):
    """Longest run of one repeated token."""
    best = run = 1
    for a, b in zip(ids, ids[1:]):
        run = run + 1 if a == b else 1
        best = max(best, run)
    return best


class TestGibberishDetectors:
    def test_logits_have_variance(self):
        """Flat/degenerate logits across positions = packing bug tripwire
        (reference output-variance detector)."""
        params = init_params(CFG, seed=0)
        tokens = jnp.arange(1, 9, dtype=jnp.int32)[None, :]
        cache = KVCache.zeros(CFG, 1, 16)
        logits, _ = forward(params, CFG, tokens, cache, jnp.zeros((1,), jnp.int32))
        lg = np.asarray(logits, np.float32)[0]  # [S, V]
        # every position's distribution must have spread
        assert (lg.std(axis=-1) > 1e-3).all()
        # and positions must differ from each other
        assert lg.std(axis=0).mean() > 1e-4

    def test_distinct_prompts_give_distinct_logits(self):
        params = init_params(CFG, seed=0)
        cache = KVCache.zeros(CFG, 1, 16)
        start = jnp.zeros((1,), jnp.int32)
        la, _ = forward(params, CFG, jnp.asarray([[1, 2, 3]], jnp.int32), cache, start)
        lb, _ = forward(params, CFG, jnp.asarray([[4, 5, 6]], jnp.int32), cache, start)
        assert not np.allclose(np.asarray(la[:, -1]), np.asarray(lb[:, -1]))

    def test_greedy_no_pathological_repetition(self, engine):
        """A random-weight model CAN settle into a fixed point, but the
        first few tokens must not be a single-token run from step 0 —
        catches off-by-one cache bugs that freeze the state."""
        out = engine.generate(list(range(1, 17)), SamplingParams(max_new_tokens=12))
        assert len(set(out.output_ids[:4])) >= 2 or _repetition_run(out.output_ids) < 12


class TestDeterminismAndLimits:
    def test_greedy_deterministic_across_lengths(self, engine):
        for n in (4, 9, 17):
            p = list(range(1, n + 1))
            a = engine.generate(p, SamplingParams(max_new_tokens=8))
            b = engine.generate(p, SamplingParams(max_new_tokens=8))
            assert a.output_ids == b.output_ids, f"nondeterministic at len {n}"

    def test_max_tokens_respected_exactly(self, engine):
        for m in (1, 5, 16):
            out = engine.generate([1, 2, 3], SamplingParams(max_new_tokens=m))
            assert len(out.output_ids) <= m

    def test_sampled_respects_seed(self, engine):
        sp = SamplingParams(max_new_tokens=8, temperature=0.8, seed=42)
        a = engine.generate([5, 6, 7], sp)
        b = engine.generate([5, 6, 7], sp)
        assert a.output_ids == b.output_ids


class TestStress:
    def test_concurrency_waves(self, engine):
        """10 then 25 concurrent submits all complete with correct counts
        (reference test_stress.py waves, scaled to unit-size)."""
        for wave in (10, 25):
            results = [None] * wave
            def worker(i):
                results[i] = engine.generate(
                    [1 + i % 7, 2, 3], SamplingParams(max_new_tokens=4)
                )
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(wave)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert all(r is not None and len(r.output_ids) <= 4 for r in results)

    def test_recovery_after_oom_burst(self, engine):
        """Requests that exhaust KV pages finish as 'oom'; the engine must
        keep serving normally afterwards (reference test_stress.py
        recovery-after-burst)."""
        tiny = Engine(
            init_params(CFG, seed=0), CFG,
            EngineConfig(max_batch_slots=2, page_size=8, num_pages=6,
                         max_context=64, prefill_buckets=(8, 16)),
        )
        outs = [
            tiny.generate(list(range(1, 9)), SamplingParams(max_new_tokens=24))
            for _ in range(3)
        ]
        assert all(o.finish_reason in ("length", "oom", "stop") for o in outs)
        ok = tiny.generate([1, 2, 3], SamplingParams(max_new_tokens=4))
        assert len(ok.output_ids) >= 1

    def test_oversized_prompt_rejected(self, engine):
        with pytest.raises(ValueError):
            engine.generate(list(range(1, 300)), SamplingParams(max_new_tokens=4))
