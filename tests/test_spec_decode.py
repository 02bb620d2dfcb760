"""Speculative (n-gram / prompt-lookup) decoding vs vanilla greedy.

The acceptance rule only emits draft tokens that equal the verifier's
own greedy argmax, so speculative output must equal vanilla greedy
output token-for-token regardless of draft quality. That invariant is
the whole test surface; speed is a bench concern (bench.py WF_BENCH_SPEC).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import generate, init_params
from wrinklefree_tpu.models.spec_decode import _draft_ngram, generate_spec


@pytest.fixture(scope="module")
def tiny():
    cfg = BitNetConfig.tiny()
    return cfg, init_params(cfg, seed=0)


@pytest.mark.parametrize("k,ngram", [(4, 2), (3, 1), (8, 2)])
def test_spec_equals_vanilla_greedy(tiny, k, ngram):
    cfg, params = tiny
    for seed, plen in ((0, 5), (1, 12), (2, 3)):
        rng = np.random.default_rng(seed)
        prompt = [int(t) for t in rng.integers(1, cfg.vocab_size, plen)]
        ref = generate(params, cfg, prompt, max_new_tokens=24, temperature=0.0)
        ref_cont = [int(t) for t in ref[len(prompt):]]  # generate() returns prompt+continuation
        got = generate_spec(
            params, cfg, prompt, max_new_tokens=24, k=k, ngram=ngram, window=4
        )
        assert len(got) == 24 and got == ref_cont[: len(got)]


def test_draft_ngram_finds_repetition():
    # hist = [7, 3, 9, 5, 7, 3, ...], tail bigram (7, 3) at positions 4-5
    # matches positions 0-1 -> draft should propose hist[2:2+k] = [9, 5, 7]
    hist = jnp.asarray([[7, 3, 9, 5, 7, 3, 0, 0]], jnp.int32)
    draft = _draft_ngram(hist, jnp.asarray([5], jnp.int32), k=3, n=2)
    assert draft.tolist() == [[9, 5, 7]]


def test_draft_ngram_no_match_is_harmless(tiny):
    # all-distinct history: no n-gram repeats; spec must still equal greedy
    cfg, params = tiny
    prompt = list(range(1, 11))
    ref = generate(params, cfg, prompt, max_new_tokens=12, temperature=0.0)
    ref_cont = [int(t) for t in ref[len(prompt):]]
    got = generate_spec(params, cfg, prompt, max_new_tokens=12, k=4, window=3)
    assert got == ref_cont[: len(got)]


class TestEngineSpeculative:
    """Engine-level speculative decoding (paged KV, both layouts)."""

    @pytest.mark.parametrize("layout", ["token", "layer"])
    def test_spec_engine_matches_plain(self, tiny, layout):
        from wrinklefree_tpu.config import EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams

        cfg, params = tiny
        base = dict(max_batch_slots=4, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16, 32),
                    kv_layout=layout, decode_burst=4)
        prompts = [[1, 5, 9, 2, 7], [3, 4, 5, 3, 4, 5, 3, 4], [11, 12, 13]]
        plain = Engine(params, cfg, EngineConfig(**base))
        want = [plain.generate(p, SamplingParams(max_new_tokens=18, temperature=0.0)).output_ids
                for p in prompts]
        spec = Engine(params, cfg, EngineConfig(speculative_k=3, **base))
        got = [spec.generate(p, SamplingParams(max_new_tokens=18, temperature=0.0)).output_ids
               for p in prompts]
        assert got == want
        assert spec.stats.get("spec_drafted", 0) > 0

    def test_spec_falls_back_for_sampled_requests(self, tiny):
        from wrinklefree_tpu.config import EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams

        cfg, params = tiny
        eng = Engine(params, cfg, EngineConfig(
            max_batch_slots=2, page_size=8, num_pages=32, max_context=64,
            prefill_buckets=(8, 16), speculative_k=3, decode_burst=4))
        r = eng.generate([1, 2, 3], SamplingParams(max_new_tokens=8,
                                                   temperature=0.9, seed=7))
        assert len(r.output_ids) == 8
        assert eng.stats.get("spec_drafted", 0) == 0  # sampled: plain burst

    def test_spec_adaptive_cutoff(self, tiny):
        """spec_min_accept: drafting turns itself off (sticky) once the
        realized acceptance over >= spec_min_accept_window drafts is
        below the threshold; outputs stay token-identical."""
        from wrinklefree_tpu.config import EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams

        cfg, params = tiny
        base = dict(max_batch_slots=2, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16), decode_burst=4)
        eng = Engine(params, cfg, EngineConfig(
            speculative_k=3, spec_min_accept=0.99,
            spec_min_accept_window=4, **base))
        # random-ish prompt: n-gram drafts essentially never accept, so
        # the 0.99 threshold trips right after the window fills
        r = eng.generate([1, 9, 4, 2, 7, 5],
                         SamplingParams(max_new_tokens=24, temperature=0.0))
        assert len(r.output_ids) == 24
        assert getattr(eng, "_spec_off", False) is True
        drafted_at_off = eng.stats["spec_drafted"]
        r2 = eng.generate([6, 8, 3], SamplingParams(max_new_tokens=8,
                                                    temperature=0.0))
        assert len(r2.output_ids) == 8
        assert eng.stats["spec_drafted"] == drafted_at_off  # no new drafts
        # token-identity vs a plain engine
        plain = Engine(params, cfg, EngineConfig(**base))
        assert plain.generate([1, 9, 4, 2, 7, 5], SamplingParams(
            max_new_tokens=24, temperature=0.0)).output_ids == r.output_ids

    def test_spec_concurrent_page_crossing(self, tiny):
        """Concurrent spec requests crossing page boundaries at different
        offsets (the window clamp + position-triggered flush path)."""
        from wrinklefree_tpu.config import EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams

        cfg, params = tiny
        base = dict(max_batch_slots=4, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16, 32),
                    kv_layout="layer", decode_burst=4)
        prompts = [list(range(1, n)) for n in (4, 7, 11, 14)]
        plain = Engine(params, cfg, EngineConfig(**base))
        spec = Engine(params, cfg, EngineConfig(speculative_k=3, **base))
        wants, gots = [], []
        for eng, outs in ((plain, wants), (spec, gots)):
            reqs = [eng.submit(p, SamplingParams(max_new_tokens=25, temperature=0.0))
                    for p in prompts]
            while not all(r.finished for r in reqs):
                eng.step()
            outs.extend(r.output_ids for r in reqs)
        assert gots == wants


def test_force_accept_cost_harness(tiny):
    """spec_decode_window(force_accept=a) emits exactly a+1 tokens per
    step and advances start accordingly — the controlled-acceptance
    knob scripts/spec_accept_curve.py times (VERDICT r3 item 7)."""
    from wrinklefree_tpu.models.bitnet import KVCache, forward
    from wrinklefree_tpu.models.spec_decode import spec_decode_window

    cfg, params = tiny
    P, steps, k, acc = 8, 4, 3, 2
    cache = KVCache.zeros(cfg, 1, 64)
    toks = jnp.ones((1, P), jnp.int32)
    logits, cache = forward(params, cfg, toks, cache,
                            jnp.zeros((1,), jnp.int32), logits_all=False)
    last = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(1)
    hist = jnp.zeros((1, 64), jnp.int32)
    hist = hist.at[0, :P].set(toks[0])
    hist = hist.at[0, P].set(last[0])
    start = jnp.full((1,), P, jnp.int32)
    _, counts, _, _, start2, _ = spec_decode_window(
        params, cfg, last, cache, start, hist,
        steps=steps, k=k, force_accept=acc,
    )
    assert (np.asarray(counts) == acc + 1).all()
    assert int(np.asarray(start2)[0]) == P + steps * (acc + 1)
