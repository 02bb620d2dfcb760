"""Per-token logprobs tests (OpenAI `logprobs`/`top_logprobs`, llama.cpp
`n_probs`).

The engine computes the chosen-token logprob + top-N alternatives INSIDE
the jitted prefill/decode programs (engine/engine.py `_build_decode(
with_logprobs=True)`), from the same penalized distribution the step
sampled from — so the numbers are exact for the tokens actually emitted.
Oracle: contiguous-cache reference forward + log_softmax.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32), logprobs_top=4,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def engine(params):
    # module-scoped: the logprobs decode/prefill variants compile once
    return Engine(params, CFG, ECFG)


PROMPT = [5, 9, 2, 7, 1]


class TestEngineLogprobs:
    def test_greedy_structure_and_consistency(self, engine):
        req = engine.generate(
            PROMPT,
            SamplingParams(temperature=0.0, max_new_tokens=6, logprobs_k=3,
                           ignore_eos=True),
        )
        assert len(req.logprobs_seq) == len(req.output_ids) == 6
        for tok, (chosen, tops) in zip(req.output_ids, req.logprobs_seq):
            assert len(tops) == 3
            lps = [lp for _, lp in tops]
            # log-probabilities, sorted descending
            assert all(lp <= 0.0 for lp in lps)
            assert lps == sorted(lps, reverse=True)
            # greedy: the sampled token IS the argmax of the distribution
            assert tops[0][0] == tok
            assert chosen == pytest.approx(tops[0][1], abs=1e-5)

    def test_prefill_token_matches_reference_forward(self, engine, params):
        """First emitted token's logprob vs the contiguous-forward oracle."""
        req = engine.generate(
            PROMPT,
            SamplingParams(temperature=0.0, max_new_tokens=1, logprobs_k=3,
                           ignore_eos=True),
        )
        tokens = jnp.asarray([PROMPT], jnp.int32)
        cache = KVCache.zeros(CFG, 1, 32)
        logits, _ = forward(
            params, CFG, tokens, cache, jnp.zeros((1,), jnp.int32),
            logits_all=True,
        )
        ref_lp = np.asarray(jax.nn.log_softmax(logits[0, -1].astype(jnp.float32)))
        tok = req.output_ids[0]
        chosen, tops = req.logprobs_seq[0]
        assert tok == int(ref_lp.argmax())
        assert chosen == pytest.approx(float(ref_lp[tok]), abs=0.05)
        ref_top = set(np.argsort(ref_lp)[::-1][:3].tolist())
        assert set(t for t, _ in tops) == ref_top

    def test_k_clamps_to_engine_limit(self, engine):
        req = engine.generate(
            PROMPT,
            SamplingParams(temperature=0.0, max_new_tokens=2, logprobs_k=50,
                           ignore_eos=True),
        )
        for _, tops in req.logprobs_seq:
            assert len(tops) == ECFG.logprobs_top

    def test_mixed_batch_lp_and_non_lp(self, engine):
        """A logprobs request sharing a burst with a plain one: the plain
        request must stay logprobs-free and both must emit identically-
        structured streams."""
        sp_lp = SamplingParams(temperature=0.0, max_new_tokens=4,
                               logprobs_k=2, ignore_eos=True)
        sp_plain = SamplingParams(temperature=0.0, max_new_tokens=4,
                                  ignore_eos=True)
        r1 = engine.submit(PROMPT, sp_lp)
        r2 = engine.submit([3, 3, 8, 1], sp_plain)
        while not (r1.finished and r2.finished):
            engine.step()
        assert len(r1.logprobs_seq) == 4
        assert r2.logprobs_seq == []
        assert len(r2.output_ids) == 4

    def test_greedy_tokens_unchanged_by_logprobs(self, engine):
        """Requesting logprobs must not perturb the sampled stream."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=5, ignore_eos=True)
        base = engine.generate(PROMPT, sp)
        import dataclasses

        lp = engine.generate(PROMPT, dataclasses.replace(sp, logprobs_k=2))
        assert lp.output_ids == base.output_ids

    def test_sampled_with_penalties(self, engine):
        """Logprobs under temperature + repetition penalty: distribution is
        the penalized pre-temperature one; values stay finite and the
        stream is seed-deterministic."""
        sp = SamplingParams(temperature=0.8, top_p=0.95, max_new_tokens=5,
                            logprobs_k=2, repetition_penalty=1.3, seed=7,
                            ignore_eos=True)
        r1 = engine.generate(PROMPT, sp)
        r2 = engine.generate(PROMPT, sp)
        assert r1.output_ids == r2.output_ids
        assert [c for c, _ in r1.logprobs_seq] == [c for c, _ in r2.logprobs_seq]
        for chosen, tops in r1.logprobs_seq:
            assert np.isfinite(chosen) and chosen <= 0.0
            assert all(np.isfinite(lp) for _, lp in tops)
