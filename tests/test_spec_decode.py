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
