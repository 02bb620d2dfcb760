"""Logit-bias tests (OpenAI `logit_bias`, llama.cpp `logit_bias`).

Reference parity: the OpenAI API surface of the reference's serving
stack (SURVEY.md §2.2 Rust gateway [S]) and llama-server's
`logit_bias` sampler field. Bias is applied inside the jitted
decode/prefill programs via per-slot [S, K] id/value arrays.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params
from wrinklefree_tpu.ops.sampling import apply_logit_bias

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


class TestApplyLogitBiasOp:
    def test_adds_bias_at_ids(self):
        logits = jnp.zeros((2, 16), jnp.float32)
        ids = jnp.asarray([[3, 7, -1], [-1, -1, -1]], jnp.int32)
        vals = jnp.asarray([[2.0, -4.0, 99.0], [1.0, 1.0, 1.0]], jnp.float32)
        out = np.asarray(apply_logit_bias(logits, ids, vals))
        assert out[0, 3] == 2.0 and out[0, 7] == -4.0
        assert np.all(out[1] == 0.0)  # empty-row slots are inert
        mask = np.ones(16, bool)
        mask[[3, 7]] = False
        assert np.all(out[0, mask] == 0.0)

    def test_all_empty_is_identity(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(3, 9)).astype(np.float32))
        ids = jnp.full((3, 4), -1, jnp.int32)
        vals = jnp.zeros((3, 4), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(apply_logit_bias(logits, ids, vals)), np.asarray(logits)
        )

    def test_duplicate_ids_accumulate(self):
        logits = jnp.zeros((1, 8), jnp.float32)
        ids = jnp.asarray([[2, 2]], jnp.int32)
        vals = jnp.asarray([[1.5, 2.5]], jnp.float32)
        out = np.asarray(apply_logit_bias(logits, ids, vals))
        assert out[0, 2] == 4.0


class TestEngineLogitBias:
    def test_force_token_greedy(self, params):
        """A huge positive bias makes every greedy step pick that token."""
        eng = Engine(params, CFG, ECFG)
        forced = 23
        req = eng.generate(
            [1, 5, 9, 2, 7],
            SamplingParams(max_new_tokens=6, ignore_eos=True,
                           logit_bias=[(forced, 1e9)]),
        )
        assert req.output_ids == [forced] * 6

    def test_ban_token_greedy(self, params):
        """Banning the greedy argmax changes the decoded stream; other
        requests in the same batch are unaffected."""
        eng = Engine(params, CFG, ECFG)
        base = eng.generate(
            [1, 5, 9, 2, 7], SamplingParams(max_new_tokens=4, ignore_eos=True)
        )
        banned = base.output_ids[0]
        r_ban = eng.submit(
            [1, 5, 9, 2, 7],
            SamplingParams(max_new_tokens=4, ignore_eos=True,
                           logit_bias=[(banned, -1e9)]),
        )
        r_plain = eng.submit(
            [1, 5, 9, 2, 7], SamplingParams(max_new_tokens=4, ignore_eos=True)
        )
        while not (r_ban.finished and r_plain.finished):
            eng.step()
        assert banned not in r_ban.output_ids
        assert r_plain.output_ids == base.output_ids

    def test_bias_applies_to_prefill_token(self, params):
        """The first token comes from the prefill program's sampler."""
        eng = Engine(params, CFG, ECFG)
        forced = 11
        req = eng.generate(
            [4, 4, 4], SamplingParams(max_new_tokens=1, ignore_eos=True,
                                      logit_bias=[(forced, 1e9)])
        )
        assert req.output_ids == [forced]

    def test_too_many_entries_rejected(self, params):
        eng = Engine(params, CFG, ECFG)
        kb = ECFG.logit_bias_slots
        with pytest.raises(ValueError, match="logit_bias"):
            eng.submit(
                [1, 2, 3],
                SamplingParams(logit_bias=[(i, 1.0) for i in range(kb + 1)]),
            )

    def test_exact_head_biased_rows_stay_correct(self, params):
        """With the int8 exact-greedy head, biased rows must route to the
        clean bf16 head (the int8 scan can't see the bias)."""
        ecfg = EngineConfig(**{**ECFG.__dict__, "exact_head_k": 8})
        eng = Engine(params, CFG, ecfg)
        forced = 37
        req = eng.generate(
            [1, 5, 9], SamplingParams(max_new_tokens=3, ignore_eos=True,
                                      logit_bias=[(forced, 1e9)])
        )
        assert req.output_ids == [forced] * 3

    def test_snapshot_restore_preserves_bias(self, params):
        eng = Engine(params, CFG, ECFG)
        forced = 29
        sp = SamplingParams(max_new_tokens=40, ignore_eos=True,
                            logit_bias=[(forced, 1e9)])
        req = eng.submit([1, 5, 9, 2], sp)
        eng.step()  # prefill + one 16-token burst: still mid-flight
        assert not req.finished
        snap = eng.snapshot()
        eng2 = Engine(params, CFG, ECFG)
        (r2,) = eng2.restore(snap)
        while not r2.finished:
            eng2.step()
        assert set(req.output_ids + r2.output_ids) == {forced}
