"""Repetition / presence / frequency penalty tests.

Reference parity: llama.cpp's repeat_penalty/repeat_last_n sampler (the
reference's BitNet.cpp backend, SURVEY.md §0) and the OpenAI
presence/frequency penalties its API surface accepts. The engine keeps a
device-resident last-W token ring per slot so the penalties run inside
the jitted decode burst.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
from wrinklefree_tpu.ops.sampling import apply_penalties

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


def numpy_penalties(logits, recent_tokens, rep, pres, freq):
    """llama.cpp-semantics oracle over an explicit window token list."""
    out = logits.copy()
    cnt = {}
    for t in recent_tokens:
        cnt[t] = cnt.get(t, 0) + 1
    for t, c in cnt.items():
        out[t] = out[t] / rep if out[t] > 0 else out[t] * rep
        out[t] -= freq * c + pres
    return out


class TestApplyPenaltiesOp:
    def _ring_from(self, tokens, W):
        """ring[p % W] = token at position p (last W only)."""
        ring = np.full((W,), -1, np.int32)
        n = len(tokens)
        for p in range(max(0, n - W), n):
            ring[p % W] = tokens[p]
        return ring

    @pytest.mark.parametrize("last_n", [8, 3])
    def test_matches_numpy_oracle(self, last_n):
        rng = np.random.default_rng(0)
        V, W = 37, 8
        logits = rng.normal(size=(2, V)).astype(np.float32)
        streams = [
            [3, 5, 3, 3, 11, 5, 2, 3, 9, 3],  # dups, longer than W
            [1, 2],  # shorter than window
        ]
        ring = np.stack([self._ring_from(s, W) for s in streams])
        seq = np.array([len(s) for s in streams], np.int32)
        got = np.asarray(apply_penalties(
            jnp.asarray(logits), jnp.asarray(ring), jnp.asarray(seq),
            jnp.full((2,), last_n, jnp.int32),
            jnp.full((2,), 1.7, jnp.float32),
            jnp.full((2,), 0.3, jnp.float32),
            jnp.full((2,), 0.2, jnp.float32),
        ))
        for b, s in enumerate(streams):
            window = s[max(0, len(s) - min(last_n, W)):]
            want = numpy_penalties(logits[b], window, 1.7, 0.3, 0.2)
            np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6)

    def test_identity_at_defaults(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(3, 20)).astype(np.float32)
        ring = np.full((3, 8), 5, np.int32)
        got = np.asarray(apply_penalties(
            jnp.asarray(logits), jnp.asarray(ring),
            jnp.full((3,), 8, jnp.int32), jnp.full((3,), 8, jnp.int32),
            jnp.ones((3,), jnp.float32), jnp.zeros((3,), jnp.float32),
            jnp.zeros((3,), jnp.float32),
        ))
        np.testing.assert_array_equal(got, logits)

    def test_negative_logit_multiplied(self):
        logits = np.array([[-1.0, 2.0, 0.5]], np.float32)
        ring = np.full((1, 4), -1, np.int32)
        ring[0, 0] = 0
        ring[0, 1] = 1
        got = np.asarray(apply_penalties(
            jnp.asarray(logits), jnp.asarray(ring),
            jnp.array([2], jnp.int32), jnp.array([4], jnp.int32),
            jnp.array([2.0], jnp.float32), jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), jnp.float32),
        ))
        np.testing.assert_allclose(got[0], [-2.0, 1.0, 0.5], rtol=1e-6)

    def test_per_row_mixed_active(self):
        """Row 0 penalized, row 1 defaults — row 1 must be untouched."""
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(2, 16)).astype(np.float32)
        ring = np.full((2, 8), 3, np.int32)
        got = np.asarray(apply_penalties(
            jnp.asarray(logits), jnp.asarray(ring),
            jnp.full((2,), 8, jnp.int32), jnp.full((2,), 8, jnp.int32),
            jnp.array([1.5, 1.0], jnp.float32),
            jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32),
        ))
        want0 = numpy_penalties(logits[0], [3] * 8, 1.5, 0.0, 0.0)
        np.testing.assert_allclose(got[0], want0, rtol=1e-6)
        np.testing.assert_array_equal(got[1], logits[1])


def reference_penalized_greedy(params, cfg, prompt, n_new, rep=1.0, pres=0.0,
                               freq=0.0, last_n=64):
    """Incremental contiguous-cache loop with host-side penalty math —
    the oracle the engine's in-burst device path must match."""
    T = len(prompt) + n_new + 1
    cache = KVCache.zeros(cfg, 1, T, cfg.dtype)
    toks = list(prompt)
    logits, cache = forward(
        params, cfg, jnp.asarray([toks], jnp.int32), cache,
        jnp.zeros((1,), jnp.int32), logits_all=False,
    )
    out = []
    pos = len(toks)
    for _ in range(n_new):
        lg = np.asarray(logits[0], np.float64).astype(np.float32)
        window = toks[max(0, len(toks) - last_n):]
        lg = numpy_penalties(lg, window, rep, pres, freq)
        t = int(np.argmax(lg))
        out.append(t)
        toks.append(t)
        pos_a = jnp.full((1,), pos, jnp.int32)
        logits, cache = forward(
            params, cfg, jnp.asarray([[t]], jnp.int32), cache, pos_a,
            logits_all=False,
        )
        pos += 1
    return out


class TestEnginePenalties:
    def test_repetition_penalty_matches_reference(self, params):
        prompt = [1, 5, 9, 2, 7, 5, 5]
        want = reference_penalized_greedy(
            params, CFG, prompt, 10, rep=1.8, last_n=16
        )
        eng = Engine(params, CFG, ECFG)
        req = eng.generate(prompt, SamplingParams(
            max_new_tokens=10, repetition_penalty=1.8, penalty_last_n=16
        ))
        assert req.output_ids == want

    def test_presence_frequency_match_reference(self, params):
        prompt = [4, 4, 4, 8, 1]
        want = reference_penalized_greedy(
            params, CFG, prompt, 8, pres=0.9, freq=0.4, last_n=32
        )
        eng = Engine(params, CFG, ECFG)
        req = eng.generate(prompt, SamplingParams(
            max_new_tokens=8, presence_penalty=0.9, frequency_penalty=0.4,
            penalty_last_n=32,
        ))
        assert req.output_ids == want

    def test_defaults_unchanged(self, params):
        """Explicit identity penalties must not perturb the stream."""
        prompt = [2, 6, 3]
        eng0 = Engine(params, CFG, ECFG)
        base = eng0.generate(prompt, SamplingParams(max_new_tokens=8)).output_ids
        eng1 = Engine(params, CFG, ECFG)
        got = eng1.generate(prompt, SamplingParams(
            max_new_tokens=8, repetition_penalty=1.0, presence_penalty=0.0,
            frequency_penalty=0.0,
        )).output_ids
        assert got == base

    def test_window_shorter_than_output(self, params):
        """last_n smaller than generated length: old tokens fall out of
        the window and stop being penalized."""
        prompt = [3, 3, 3, 1]
        want = reference_penalized_greedy(
            params, CFG, prompt, 12, rep=1.5, last_n=4
        )
        eng = Engine(params, CFG, ECFG)
        req = eng.generate(prompt, SamplingParams(
            max_new_tokens=12, repetition_penalty=1.5, penalty_last_n=4
        ))
        assert req.output_ids == want

    def test_mixed_batch_isolation(self, params):
        """A penalized request must not perturb an unpenalized one
        decoding in the same bursts."""
        rng = np.random.default_rng(3)
        p_plain = rng.integers(0, CFG.vocab_size, size=(6,)).tolist()
        p_pen = rng.integers(0, CFG.vocab_size, size=(9,)).tolist()

        solo = Engine(params, CFG, ECFG)
        base = solo.generate(p_plain, SamplingParams(max_new_tokens=8)).output_ids

        eng = Engine(params, CFG, ECFG)
        r1 = eng.submit(p_plain, SamplingParams(max_new_tokens=8))
        r2 = eng.submit(p_pen, SamplingParams(
            max_new_tokens=8, repetition_penalty=1.6
        ))
        while not (r1.finished and r2.finished):
            eng.step()
        assert r1.output_ids == base
        want_pen = reference_penalized_greedy(params, CFG, p_pen, 8, rep=1.6)
        assert r2.output_ids == want_pen

    def test_exact_head_falls_back_to_full(self, params):
        """exact_head_k engines route penalized bursts to the full bf16
        head — outputs must match the plain engine with penalties."""
        prompt = [1, 5, 9, 2, 7, 5, 5]
        sp = SamplingParams(max_new_tokens=10, repetition_penalty=1.8,
                            penalty_last_n=16)
        base = Engine(params, CFG, ECFG).generate(prompt, sp).output_ids
        import dataclasses

        ek = Engine(params, CFG, dataclasses.replace(ECFG, exact_head_k=8))
        assert ek.generate(prompt, sp).output_ids == base

    def test_spec_decode_disabled_under_penalties(self, params):
        """Speculative decoding verifies raw-greedy tokens, so penalized
        requests must fall back to the vanilla burst (and still match)."""
        prompt = [1, 5, 1, 5, 1, 5, 1]
        sp = SamplingParams(max_new_tokens=10, repetition_penalty=1.4)
        base = Engine(params, CFG, ECFG).generate(prompt, sp).output_ids
        import dataclasses

        spec_eng = Engine(params, CFG, dataclasses.replace(ECFG, speculative_k=3))
        req = spec_eng.generate(prompt, sp)
        assert req.output_ids == base
        assert spec_eng.stats.get("spec_drafted", 0) == 0

    def test_snapshot_restore_preserves_penalties(self, params):
        prompt = [3, 3, 3, 1, 8]
        sp = SamplingParams(max_new_tokens=12, repetition_penalty=1.5,
                            penalty_last_n=8)
        want = Engine(params, CFG, ECFG).generate(prompt, sp).output_ids

        import dataclasses

        eng = Engine(params, CFG, dataclasses.replace(ECFG, decode_burst=2))
        req = eng.submit(prompt, sp)
        for _ in range(2):  # partial progress
            eng.step()
        assert not req.finished and len(req.output_ids) > 0
        snap = eng.snapshot()

        eng2 = Engine(params, CFG, ECFG)
        restored = eng2.restore(snap)
        assert len(restored) == 1
        r2 = restored[0]
        while not r2.finished:
            eng2.step()
        assert req.output_ids + r2.output_ids == want


class TestServerParsing:
    def test_sampling_from_maps_both_dialects(self):
        from wrinklefree_tpu.server.http import InferenceServer

        import types

        srv = InferenceServer.__new__(InferenceServer)  # parse-only
        srv.async_engine = types.SimpleNamespace(
            engine=types.SimpleNamespace(
                ecfg=types.SimpleNamespace(logit_bias_slots=16)
            )
        )
        sp = srv._sampling_from({
            "max_tokens": 5, "presence_penalty": 0.5,
            "frequency_penalty": 0.25, "repetition_penalty": 1.3,
        })
        assert (sp.presence_penalty, sp.frequency_penalty,
                sp.repetition_penalty) == (0.5, 0.25, 1.3)
        sp2 = srv._sampling_from(
            {"n_predict": 5, "repeat_penalty": 1.2, "repeat_last_n": 128},
            is_llamacpp=True,
        )
        assert sp2.repetition_penalty == 1.2
        assert sp2.penalty_last_n == 128
        assert not srv._sampling_from({"max_tokens": 5}).has_penalties
