"""Sampler op + engine tests for per-request top_k and min_p.

Reference parity: llama.cpp sampler chain (top_k / min_p / top_p — the
reference's BitNet.cpp backend serves these via llama-server) and the
OpenAI `top_k` extension. Both run INSIDE the jitted decode burst as
per-row traced arrays, like temperature/top_p.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params
from wrinklefree_tpu.ops.sampling import sample_token

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def engine(params):
    return Engine(params, CFG, ECFG)


class TestSampleTokenOp:
    def test_per_row_top_k_one_is_greedy(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 50)).astype(np.float32))
        greedy = np.asarray(logits).argmax(-1)
        for seed in range(20):
            tok = sample_token(
                logits, jax.random.PRNGKey(seed), temperature=1.5,
                top_p=jnp.ones(2), top_k=jnp.asarray([1, 0], jnp.int32),
            )
            # row 0 is clamped to the argmax; row 1 is unrestricted
            assert int(tok[0]) == greedy[0]

    def test_per_row_top_k_restricts_support(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
        top3 = set(np.asarray(logits)[0].argsort()[::-1][:3].tolist())
        seen = set()
        for seed in range(50):
            tok = sample_token(
                logits, jax.random.PRNGKey(seed), temperature=2.0,
                top_k=jnp.asarray([3], jnp.int32),
            )
            seen.add(int(tok[0]))
        assert seen <= top3 and len(seen) > 1

    def test_min_p_llamacpp_semantics(self):
        """min_p keeps exactly tokens with prob >= min_p * p_max."""
        # probs ~ softmax: token 0 dominant, 1 within 0.5*pmax, rest far below
        logits = jnp.asarray(
            [[5.0, 5.0 + np.log(0.6), 5.0 + np.log(0.4), 0.0, -3.0]],
            jnp.float32,
        )
        allowed = {0, 1}  # ratio >= 0.5: tokens 0 (1.0) and 1 (0.6)
        seen = set()
        for seed in range(60):
            tok = sample_token(
                logits, jax.random.PRNGKey(seed), temperature=1.0,
                min_p=jnp.asarray([0.5], jnp.float32),
            )
            seen.add(int(tok[0]))
        assert seen == allowed

    def test_min_p_zero_is_identity(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(3, 40)).astype(np.float32))
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            a = sample_token(logits, key, temperature=1.0)
            b = sample_token(logits, key, temperature=1.0,
                             min_p=jnp.zeros(3), top_k=jnp.zeros(3, jnp.int32))
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_greedy_rows_unaffected(self):
        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(2, 30)).astype(np.float32))
        tok = sample_token(
            logits, jax.random.PRNGKey(0),
            temperature=jnp.asarray([0.0, 1.0]),
            top_k=jnp.asarray([5, 5], jnp.int32),
            min_p=jnp.asarray([0.9, 0.1]),
        )
        assert int(tok[0]) == int(np.asarray(logits)[0].argmax())


PROMPT = [5, 9, 2, 7, 1]


class TestEngineTopKMinP:
    def test_top_k_one_reproduces_greedy_stream(self, engine):
        """temperature=1, top_k=1 through the whole engine == greedy."""
        greedy = engine.generate(
            PROMPT, SamplingParams(temperature=0.0, max_new_tokens=8,
                                   ignore_eos=True),
        )
        k1 = engine.generate(
            PROMPT, SamplingParams(temperature=1.0, top_k=1, seed=3,
                                   max_new_tokens=8, ignore_eos=True),
        )
        assert k1.output_ids == greedy.output_ids

    def test_min_p_one_reproduces_greedy_stream(self, engine):
        greedy = engine.generate(
            PROMPT, SamplingParams(temperature=0.0, max_new_tokens=8,
                                   ignore_eos=True),
        )
        mp = engine.generate(
            PROMPT, SamplingParams(temperature=1.0, min_p=1.0, seed=3,
                                   max_new_tokens=8, ignore_eos=True),
        )
        assert mp.output_ids == greedy.output_ids

    def test_mixed_batch_isolation(self, engine):
        """A top_k=1 row and a free-sampling row share a burst; the
        constrained row must still match greedy."""
        greedy = engine.generate(
            PROMPT, SamplingParams(temperature=0.0, max_new_tokens=6,
                                   ignore_eos=True),
        )
        r1 = engine.submit(
            PROMPT, SamplingParams(temperature=1.0, top_k=1, seed=11,
                                   max_new_tokens=6, ignore_eos=True),
        )
        r2 = engine.submit(
            [3, 8, 8, 2], SamplingParams(temperature=1.2, seed=12,
                                         max_new_tokens=6, ignore_eos=True),
        )
        while not (r1.finished and r2.finished):
            engine.step()
        assert r1.output_ids == greedy.output_ids
        assert len(r2.output_ids) == 6

    def test_snapshot_carries_min_p(self, params):
        eng = Engine(params, CFG, ECFG)
        eng.submit(PROMPT, SamplingParams(temperature=1.0, min_p=0.25,
                                          top_k=7, max_new_tokens=4))
        snap = eng.snapshot()
        (d,) = snap["requests"]
        assert d["min_p"] == 0.25 and d["top_k"] == 7
        eng2 = Engine(params, CFG, ECFG)
        (r,) = eng2.restore(snap)
        assert r.sampling.min_p == 0.25 and r.sampling.top_k == 7


class TestTypicalAndTfs:
    """llama.cpp typical_p (locally-typical) and tfs_z (tail-free)
    samplers: identity at 1.0; tightening narrows the support."""

    def _support(self, logits, n_draws=400, **kw):
        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=tuple(kw))
        def draws(lg, **kws):
            def one(i):
                return sample_token(
                    lg[None, :], jax.random.PRNGKey(i), temperature=1.0,
                    **kws,
                )[0]

            return jax.vmap(one)(jnp.arange(n_draws, dtype=jnp.uint32))

        return set(np.asarray(draws(jnp.asarray(logits), **kw)).tolist())

    def test_identity_at_one(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(24,)).astype(np.float32) * 3
        a = self._support(logits, n_draws=50)
        b = self._support(logits, n_draws=50, typical_p=1.0, tfs_z=1.0)
        assert a == b

    def test_typical_p_narrows_support(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(32,)).astype(np.float32) * 4
        full = self._support(logits)
        typ = self._support(logits, typical_p=0.3)
        assert typ.issubset(full)
        assert len(typ) < len(full)

    def test_tfs_narrows_support(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(32,)).astype(np.float32) * 4
        full = self._support(logits)
        tfs = self._support(logits, tfs_z=0.3)
        assert tfs.issubset(full)
        assert len(tfs) < len(full)

    def test_per_row_params(self):
        """Row 0 heavily filtered, row 1 unfiltered — independent."""
        import jax

        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32) * 5)

        @jax.jit
        def draws(lg):
            def one(i):
                keys = jax.vmap(jax.random.PRNGKey)(
                    jnp.stack([2 * i, 2 * i + 1])
                )
                return sample_token(
                    lg, keys, temperature=jnp.asarray([1.0, 1.0]),
                    typical_p=jnp.asarray([0.2, 1.0]),
                )

            return jax.vmap(one)(jnp.arange(200, dtype=jnp.uint32))

        t = np.asarray(draws(logits))  # [200, 2]
        assert len(set(t[:, 0].tolist())) < len(set(t[:, 1].tolist()))
