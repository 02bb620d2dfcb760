"""Mirostat v2 tests (llama.cpp mirostat/mirostat_tau/mirostat_eta):
adaptive surprise-targeted sampling, device-resident mu state."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params
from wrinklefree_tpu.ops.sampling import sample_token_mirostat

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


class TestMirostatOp:
    def _keys(self, i, b=1):
        return jax.vmap(jax.random.PRNGKey)(
            jnp.arange(i * b, i * b + b, dtype=jnp.uint32)
        )

    def test_low_mu_forces_low_surprise(self):
        """mu near 0 bits only admits the argmax token."""
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32) * 3)
        toks = set()
        for i in range(50):
            tok, _ = sample_token_mirostat(
                logits, self._keys(i), jnp.asarray([0.05]),
                temperature=1.0, top_p=1.0, top_k=0, min_p=0.0,
                typical_p=1.0, tfs_z=1.0,
                miro=jnp.asarray([2]), tau=jnp.asarray([5.0]),
                eta=jnp.asarray([0.1]),
            )
            toks.add(int(np.asarray(tok)[0]))
        assert toks == {int(np.asarray(jnp.argmax(logits[0])))}

    def test_mu_adapts_toward_tau(self):
        """Repeated steps drive observed surprise toward tau: from
        mu = 2*tau, mu decreases when surprises run below tau."""
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
        tau, eta = 2.0, 0.3
        mu = jnp.asarray([2 * tau])
        for i in range(30):
            _, mu = sample_token_mirostat(
                logits, self._keys(i), mu,
                temperature=1.0, top_p=1.0, top_k=0, min_p=0.0,
                typical_p=1.0, tfs_z=1.0,
                miro=jnp.asarray([2]), tau=jnp.asarray([tau]),
                eta=jnp.asarray([eta]),
            )
        # flat-ish 64-token distribution: surprises ~6 bits > tau would
        # push mu down from 4 toward a value where the cut binds
        assert float(mu[0]) != 2 * tau
        assert np.isfinite(float(mu[0]))

    def test_miro_zero_matches_standard_sampler(self):
        from wrinklefree_tpu.ops.sampling import sample_token

        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32) * 2)
        for i in range(20):
            keys = self._keys(i, b=2)
            a = sample_token(logits, keys, temperature=1.0, top_p=0.9)
            b, mu = sample_token_mirostat(
                logits, keys, jnp.asarray([3.0, 3.0]),
                temperature=1.0, top_p=0.9, top_k=0, min_p=0.0,
                typical_p=1.0, tfs_z=1.0,
                miro=jnp.asarray([0, 0]), tau=jnp.asarray([5.0, 5.0]),
                eta=jnp.asarray([0.1, 0.1]),
            )
            assert np.array_equal(np.asarray(a), np.asarray(b))
            assert np.allclose(np.asarray(mu), [3.0, 3.0])  # untouched


class TestEngineMirostat:
    def test_generates_and_reproducible(self, params):
        eng = Engine(params, CFG, ECFG)
        sp = SamplingParams(max_new_tokens=12, temperature=1.0, seed=7,
                            mirostat=2, mirostat_tau=3.0, ignore_eos=True)
        a = eng.generate([1, 5, 9], sp).output_ids
        b = eng.generate([1, 5, 9], sp).output_ids
        assert a == b and len(a) == 12

    def test_mixed_batch_greedy_unaffected(self, params):
        eng0 = Engine(params, CFG, ECFG)
        want = eng0.generate(
            [4, 4, 4], SamplingParams(max_new_tokens=8, ignore_eos=True)
        ).output_ids
        eng = Engine(params, CFG, ECFG)
        r_miro = eng.submit(
            [1, 5, 9],
            SamplingParams(max_new_tokens=20, temperature=1.0, seed=3,
                           mirostat=2, ignore_eos=True),
        )
        r_greedy = eng.submit(
            [4, 4, 4], SamplingParams(max_new_tokens=8, ignore_eos=True)
        )
        while not (r_miro.finished and r_greedy.finished):
            eng.step()
        assert r_greedy.output_ids == want
        assert len(r_miro.output_ids) == 20

    def test_mu_survives_scheduling_events(self, params):
        """An admission mid-request forces a state re-upload; the
        running mirostat request's mu must not reset (device pull-back),
        i.e. the token stream matches an undisturbed run ONLY up to the
        re-upload — but stays sampled/finite and completes."""
        eng = Engine(params, CFG, ECFG)
        r1 = eng.submit(
            [1, 5, 9],
            SamplingParams(max_new_tokens=40, temperature=1.0, seed=9,
                           mirostat=2, ignore_eos=True),
        )
        eng.step()  # r1 decodes a burst; mu evolves on device
        mu_dev = float(np.asarray(eng._dstate[8])[r1.slot])
        assert mu_dev != 2.0 * 5.0  # adapted away from init
        r2 = eng.submit(
            [2, 2], SamplingParams(max_new_tokens=4, ignore_eos=True)
        )
        eng.step()  # admission -> re-upload; mu must carry over
        mu_dev2 = float(np.asarray(eng._dstate[8])[r1.slot])
        assert mu_dev2 != 2.0 * 5.0
        while not (r1.finished and r2.finished):
            eng.step()
        assert len(r1.output_ids) == 40

    def test_combo_rejections(self, params):
        eng = Engine(params, CFG, ECFG)
        with pytest.raises(ValueError, match="mirostat"):
            eng.submit([1, 2], SamplingParams(mirostat=2, logprobs_k=1))
        eng.token_pieces = ["x"] * CFG.vocab_size
        with pytest.raises(ValueError, match="mirostat"):
            eng.submit([1, 2], SamplingParams(mirostat=2, json_mode=True))
