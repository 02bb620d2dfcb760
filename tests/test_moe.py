"""MoE tests (reference tests/test_moe.py analog): router normalization,
identity-router oracle (bit-identical to dense), aux loss, and
expert-parallel equivalence on a virtual mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models import moe as M
from wrinklefree_tpu.models.bitnet import init_params

CFG = BitNetConfig.tiny()


@pytest.fixture(scope="module")
def dense_layer():
    params = init_params(CFG, seed=0)
    L = params["layers"]
    return {
        **{f"{n}_qw": L[f"{n}_qw"][0] for n in ("gate", "up", "down")},
        **{f"{n}_scale": L[f"{n}_scale"][0] for n in ("gate", "up", "down")},
        "ffn_sub": L["ffn_sub"][0],
    }


class TestRouters:
    def test_topk_weights_normalized(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        w, i = M.top_k_route(logits, 2)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
        assert np.asarray(i).max() < 8 and np.asarray(i).min() >= 0
        # top-1 expert is the argmax
        assert np.array_equal(np.asarray(i)[:, 0], np.asarray(logits).argmax(-1))

    def test_jitter_changes_routing_sometimes(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(64, 8)) * 0.01, jnp.float32)
        _, i0 = M.top_k_route(logits, 1)
        _, i1 = M.top_k_route(logits, 1, jitter=0.05, rng=jax.random.PRNGKey(0))
        assert (np.asarray(i0) != np.asarray(i1)).any()

    def test_identity_route(self):
        w, i = M.identity_route(5, 2, expert=3)
        assert np.all(np.asarray(w)[:, 0] == 1.0) and np.all(np.asarray(i) == 3)

    def test_load_balancing_loss_uniform_is_one(self):
        """Perfectly uniform routing gives loss == 1 (Switch convention)."""
        T, E = 64, 4
        probs = jnp.full((T, E), 1.0 / E)
        idx = jnp.asarray(np.arange(T) % E, jnp.int32)[:, None]
        loss = M.load_balancing_loss(probs, idx, E)
        np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)

    def test_load_balancing_loss_penalizes_collapse(self):
        T, E = 64, 4
        probs = jnp.zeros((T, E)).at[:, 0].set(1.0)
        idx = jnp.zeros((T, 1), jnp.int32)
        loss = M.load_balancing_loss(probs, idx, E)
        assert float(loss) == pytest.approx(4.0)


class TestFakeMoEOracle:
    def test_identity_router_bit_identical(self, dense_layer):
        """THE MoE correctness gate (reference moe/fake_moe.py:232-277)."""
        assert M.verify_moe_matches_dense(dense_layer, CFG, num_experts=4, tol=0.0)

    def test_real_routing_differs_from_dense(self, dense_layer):
        experts, router = M.init_moe_experts(CFG, 4, seed=7)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, CFG.hidden_size)), CFG.dtype)
        y, aux = M.moe_ffn(x, experts, dense_layer["ffn_sub"], router, top_k=2)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y, np.float32)).all()
        assert float(aux) > 0


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
class TestExpertParallel:
    def test_ep_matches_single_device(self, dense_layer):
        """EP over a 4-device mesh == unsharded MoE (SURVEY.md §2.3 EP row)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        E = 8
        experts, router = M.init_moe_experts(CFG, E, seed=3)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(16, CFG.hidden_size)), CFG.dtype)

        y_ref, aux_ref = M.moe_ffn(
            x, experts, dense_layer["ffn_sub"], router, top_k=2
        )

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
        ex_specs = {k: P("expert") for k in experts}
        experts_sh = jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), experts, ex_specs
        )

        def body(x, experts, ffn_sub, router):
            return M.moe_ffn(
                x, experts, ffn_sub, router, top_k=2, ep_axis="expert",
                eps=CFG.rms_norm_eps,
            )

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), ex_specs, P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )
        y_ep, aux_ep = fn(x, experts_sh, dense_layer["ffn_sub"], router)
        np.testing.assert_allclose(
            np.asarray(y_ep, np.float32), np.asarray(y_ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-5)
