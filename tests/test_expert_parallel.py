"""Expert-parallel (all-to-all) MoE vs single-device dense dispatch.

BASELINE.json config 5: experts sharded across hosts. Runs on the
virtual 8-device CPU mesh (conftest); the same shard_map program scales
to real multi-host meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import wrinklefree_tpu.models.moe as M
from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.parallel.expert import (
    _bucket_assignments,
    capacity_for,
    ep_moe_ffn,
    make_ep_moe,
)

CFG = BitNetConfig.tiny()


def _mesh(n, axis="expert"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), (axis,))


class TestBucketing:
    def test_capacity_formula(self):
        assert capacity_for(16, 2, 8, 1.0) == 4
        assert capacity_for(3, 1, 8, 1.0) == 1

    def test_positions_unique_per_expert(self):
        top_i = jnp.asarray([[0, 1], [0, 2], [0, 1], [3, 0]], jnp.int32)
        pos, keep = _bucket_assignments(top_i, 4, capacity=8)
        # expert 0 receives 4 assignments in arrival order
        e0_pos = [int(pos[0, 0]), int(pos[1, 0]), int(pos[2, 0]), int(pos[3, 1])]
        assert e0_pos == [0, 1, 2, 3]
        assert bool(keep.all())

    def test_overflow_dropped(self):
        top_i = jnp.zeros((5, 1), jnp.int32)  # all to expert 0
        pos, keep = _bucket_assignments(top_i, 2, capacity=3)
        assert int(keep.sum()) == 3
        assert not bool(keep[3, 0]) and not bool(keep[4, 0])


class TestEPEquivalence:
    def _setup(self, E=8, T=32, seed=0):
        experts, router = M.init_moe_experts(CFG, E, seed=seed)
        rng = np.random.default_rng(seed)
        ffn_sub = jnp.ones((CFG.intermediate_size,), CFG.dtype)
        x = jnp.asarray(rng.normal(size=(T, CFG.hidden_size)), CFG.dtype)
        return x, experts, ffn_sub, router

    def test_ep_matches_dense_dispatch(self):
        """All-to-all EP over 4 devices == single-device dense dispatch
        (capacity large enough that nothing drops)."""
        mesh = _mesh(4)
        x, experts, ffn_sub, router = self._setup(E=8, T=32)
        y_ref, aux_ref = M.moe_ffn(x, experts, ffn_sub, router, top_k=2)

        apply = make_ep_moe(mesh, experts, ffn_sub, router,
                            top_k=2, capacity_factor=8.0)
        y_ep, aux_ep = apply(x)
        # bf16 reductions compile differently per program shape: allow a
        # couple of ulps, nothing more
        np.testing.assert_allclose(
            np.asarray(y_ep, np.float32), np.asarray(y_ref, np.float32),
            atol=8e-3, rtol=0,
        )
        # aux is pmean of per-shard losses (not the global-batch loss):
        # same scale, small statistical difference
        assert abs(float(aux_ep) - float(aux_ref)) < 0.1

    def test_ep_identity_router_oracle(self):
        """Fake-MoE identity oracle survives the all-to-all path: EP MoE
        with replicated dense weights == dense FFN (reference
        moe/fake_moe.py:232-277 extended to EP)."""
        mesh = _mesh(4)
        rng = np.random.default_rng(0)
        dense, _ = M.init_moe_experts(CFG, 1, seed=1)
        dense_layer = {k: v[0] for k, v in dense.items()}
        ffn_sub = jnp.ones((CFG.intermediate_size,), CFG.dtype)
        x = jnp.asarray(rng.normal(size=(16, CFG.hidden_size)), CFG.dtype)

        dense_out = M._expert_ffn(x, dense_layer, ffn_sub, CFG.rms_norm_eps)

        E = 4
        experts = M.make_fake_moe(
            {**{k: dense_layer[k] for k in dense_layer}}, E
        )
        # router strongly prefers expert 0 for every token
        router = jnp.zeros((CFG.hidden_size, E), jnp.float32)

        def body(x, experts, ffn_sub, router):
            T = x.shape[0]
            route = M.identity_route(T, 1, expert=0)
            return ep_moe_ffn(
                x, experts, ffn_sub, router, ep_axis="expert", top_k=1,
                capacity_factor=float(E), eps=CFG.rms_norm_eps,
                route_override=route,
            )

        from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        ex_specs = jax.tree.map(lambda _: P("expert"), experts)
        experts = jax.device_put(
            experts, jax.tree.map(lambda s: NamedSharding(mesh, s), ex_specs)
        )
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P("expert"), ex_specs, P(), P()),
            out_specs=(P("expert"), P()),
            check_rep=False,
        )
        y, _ = jax.jit(fn)(
            jax.device_put(x, NamedSharding(mesh, P("expert"))),
            experts,
            jax.device_put(ffn_sub, NamedSharding(mesh, P())),
            jax.device_put(router, NamedSharding(mesh, P())),
        )
        # integer matmuls are exact; the only wiggle is rms_norm's f32 row
        # reduction order under vmap (<= 2 bf16 ulps)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(dense_out, np.float32),
            atol=8e-3, rtol=0,
        )

    def test_capacity_drops_degrade_gracefully(self):
        """Tiny capacity: output stays finite and differs from the
        no-drop result (tokens lose expert contributions, not crash)."""
        mesh = _mesh(4)
        x, experts, ffn_sub, router = self._setup(E=8, T=32)
        tight = make_ep_moe(mesh, experts, ffn_sub, router,
                            top_k=2, capacity_factor=0.25)
        y, _ = tight(x)
        assert np.isfinite(np.asarray(y, np.float32)).all()
