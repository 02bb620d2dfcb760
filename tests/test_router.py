"""DP replica router + multihost helpers (SURVEY.md §2.3 DP row)."""

import threading

import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params
from wrinklefree_tpu.parallel import ReplicaRouter, global_mesh, init_multihost

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16, 32))


@pytest.fixture(scope="module")
def router():
    params = init_params(CFG, seed=0)
    return ReplicaRouter([Engine(params, CFG, ECFG) for _ in range(2)])


class TestReplicaRouter:
    def test_replicas_agree(self, router):
        outs = [router.generate([1, 2, 3], SamplingParams(max_new_tokens=6)).output_ids
                for _ in range(4)]
        assert all(o == outs[0] for o in outs), "replicas diverge"

    def test_spreads_load(self, router):
        # saturate replica 0's slots, then the next pick must be replica 1
        e0 = router.engines[0]
        r = e0.submit([1, 2, 3], SamplingParams(max_new_tokens=2))
        assert router.pick() is not e0 or router._load(e0) == 0
        while not r.finished:
            e0.step()

    def test_concurrent_generate(self, router):
        results = [None] * 8

        def worker(i):
            results[i] = router.generate([1 + i, 2, 3], SamplingParams(max_new_tokens=4))

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r is not None and len(r.output_ids) <= 4 for r in results)

    def test_aggregated_stats(self, router):
        s = router.stats
        assert s["replicas"] == 2 and s["requests"] >= 4


class TestMultihost:
    def test_single_process_noop(self):
        pid, n = init_multihost()
        assert (pid, n) == (0, 1)

    def test_global_mesh_shapes(self):
        import jax

        mesh = global_mesh(dp=2, tp=4)
        assert mesh.shape == {"data": 2, "model": 4}
        with pytest.raises(ValueError):
            global_mesh(dp=3, tp=4)
        # default: tp = local devices
        m2 = global_mesh()
        assert m2.shape["model"] == jax.local_device_count()


class TestCacheAwareRouting:
    """Cache-aware DP routing: a request whose prompt has a cached
    prefix on some replica routes there (within the load slack);
    fresh prompts still spread least-loaded."""

    def _mk(self):
        params = init_params(CFG, seed=0)
        return ReplicaRouter([Engine(params, CFG, ECFG) for _ in range(2)])

    def test_routes_to_cached_replica(self):
        router = self._mk()
        shared = list(range(1, 25))  # 24 tokens = 3 full pages
        # warm replica 1 directly so its radix holds the prefix
        e1 = router.engines[1]
        e1.generate(shared + [30], SamplingParams(max_new_tokens=4))
        assert e1.prefix_match_len(shared) >= 16
        # router must prefer the cached replica despite round-robin
        for _ in range(3):
            assert router.pick(shared + [31]) is e1
        hits0 = e1.stats["radix_hit_tokens"]
        r = router.generate(shared + [31], SamplingParams(max_new_tokens=4))
        assert e1.stats["radix_hit_tokens"] > hits0
        assert len(r.output_ids) == 4

    def test_fresh_prompts_spread(self):
        router = self._mk()
        picks = {id(router.pick([7, 7, 7])) for _ in range(4)}
        assert len(picks) == 2  # no cached prefix anywhere: round-robin

    def test_load_slack_bounds_hotspotting(self):
        router = self._mk()
        router.load_slack = 0
        shared = list(range(1, 25))
        e1 = router.engines[1]
        e1.generate(shared + [30], SamplingParams(max_new_tokens=2))
        # pile queue depth onto the cached replica beyond the slack
        held = [e1.submit([40 + i], SamplingParams(max_new_tokens=2))
                for i in range(3)]
        assert router.pick(shared + [31]) is router.engines[0]
        while not all(h.finished for h in held):
            e1.step()

    def test_cache_aware_off(self):
        params = init_params(CFG, seed=0)
        router = ReplicaRouter(
            [Engine(params, CFG, ECFG) for _ in range(2)],
            cache_aware=False,
        )
        shared = list(range(1, 25))
        router.engines[1].generate(shared + [30],
                                   SamplingParams(max_new_tokens=2))
        picks = {id(router.pick(shared + [31])) for _ in range(4)}
        assert len(picks) == 2  # pure least-loaded/round-robin
