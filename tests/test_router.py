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
