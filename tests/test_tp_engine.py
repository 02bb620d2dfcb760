"""Tensor-parallel serving engine (BASELINE config 4: TP-sharded model
behind the continuous-batching engine). The TP engine on a virtual mesh
must reproduce the single-device engine's greedy outputs."""

import jax
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params
from wrinklefree_tpu.parallel.sharding import make_mesh

CFG = BitNetConfig.tiny()  # 4 heads / 2 kv heads: tp=2 divides both
ECFG = EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16, 32))


def _mesh_or_skip(tp):
    if len(jax.devices()) < tp:
        pytest.skip(f"need {tp} devices")
    return make_mesh(1, tp)


class TestTPEngine:
    def test_tp2_matches_single_device(self):
        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        ref = Engine(params, CFG, ECFG)
        tp = Engine(params, CFG, ECFG, mesh=mesh)

        for prompt in ([1, 5, 9, 2, 7], [3, 3, 4]):
            a = ref.generate(prompt, SamplingParams(max_new_tokens=8))
            b = tp.generate(prompt, SamplingParams(max_new_tokens=8))
            assert b.output_ids == a.output_ids, (a.output_ids, b.output_ids)

    def test_tp2_seeded_sampling_reproducible(self):
        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        tp = Engine(params, CFG, ECFG, mesh=mesh)
        sp = SamplingParams(max_new_tokens=6, temperature=0.9, seed=11)
        a = tp.generate([2, 4, 6], sp)
        b = tp.generate([2, 4, 6], sp)
        assert a.output_ids == b.output_ids

    def test_tp_rejects_bad_head_split(self):
        mesh = _mesh_or_skip(8)  # tiny has 2 kv heads: tp=8 invalid
        with pytest.raises(ValueError):
            Engine(init_params(CFG, seed=0), CFG, ECFG, mesh=mesh)

    def test_tp2_radix_reuse(self):
        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        tp = Engine(params, CFG, ECFG, mesh=mesh)
        p = [1, 5, 9, 2, 7, 3, 4, 8]
        tp.generate(p, SamplingParams(max_new_tokens=8))
        tp.generate(p + [6], SamplingParams(max_new_tokens=4))
        assert tp.stats["radix_hit_tokens"] >= 8
