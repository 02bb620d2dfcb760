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

    def test_tp2_exact_head_matches_single_device(self):
        # exact_head_k under TP (vocab-sharded int8 scan + pmax/pmin
        # combine) must stay token-identical to the single-device engine
        import dataclasses

        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        ecfg = dataclasses.replace(ECFG, exact_head_k=8)
        ref = Engine(params, CFG, ECFG)  # plain bf16-head reference
        tp = Engine(params, CFG, ecfg, mesh=mesh)
        for prompt in ([1, 5, 9, 2, 7], [3, 3, 4]):
            a = ref.generate(prompt, SamplingParams(max_new_tokens=8))
            b = tp.generate(prompt, SamplingParams(max_new_tokens=8))
            assert b.output_ids == a.output_ids, (a.output_ids, b.output_ids)

    def test_tp2_exact_head_sampling_matches_single_device(self):
        # the ek burst's sampling branch (full bf16 head + all_gather)
        import dataclasses

        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        ecfg = dataclasses.replace(ECFG, exact_head_k=8)
        ref = Engine(params, CFG, ecfg)
        tp = Engine(params, CFG, ecfg, mesh=mesh)
        sp = SamplingParams(max_new_tokens=6, temperature=0.9, seed=11)
        a = ref.generate([2, 4, 6], sp)
        b = tp.generate([2, 4, 6], sp)
        assert a.output_ids == b.output_ids

    def test_tp2_moe_matches_single_device(self):
        # MoE under the TP engine: the model axis doubles as the EP axis
        # (experts sharded, combines psum'd) — token-identical to the
        # single-device MoE engine (VERDICT r1 items 4+8; reference
        # tests/test_batching.py:304-378 MoE-under-batch)
        mesh = _mesh_or_skip(2)
        moe_cfg = BitNetConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256, num_experts=4, num_experts_per_tok=2,
        )
        params = init_params(moe_cfg, seed=0)
        ref = Engine(params, moe_cfg, ECFG)
        tp = Engine(params, moe_cfg, ECFG, mesh=mesh)
        for prompt in ([1, 5, 9, 2, 7], [3, 3, 4]):
            a = ref.generate(prompt, SamplingParams(max_new_tokens=8))
            b = tp.generate(prompt, SamplingParams(max_new_tokens=8))
            assert b.output_ids == a.output_ids, (a.output_ids, b.output_ids)

    def test_tp_moe_rejects_bad_expert_split(self):
        mesh = _mesh_or_skip(4)  # 4 does not divide 6 experts
        moe_cfg = BitNetConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=1, num_heads=4, num_kv_heads=4, head_dim=32,
            max_position=256, num_experts=6, num_experts_per_tok=2,
        )
        with pytest.raises(ValueError):
            Engine(init_params(moe_cfg, seed=0), moe_cfg, ECFG, mesh=mesh)

    def test_tp2_int8_logits_matches_single_device(self):
        import dataclasses

        mesh = _mesh_or_skip(2)
        params = init_params(CFG, seed=0)
        ecfg = dataclasses.replace(ECFG, int8_logits=True)
        ref = Engine(params, CFG, ecfg)
        tp = Engine(params, CFG, ecfg, mesh=mesh)
        for prompt in ([1, 5, 9, 2, 7], [3, 3, 4]):
            a = ref.generate(prompt, SamplingParams(max_new_tokens=8))
            b = tp.generate(prompt, SamplingParams(max_new_tokens=8))
            assert b.output_ids == a.output_ids, (a.output_ids, b.output_ids)


# The REAL flagship head geometry: 20 Q / 5 KV heads (reference
# legacy/src/models/bitnet.py:27-37), reduced hidden/vocab for CPU. tp=2/4
# does not divide 5 KV heads -> the engine replicates KV (pools + k/v
# projections) while Q/o/gate/up/down/embed stay sharded
# (parallel/sharding.tp_kv_replicated). VERDICT r3 item 3.
FLAGSHIP_CFG = BitNetConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=20, num_kv_heads=5, head_dim=8,
    max_position=256,
)


class TestTPFlagshipGeometry:
    def _check(self, tp, ecfg=ECFG, **sp_kw):
        mesh = _mesh_or_skip(tp)
        params = init_params(FLAGSHIP_CFG, seed=0)
        ref = Engine(params, FLAGSHIP_CFG, ecfg)
        eng = Engine(params, FLAGSHIP_CFG, ecfg, mesh=mesh)
        assert eng._tp_kv_rep
        for prompt in ([1, 5, 9, 2, 7], [3, 3, 4]):
            a = ref.generate(prompt, SamplingParams(max_new_tokens=8, **sp_kw))
            b = eng.generate(prompt, SamplingParams(max_new_tokens=8, **sp_kw))
            assert b.output_ids == a.output_ids, (a.output_ids, b.output_ids)

    def test_tp2_kv_replicated_matches_single_device(self):
        self._check(2)

    def test_tp4_kv_replicated_matches_single_device(self):
        self._check(4)

    def test_tp4_sampling_matches_single_device(self):
        self._check(4, temperature=0.9, seed=13)

    def test_tp4_exact_head_matches_single_device(self):
        import dataclasses

        self._check(4, ecfg=dataclasses.replace(ECFG, exact_head_k=8))

    def test_tp5_divides_kv_heads_no_replication(self):
        # tp=5 divides both 20 and 5: the sharded-KV path must engage
        # (vocab/inter adjusted to be 5-divisible)
        cfg5 = BitNetConfig(
            vocab_size=250, hidden_size=64, intermediate_size=160,
            num_layers=2, num_heads=20, num_kv_heads=5, head_dim=8,
            max_position=256,
        )
        mesh = _mesh_or_skip(5)
        params = init_params(cfg5, seed=0)
        ref = Engine(params, cfg5, ECFG)
        eng = Engine(params, cfg5, ECFG, mesh=mesh)
        assert not eng._tp_kv_rep
        a = ref.generate([1, 5, 9], SamplingParams(max_new_tokens=8))
        b = eng.generate([1, 5, 9], SamplingParams(max_new_tokens=8))
        assert b.output_ids == a.output_ids
