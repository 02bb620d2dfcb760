"""Model-level MoE: the full BitNet forward with MoE MLPs, the fake-MoE
identity oracle at model granularity, and MoE-under-continuous-batching
(reference tests/test_batching.py:304-378 MoE-under-batch; the oracle
extends reference moe/fake_moe.py:232-277 from one layer to the model)."""

import jax.numpy as jnp
import numpy as np
import pytest

import wrinklefree_tpu.models.moe as M
from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

MOE_CFG = BitNetConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_position=256,
    num_experts=4, num_experts_per_tok=2,
)
DENSE_CFG = BitNetConfig(
    **{**{f: getattr(MOE_CFG, f) for f in (
        "vocab_size", "hidden_size", "intermediate_size", "num_layers",
        "num_heads", "num_kv_heads", "head_dim", "max_position")},
       "num_experts": 0},
)


def _logits(params, cfg, tokens):
    cache = KVCache.zeros(cfg, 1, 16)
    lg, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32)[None], cache,
                    jnp.zeros((1,), jnp.int32))
    return np.asarray(lg, np.float32)


class TestMoEForward:
    def test_params_have_expert_stacks(self):
        params = init_params(MOE_CFG, seed=0)
        lyr = params["layers"]
        assert lyr["moe_gate_qw"].shape[:2] == (2, 4)
        assert lyr["router"].shape == (2, 128, 4)
        assert "gate_qw" not in lyr

    def test_forward_runs_and_varies(self):
        params = init_params(MOE_CFG, seed=0)
        la = _logits(params, MOE_CFG, [1, 2, 3, 4])
        lb = _logits(params, MOE_CFG, [5, 6, 7, 8])
        assert np.isfinite(la).all()
        assert not np.allclose(la[:, -1], lb[:, -1])

    def test_fast_init_moe(self):
        big = BitNetConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=50, num_heads=8, num_kv_heads=4, head_dim=32,
            num_experts=4,
        )  # crosses the fast-init threshold
        params = init_params(big, seed=0)
        assert params["layers"]["moe_up_qw"].shape[:2] == (50, 4)


class TestModelLevelIdentityOracle:
    def test_moe_model_matches_dense_model(self):
        """Dense model -> fake-MoE model (replicated experts + identity
        -leaning router): logits must match the dense model closely (the
        top-k weighted combine of identical experts is exact up to bf16
        combine rounding)."""
        dense = init_params(DENSE_CFG, seed=0)
        moe = {
            "embed": dense["embed"],
            "final_norm": dense["final_norm"],
            "layers": dict(dense["layers"]),
        }
        lyr = moe["layers"]
        E = MOE_CFG.num_experts
        for n in ("gate", "up", "down"):
            qw = lyr.pop(f"{n}_qw")
            sc = lyr.pop(f"{n}_scale")
            lyr[f"moe_{n}_qw"] = jnp.broadcast_to(
                qw[:, None], (qw.shape[0], E) + qw.shape[1:]
            )
            lyr[f"moe_{n}_scale"] = jnp.broadcast_to(sc[:, None], (sc.shape[0], E))
        lyr["router"] = jnp.zeros((DENSE_CFG.num_layers, DENSE_CFG.hidden_size, E))

        la = _logits(dense, DENSE_CFG, [1, 2, 3, 4])
        lb = _logits(moe, MOE_CFG, [1, 2, 3, 4])
        np.testing.assert_allclose(lb, la, atol=0.05, rtol=0)


class TestMoEUnderBatching:
    def test_engine_serves_moe_model(self):
        params = init_params(MOE_CFG, seed=0)
        eng = Engine(
            params, MOE_CFG,
            EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                         max_context=64, prefill_buckets=(8, 16, 32)),
        )
        a = eng.generate([1, 5, 9, 2], SamplingParams(max_new_tokens=6))
        b = eng.generate([1, 5, 9, 2], SamplingParams(max_new_tokens=6))
        assert a.output_ids == b.output_ids  # deterministic
        assert len(a.output_ids) == 6

    def test_moe_concurrent_requests_match_sequential(self):
        import threading

        params = init_params(MOE_CFG, seed=0)
        eng = Engine(
            params, MOE_CFG,
            EngineConfig(max_batch_slots=4, page_size=8, num_pages=128,
                         max_context=64, prefill_buckets=(8, 16, 32)),
        )
        prompts = [[1 + i, 2, 3] for i in range(4)]
        seq = [eng.generate(p, SamplingParams(max_new_tokens=4)).output_ids
               for p in prompts]
        results = [None] * 4

        def worker(i):
            results[i] = eng.generate(prompts[i], SamplingParams(max_new_tokens=4))

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert [r.output_ids for r in results] == seq


class TestInt8Logits:
    def test_quality_and_engine(self):
        from wrinklefree_tpu.models.bitnet import quantize_lm_head

        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        exact = _logits(params, cfg, [1, 2, 3, 4])
        q = quantize_lm_head(params, cfg)
        approx = _logits(q, cfg, [1, 2, 3, 4])
        a, b = exact.ravel(), approx.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos >= 0.999, cos
        # greedy choice at the last position should be preserved
        assert exact[0, -1].argmax() == approx[0, -1].argmax()

        eng = Engine(
            params, cfg,
            EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                         max_context=64, prefill_buckets=(8, 16),
                         int8_logits=True),
        )
        out = eng.generate([1, 5, 9], SamplingParams(max_new_tokens=4))
        assert len(out.output_ids) == 4
