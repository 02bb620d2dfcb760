"""YAML config tier + architecture-family knobs.

Reference analog: hydra-loaded configs/{serving,models,sparsity,attention}
(SURVEY.md §5.6) and the naive-converted Llama family (SiLU, no sub-norms).
"""

import jax.numpy as jnp
import numpy as np

from wrinklefree_tpu.config import (
    BitNetConfig,
    activation_sparsity_from_yaml,
    attention_sparsity_from_yaml,
    engine_config_from_yaml,
    load_yaml,
    model_config_from_yaml,
)
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params


def test_serving_yaml_loads():
    ecfg = engine_config_from_yaml("serving/default.yaml")
    assert ecfg.page_size == 16
    assert ecfg.max_context == 4096
    assert ecfg.enable_radix_cache


def test_model_card_matches_canonical():
    cfg = model_config_from_yaml("models/bitnet_2b.yaml")
    assert cfg == BitNetConfig.bitnet_2b()


def test_sparsity_yaml_presets():
    assert activation_sparsity_from_yaml("sparsity/default.yaml") is None
    q = activation_sparsity_from_yaml("sparsity/qsparse.yaml")
    assert q.sparsity_ratio == 0.6 and q.mode == "top_k"
    safe = activation_sparsity_from_yaml("sparsity/inference_safe.yaml")
    assert safe.sparsity_ratio == 0.3


def test_attention_yaml_presets():
    assert attention_sparsity_from_yaml("attention/default.yaml") is None
    w = attention_sparsity_from_yaml("attention/window.yaml")
    assert w.mode == "window" and w.window_size == 256 and w.stride == 64
    d = attention_sparsity_from_yaml("attention/dynamic.yaml")
    assert d.min_keep_frac == 0.1 and d.max_keep_frac == 0.5


def test_serving_yaml_sampling_section():
    doc = load_yaml("serving/default.yaml")
    assert doc["sampling"]["temperature"] == 0.7


def test_llama_family_forward():
    """SiLU MLP + no sub-norms (naive-converted Llama) runs and differs
    from the BitNet-variant forward on identical params."""
    base = BitNetConfig.tiny()
    llama = BitNetConfig(
        **{
            **{f: getattr(base, f) for f in (
                "vocab_size", "hidden_size", "intermediate_size", "num_layers",
                "num_heads", "num_kv_heads", "head_dim", "max_position",
            )},
            "mlp_act": "silu",
            "sub_norms": False,
        }
    )
    params = init_params(base, seed=0)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = KVCache.zeros(base, 1, 8)
    start = jnp.zeros((1,), jnp.int32)
    out_bitnet, _ = forward(params, base, tokens, cache, start)
    out_llama, _ = forward(params, llama, tokens, cache, start)
    assert np.isfinite(np.asarray(out_llama)).all()
    assert not np.allclose(np.asarray(out_bitnet), np.asarray(out_llama))


def test_llama3_8b_ternary_config():
    cfg = BitNetConfig.llama3_8b_ternary()
    assert cfg.mlp_act == "silu" and not cfg.sub_norms
    assert cfg.hidden_size == 4096 and cfg.num_kv_heads == 8
