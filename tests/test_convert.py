"""Converter / cache tests (reference analogs: tests/test_conversion.py,
test_caching.py, test_naive_converter.py). The logits-equality test would
have caught the safetensors stride-corruption bug (F-ordered pack)."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from wrinklefree_tpu.convert import compute_cache_key, convert_and_save
from wrinklefree_tpu.convert.cache_key import PACK_FORMAT
from wrinklefree_tpu.models.bitnet import KVCache, forward
from wrinklefree_tpu.models.loader import load_params
from wrinklefree_tpu.ops.ternary import pack_ternary_np, unpack_ternary_np

CFG_JSON = {
    "vocab_size": 256, "hidden_size": 128, "intermediate_size": 256,
    "num_hidden_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
    "head_dim": 32, "rms_norm_eps": 1e-5, "rope_theta": 500000.0,
    "max_position_embeddings": 256, "tie_word_embeddings": True,
    "hidden_act": "relu2",
}

DIMS = {
    "self_attn.q_proj": (128, 128), "self_attn.k_proj": (64, 128),
    "self_attn.v_proj": (64, 128), "self_attn.o_proj": (128, 128),
    "mlp.gate_proj": (256, 128), "mlp.up_proj": (256, 128),
    "mlp.down_proj": (128, 256),
}


def _make_model_dir(tmp_path, seed=0, dtype="ternary_float"):
    from safetensors.numpy import save_file

    d = tmp_path / "src"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(CFG_JSON))
    rng = np.random.default_rng(seed)
    t = {
        "model.embed_tokens.weight": rng.normal(0, 0.02, (256, 128)).astype(np.float32),
        "model.norm.weight": np.ones(128, np.float32),
    }
    for l in range(2):
        p = f"model.layers.{l}"
        for nm, (o, i) in DIMS.items():
            w = rng.integers(-1, 2, (o, i)).astype(np.int8)
            if dtype == "ternary_float":
                t[f"{p}.{nm}.weight"] = w.astype(np.float32)
            elif dtype == "hf_packed":
                planes = (w + 1).astype(np.uint8).reshape(4, o // 4, i)
                t[f"{p}.{nm}.weight"] = (
                    planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)
                )
            elif dtype == "dense_float":
                t[f"{p}.{nm}.weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
            t[f"{p}.{nm}.weight_scale"] = np.asarray([1.2], np.float32)
        t[f"{p}.input_layernorm.weight"] = np.ones(128, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(128, np.float32)
        t[f"{p}.self_attn.attn_sub_norm.weight"] = np.ones(128, np.float32)
        t[f"{p}.mlp.ffn_sub_norm.weight"] = np.ones(256, np.float32)
    save_file(t, str(d / "model.safetensors"))
    return d


def _logits(params, cfg, tokens):
    cache = KVCache.zeros(cfg, 1, 16)
    lg, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32)[None], cache,
                    jnp.zeros((1,), jnp.int32))
    return np.asarray(lg)


@pytest.mark.parametrize("src_fmt", ["ternary_float", "hf_packed"])
def test_convert_preserves_logits_exactly(tmp_path, src_fmt):
    src = _make_model_dir(tmp_path, dtype=src_fmt)
    out = tmp_path / "packed"
    convert_and_save(src, out)
    meta = json.loads((out / "cache_metadata.json").read_text())
    assert meta["format_version"] == PACK_FORMAT
    assert meta["packed_tensors"] == 14

    pa, cfg = load_params(out)
    pb, _ = load_params(src)
    la = _logits(pa, cfg, [1, 2, 3, 4])
    lb = _logits(pb, cfg, [1, 2, 3, 4])
    assert np.array_equal(la, lb), "converted cache changed the model"


def test_qweight_survives_safetensors_roundtrip(tmp_path):
    """Regression: F-ordered pack output + safetensors raw-buffer save
    silently corrupted caches."""
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(0)
    w = rng.integers(-1, 2, (64, 32)).astype(np.float32)  # [out, in]
    q = pack_ternary_np(w.T)
    assert q.flags["C_CONTIGUOUS"]
    f = tmp_path / "q.safetensors"
    save_file({"q": q}, str(f))
    qr = load_file(str(f))["q"]
    assert np.array_equal(qr, q)
    assert np.array_equal(unpack_ternary_np(qr), w.T.astype(np.int8))


def test_naive_ternarize_path(tmp_path):
    src = _make_model_dir(tmp_path, dtype="dense_float")
    out = tmp_path / "tern"
    convert_and_save(src, out, ternarize=True)
    pa, cfg = load_params(out)
    la = _logits(pa, cfg, [5, 6, 7])
    assert np.isfinite(la).all()


class TestCacheKey:
    def test_deterministic(self, tmp_path):
        d = _make_model_dir(tmp_path)
        assert compute_cache_key(str(d)) == compute_cache_key(str(d))

    def test_changes_with_revision_and_content(self, tmp_path):
        d = _make_model_dir(tmp_path)
        k0 = compute_cache_key(str(d))
        assert compute_cache_key(str(d), revision="v2") != k0
        (d / "config.json").write_text(json.dumps({**CFG_JSON, "vocab_size": 512}))
        assert compute_cache_key(str(d)) != k0

    def test_remote_id_key(self):
        k = compute_cache_key("microsoft/bitnet-b1.58-2B-4T")
        assert len(k) == 16


def test_get_cached_or_convert_local_hit(tmp_path, monkeypatch):
    import wrinklefree_tpu.convert.loader as L

    monkeypatch.setattr(L, "LOCAL_CACHE", tmp_path / "cache")
    src = _make_model_dir(tmp_path)
    out1 = L.get_cached_or_convert(str(src), skip_gcs=True)
    assert (out1 / "cache_metadata.json").exists()
    # second call must hit the local cache (no re-conversion): sentinel file
    (out1 / "sentinel").write_text("x")
    out2 = L.get_cached_or_convert(str(src), skip_gcs=True)
    assert out2 == out1 and (out2 / "sentinel").exists()


def test_llama_family_convert_and_load(tmp_path):
    """Naive-ternarized Llama checkpoint (SiLU, no sub-norm tensors,
    untied lm_head) converts, loads with placeholder sub-norms, and runs."""
    from safetensors.numpy import save_file

    d = tmp_path / "llama_src"
    d.mkdir()
    cfg_json = {
        **CFG_JSON,
        "model_type": "llama",
        "hidden_act": "silu",
        "tie_word_embeddings": False,
    }
    (d / "config.json").write_text(json.dumps(cfg_json))
    rng = np.random.default_rng(3)
    t = {
        "model.embed_tokens.weight": rng.normal(0, 0.02, (256, 128)).astype(np.float32),
        "lm_head.weight": rng.normal(0, 0.02, (256, 128)).astype(np.float32),
        "model.norm.weight": np.ones(128, np.float32),
    }
    for l in range(2):
        p = f"model.layers.{l}"
        for nm, (o, i) in DIMS.items():
            t[f"{p}.{nm}.weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
        t[f"{p}.input_layernorm.weight"] = np.ones(128, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(128, np.float32)
    save_file(t, str(d / "model.safetensors"))

    out = tmp_path / "llama_tern"
    convert_and_save(d, out, ternarize=True)
    params, cfg = load_params(out)
    assert cfg.mlp_act == "silu" and not cfg.sub_norms
    assert "lm_head" in params
    la = _logits(params, cfg, [5, 6, 7])
    assert np.isfinite(la).all()
