"""Load BitNet weights from HuggingFace safetensors into wf-tpu params.

Handles three on-disk formats (reference call path:
scripts/direct_inference_full.py:112-167, cache/bitnet_converter.py:117-187):
  1. HF BitNet checkpoints: `*.weight` uint8 [out/4, in] + `*.weight_scale`
  2. float ternary checkpoints (values round to {-1,0,+1})
  3. wf-tpu pre-packed caches: `*.qweight` uint8 [in/4, out] + `*.weight_scale`
All projections are repacked (vectorized) to the wf-tpu plane-major layout
and stacked on a leading [L] axis for `lax.scan`.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig
from ..ops.ternary import hf_packed_to_wf, pack_ternary_np

logger = logging.getLogger(__name__)

PROJS = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}

NORMS = {
    "input_ln": "input_layernorm.weight",
    "post_ln": "post_attention_layernorm.weight",
    "attn_sub": "self_attn.attn_sub_norm.weight",
    "ffn_sub": "mlp.ffn_sub_norm.weight",
}


def _load_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def _to_float(x: np.ndarray) -> np.ndarray:
    if x.dtype == np.uint16:  # safetensors numpy exposes bf16 as uint16
        return (
            x.astype(np.uint32) << 16
        ).view(np.float32)
    return x.astype(np.float32)


def _proj_to_wf(tensors: Dict[str, np.ndarray], base: str):
    """Return (qweight [K/4,N] uint8, weight_scale float32) for one proj."""
    if f"{base}.qweight" in tensors:  # wf-tpu pre-packed cache
        return tensors[f"{base}.qweight"], np.float32(
            _to_float(tensors[f"{base}.weight_scale"]).reshape(-1)[0]
        )
    w = tensors[f"{base}.weight"]
    scale_t = tensors.get(f"{base}.weight_scale")
    scale = np.float32(_to_float(scale_t).reshape(-1)[0]) if scale_t is not None else np.float32(1.0)
    if w.dtype == np.uint8:  # HF packed [out/4, in]
        return hf_packed_to_wf(w), scale
    # float ternary [out, in]
    wf = _to_float(w)
    return pack_ternary_np(wf.T), scale


def load_params(model_path: str | Path, cfg: BitNetConfig | None = None, dtype=jnp.bfloat16):
    """Load a model directory -> (params, config)."""
    path = Path(model_path)
    if cfg is None:
        cfg = BitNetConfig.from_hf_config(path)
    tensors = _load_safetensors_dir(path)

    def bf16(name):
        return jnp.asarray(_to_float(tensors[name]), dtype)

    layers: Dict[str, list] = {k: [] for k in list(PROJS) + list(NORMS)}
    scales: Dict[str, list] = {k: [] for k in PROJS}
    sub_dims = {"attn_sub": cfg.q_dim, "ffn_sub": cfg.intermediate_size}
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}"
        for short, sub in NORMS.items():
            key = f"{prefix}.{sub}"
            if key not in tensors and short in sub_dims:
                # Llama-family ternary conversions have no sub-norms
                # (cfg.sub_norms False); keep placeholder ones so the
                # scanned layer pytree stays uniform.
                layers[short].append(np.ones((sub_dims[short],), np.float32))
            else:
                layers[short].append(_to_float(tensors[key]))
        for short, sub in PROJS.items():
            qw, sc = _proj_to_wf(tensors, f"{prefix}.{sub}")
            layers[short].append(qw)
            scales[short].append(sc)
        if (i + 1) % 10 == 0:
            logger.info("loaded %d/%d layers", i + 1, cfg.num_layers)

    stacked = {}
    for short in NORMS:
        stacked[short] = jnp.asarray(np.stack(layers[short]), dtype)
    for short in PROJS:
        stacked[f"{short}_qw"] = jnp.asarray(np.stack(layers[short]))
        stacked[f"{short}_scale"] = jnp.asarray(np.asarray(scales[short], np.float32))

    params = {
        "embed": bf16("model.embed_tokens.weight"),
        "final_norm": bf16("model.norm.weight"),
        "layers": stacked,
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in tensors:
        params["lm_head"] = bf16("lm_head.weight")
    return params, cfg


def load_tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(str(model_path))
