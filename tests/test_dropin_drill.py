"""Real-weight drop-in drill (VERDICT r3 item 8).

Fabricates a COMPLETE HuggingFace snapshot directory — HF-packed ternary
safetensors + config.json + tokenizer.json + tokenizer_config.json, the
exact artifact set `snapshot_download` would produce for the real
BitNet-2B checkpoint (reference cache/loader.py:16-65 fetch pipeline) —
then drives the full user pipeline as ONE flow:

    cli convert -> cli validate-model -> cli serve -> client chat

so dropping in the real checkpoint is a pure weight substitution
(egress-blocked here; FIDELITY.md documents the remaining delta).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import requests

pytest.importorskip("safetensors")
pytest.importorskip("tokenizers")
pytest.importorskip("transformers")

from wrinklefree_tpu.cli import main as cli_main

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


def _fabricate_snapshot(d):
    """A genuine HF snapshot dir: packed-uint8 ternary weights in the
    checkpoint's plane layout + config + real fast tokenizer."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(CFG_JSON))

    rng = np.random.default_rng(7)
    t = {
        "model.embed_tokens.weight":
            rng.normal(0, 0.02, (256, 128)).astype(np.float32),
        "model.norm.weight": np.ones(128, np.float32),
    }
    for l in range(2):
        p = f"model.layers.{l}"
        for nm, (o, i) in DIMS.items():
            w = rng.integers(-1, 2, (o, i)).astype(np.int8)
            planes = (w + 1).astype(np.uint8).reshape(4, o // 4, i)
            t[f"{p}.{nm}.weight"] = (
                planes[0] | (planes[1] << 2) | (planes[2] << 4)
                | (planes[3] << 6)
            )
            t[f"{p}.{nm}.weight_scale"] = np.asarray([1.1], np.float32)
        t[f"{p}.input_layernorm.weight"] = np.ones(128, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(128, np.float32)
        t[f"{p}.self_attn.attn_sub_norm.weight"] = np.ones(128, np.float32)
        t[f"{p}.mlp.ffn_sub_norm.weight"] = np.ones(256, np.float32)
    save_file(t, str(d / "model.safetensors"))

    words = (
        "<unk> <s> </s> hello world the quick brown fox jumps over lazy "
        "dog say please thanks a b c d e . , ! ?"
    ).split()
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "unk_token": "<unk>", "bos_token": "<s>", "eos_token": "</s>",
        "clean_up_tokenization_spaces": False,
    }))
    return d


def test_dropin_pipeline_convert_validate_serve_chat(tmp_path):
    src = _fabricate_snapshot(tmp_path / "snapshot")
    dst = tmp_path / "packed"

    # 1. cli convert (HF snapshot -> wf-packed cache dir)
    cli_main(["convert", str(src), str(dst)])
    assert (dst / "config.json").exists()
    assert (dst / "tokenizer.json").exists()
    assert any(f.suffix == ".safetensors" for f in dst.iterdir())

    # 2. cli validate-model (exits 0 on a valid artifact)
    with pytest.raises(SystemExit) as ex:
        cli_main(["validate-model", str(dst)])
    assert ex.value.code == 0

    # 3. cli serve (real subprocess, CPU platform, converted artifact)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp_tests"))
    proc = subprocess.Popen(
        [sys.executable, "-m", "wrinklefree_tpu.cli", "serve",
         "--model", str(dst), "--port", str(port), "--platform", "cpu"],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        env=env, start_new_session=True,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        for _ in range(300):
            if proc.poll() is not None:
                pytest.fail(
                    f"server died rc={proc.returncode}: "
                    f"{proc.stderr.read()[-2000:]}"
                )
            try:
                if requests.get(f"{url}/health", timeout=1).status_code == 200:
                    break
            except requests.RequestException:
                time.sleep(0.5)
        else:
            pytest.fail("server did not come up in 150s")

        # /v1/models reports the converted artifact
        models = requests.get(f"{url}/v1/models", timeout=5).json()
        assert models["data"], models

        # 4. client chat through the OpenAI-compatible client
        from wrinklefree_tpu.client import InferenceClient

        c = InferenceClient(url)
        assert c.health()
        out = c.chat(
            [{"role": "user", "content": "hello world say hello"}],
            max_tokens=8, temperature=0.0,
        )
        assert isinstance(out, str)  # random weights: any decodable text

        # streaming path too (the cli `generate`/`chat` transport)
        chunks = list(c.generate_stream("the quick brown fox",
                                        max_tokens=6, temperature=0.0))
        assert chunks  # SSE stream produced deltas
    finally:
        try:
            os.killpg(proc.pid, signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=10)
