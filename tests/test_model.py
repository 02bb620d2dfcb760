"""BitNet model correctness vs HuggingFace transformers.

The HF BitNetForCausalLM with BitLinear replacements is the ground truth
(the reference validates against the same stack,
reference scripts/direct_inference_full.py + notebook). We build a tiny
random ternary model, mirror its weights into both frameworks, and demand
matching logits, plus decode-vs-prefill self-consistency.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import KVCache, forward, generate, init_params
from wrinklefree_tpu.ops.ternary import unpack_ternary_np


CFG = BitNetConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


def _build_hf_twin(params, cfg, dtype: str = "bfloat16"):
    torch = pytest.importorskip("torch")
    from transformers import BitNetConfig as HFConfig
    from transformers.models.bitnet import BitNetForCausalLM
    from transformers.integrations.bitnet import pack_weights, replace_with_bitnet_linear

    tdt = getattr(torch, dtype)

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        hidden_act="relu2",
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position,
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    model = BitNetForCausalLM(hf_cfg)
    model = replace_with_bitnet_linear(model, modules_to_not_convert=["lm_head"])
    model = model.to(tdt).eval()
    from transformers.integrations.bitnet import BitLinear

    for mod in model.modules():  # replace() leaves BitLinear.dtype at fp32
        if isinstance(mod, BitLinear):
            mod.dtype = tdt

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32)).to(tdt)

    sd = model.state_dict()
    L = params["layers"]
    new_sd = {}
    new_sd["model.embed_tokens.weight"] = t(params["embed"].astype(jnp.float32))
    new_sd["model.norm.weight"] = t(params["final_norm"].astype(jnp.float32))
    new_sd["lm_head.weight"] = new_sd["model.embed_tokens.weight"]
    names = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
        "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
        "down": "mlp.down_proj",
    }
    norm_names = {
        "input_ln": "input_layernorm.weight",
        "post_ln": "post_attention_layernorm.weight",
        "attn_sub": "self_attn.attn_sub_norm.weight",
        "ffn_sub": "mlp.ffn_sub_norm.weight",
    }
    for i in range(cfg.num_layers):
        for short, sub in norm_names.items():
            new_sd[f"model.layers.{i}.{sub}"] = t(L[short][i].astype(jnp.float32))
        for short, sub in names.items():
            w_kn = unpack_ternary_np(np.asarray(L[f"{short}_qw"][i]))  # [K,N]
            packed = pack_weights(torch.from_numpy(w_kn.T.astype(np.int64)))
            new_sd[f"model.layers.{i}.{sub}.weight"] = packed
            new_sd[f"model.layers.{i}.{sub}.weight_scale"] = torch.tensor(
                [float(L[f"{short}_scale"][i])], dtype=tdt
            )
    missing, unexpected = model.load_state_dict(new_sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    return model


@pytest.mark.slow
def test_logits_match_hf(params):
    torch = pytest.importorskip("torch")
    model = _build_hf_twin(params, CFG)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, CFG.vocab_size, size=(2, 16)).astype(np.int32)

    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()

    cache = KVCache.zeros(CFG, 2, 32)
    logits, _ = forward(params, CFG, jnp.asarray(tokens), cache, jnp.zeros((2,), jnp.int32))
    logits = np.asarray(logits)

    # bf16 stacks diverge slightly; cosine per position must be ~1.
    for b in range(2):
        for s in range(16):
            a, h = logits[b, s], hf_logits[b, s]
            cos = np.dot(a, h) / (np.linalg.norm(a) * np.linalg.norm(h) + 1e-9)
            assert cos > 0.999, f"pos ({b},{s}): cos={cos}"
    # Random-model logits are near-tied noise, so exact argmax agreement is
    # limited by bf16 ULPs; require strong agreement plus top-5 containment.
    agree = (logits.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert agree > 0.7, f"greedy agreement {agree}"
    top5 = np.argsort(hf_logits, axis=-1)[..., -5:]
    in_top5 = (logits.argmax(-1)[..., None] == top5).any(-1).mean()
    assert in_top5 > 0.98, f"argmax in HF top-5 only {in_top5}"


@pytest.mark.slow
def test_logits_match_hf_2b_dims():
    """HF parity at the REAL 2B layer geometry (VERDICT r1 item 2a).

    The tiny-config twin can't catch padding/tiling bugs that only
    appear at the production dims (H=2560, I=6912, 20q/5kv heads —
    microsoft/BitNet-b1.58-2B-4T's layer shape, reference
    scripts/direct_inference_full.py:112-167). Two layers at full width,
    reduced vocab (embed math is shape-independent), logits vs
    transformers' BitNetForCausalLM. Both stacks run f32: at these
    reduction widths bf16 ordering drift alone costs ~1e-3 cosine
    (measured 0.9987), which would mask the layout bugs this test is
    hunting — the quant math (ternary weights, int8 activations) is
    dtype-independent and still fully exercised.
    """
    torch = pytest.importorskip("torch")
    b2 = BitNetConfig.bitnet_2b()
    cfg = BitNetConfig(
        vocab_size=4096,
        hidden_size=b2.hidden_size,
        intermediate_size=b2.intermediate_size,
        num_layers=2,
        num_heads=b2.num_heads,
        num_kv_heads=b2.num_kv_heads,
        head_dim=b2.head_dim,
        max_position=128,
        rope_theta=b2.rope_theta,
        rms_norm_eps=b2.rms_norm_eps,
        dtype=jnp.float32,
    )
    params = init_params(cfg, seed=3, fast=False)
    model = _build_hf_twin(params, cfg, dtype="float32")

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(
            torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()

    cache = KVCache.zeros(cfg, 1, 16)
    logits, _ = forward(
        params, cfg, jnp.asarray(tokens), cache, jnp.zeros((1,), jnp.int32)
    )
    logits = np.asarray(logits)
    for s in range(8):
        a, h = logits[0, s], hf_logits[0, s]
        cos = np.dot(a, h) / (np.linalg.norm(a) * np.linalg.norm(h) + 1e-9)
        assert cos > 0.9999, f"pos {s}: cos={cos}"  # f32 both sides
    agree = (logits.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert agree == 1.0, f"greedy agreement {agree}"


def test_decode_matches_prefill(params):
    """Token-by-token decode with KV cache == one-shot prefill logits."""
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, CFG.vocab_size, size=(1, 12)).astype(np.int32)

    cache = KVCache.zeros(CFG, 1, 16)
    full_logits, _ = forward(
        params, CFG, jnp.asarray(tokens), cache, jnp.zeros((1,), jnp.int32)
    )
    full_logits = np.asarray(full_logits)

    cache = KVCache.zeros(CFG, 1, 16)
    step_logits = []
    for pos in range(12):
        lg, cache = forward(
            params, CFG, jnp.asarray(tokens[:, pos : pos + 1]),
            cache, jnp.full((1,), pos, jnp.int32),
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)

    np.testing.assert_allclose(step_logits, full_logits, rtol=2e-2, atol=2e-1)
    assert np.array_equal(step_logits.argmax(-1), full_logits.argmax(-1))


def test_batch_consistency(params):
    """Same prompt in different batch rows -> same logits (padding safety)."""
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, CFG.vocab_size, size=(8,)).astype(np.int32)
    tokens = np.stack([prompt, prompt])
    cache = KVCache.zeros(CFG, 2, 16)
    logits, _ = forward(params, CFG, jnp.asarray(tokens), cache, jnp.zeros((2,), jnp.int32))
    logits = np.asarray(logits)
    np.testing.assert_allclose(logits[0], logits[1], rtol=1e-5, atol=1e-5)


def test_generate_deterministic_and_not_degenerate(params):
    """Gibberish tripwire: greedy generation is deterministic and does not
    emit a single repeated token (reference test_sglang_correctness.py)."""
    prompt = [1, 5, 9, 2]
    out1 = generate(params, CFG, prompt, max_new_tokens=16)
    out2 = generate(params, CFG, prompt, max_new_tokens=16)
    assert out1 == out2
    gen = out1[len(prompt):]
    assert len(set(gen)) > 1, f"degenerate output: {gen}"


def test_sampling_respects_temperature(params):
    prompt = [1, 5, 9, 2]
    outs = {
        tuple(generate(params, CFG, prompt, max_new_tokens=12, temperature=1.0, seed=s))
        for s in range(3)
    }
    assert len(outs) > 1, "temperature sampling produced identical sequences"
