"""Model and engine configuration dataclasses.

Canonical 2B config: hidden 2560, inter 6912, 30 layers, 20 Q / 5 KV heads,
head_dim 128, vocab 128256, rope theta 5e5, tied embeddings
(reference legacy/src/models/bitnet.py:27-37, scripts/direct_inference_full.py:84-98).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BitNetConfig:
    vocab_size: int = 128256
    hidden_size: int = 2560
    intermediate_size: int = 6912
    num_layers: int = 30
    num_heads: int = 20
    num_kv_heads: int = 5
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500_000.0
    max_position: int = 4096
    tie_word_embeddings: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # MoE (0 experts = dense); see wrinklefree_tpu/models/moe.py
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # Architecture family knobs: BitNet b1.58 uses ReLU^2 gate + attn/ffn
    # sub-norms; ternary-converted Llama keeps SiLU and no sub-norms
    # (reference legacy/benchmark/naive_converter.py converts weights only).
    mlp_act: str = "relu2"  # relu2 | silu
    sub_norms: bool = True

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @classmethod
    def bitnet_2b(cls) -> "BitNetConfig":
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "BitNetConfig":
        """Small config for tests (CPU-runnable)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=32,
            max_position=256,
        )

    @classmethod
    def llama3_8b_ternary(cls) -> "BitNetConfig":
        """Llama-3-8B converted to ternary (WrinkleFree naive converter target,
        reference legacy/benchmark/naive_converter.py)."""
        return cls(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            max_position=8192,
            tie_word_embeddings=False,
            mlp_act="silu",
            sub_norms=False,
        )

    @classmethod
    def from_hf_config(cls, path: Path | str) -> "BitNetConfig":
        """Build from a HuggingFace config.json directory or file."""
        p = Path(path)
        if p.is_dir():
            p = p / "config.json"
        cfg = json.loads(p.read_text())
        hidden = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=cfg.get("head_dim", hidden // heads),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 500_000.0),
            max_position=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            mlp_act="silu" if cfg.get("hidden_act", "relu2") == "silu" else "relu2",
            sub_norms=cfg.get("model_type", "bitnet") != "llama",
        )


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Continuous-batching engine configuration (serving analog of the
    reference's SGLang scheduler flags + configs/serving/default.yaml)."""

    max_batch_slots: int = 8
    page_size: int = 16  # reference kv_cache/kv_cache.py:59-60
    num_pages: int = 2048
    max_context: int = 4096
    prefill_buckets: tuple = (32, 128, 512, 2048, 4096)
    kv_dtype: str = "bf16"  # bf16 | int8 | fp8_e4m3 | fp8_e5m2
    enable_radix_cache: bool = True
    # Fused Pallas ternary matmul: None = auto (on for TPU — measured 2.2x
    # the XLA-fused path at batch 1 with honest timing); False forces the
    # jnp/XLA oracle path.
    use_pallas: "bool | None" = None
    # In-kernel page-table-gather flash decode attention for the decode
    # burst (dual KV layout): pages stream HBM->VMEM once inside the
    # kernel instead of XLA materializing the gathered history. None =
    # auto per measurement (see RESULTS.md); bool forces.
    flash_decode: "bool | None" = None
    # Exact-greedy head: int8 head SCAN + exact bf16 top-k rescoring with
    # a rounding-error certificate (models/bitnet.greedy_exact_topk).
    # Value = shortlist size (128 is a good default). Greedy outputs stay
    # bit-identical to the bf16 head; bursts containing sampling requests
    # automatically use the full bf16 head (exact distribution). 0 = off.
    # Mutually exclusive with int8_logits (the approximate variant).
    exact_head_k: int = 0
    # Ring-buffer width for repetition/presence/frequency penalties
    # (device-resident last-W token window per slot; requests'
    # penalty_last_n clamps to this). llama.cpp repeat_last_n default.
    penalty_window: int = 64
    # Static top-N width of the logprobs decode/prefill program variants
    # (built lazily on the first logprobs request; per-request logprobs_k
    # clamps to this).
    logprobs_top: int = 8
    # Max distinct (token_id, bias) logit-bias pairs per request
    # (device-resident [S, K] id/value arrays; submit() rejects longer).
    logit_bias_slots: int = 16
    # Decode-slot reservation: cap on concurrently-prefilling slots so
    # sustained admission can't turn the whole batch into prefill waves.
    # None = no cap (measured default; see RESULTS.md serving rows).
    max_prefill_slots: "int | None" = None
    # Prefill round membership (all modes token-identical; chunk
    # boundaries never change outputs):
    #   "stagger" (default): depth-first — the OLDEST mid-prefill rows
    #     get the biggest chunk bucket that fits their pending length,
    #     and only max_prefill_tokens_per_round/bucket rows advance per
    #     round. Early rows finish whole prompts in 1-2 rounds and start
    #     decoding while later rows prefill, instead of every row
    #     finishing together (the lockstep policy measured 13.1 s TTFT
    #     p50 on 8x3968 prefill-heavy — RESULTS.md; VERDICT r3 item 2).
    #     Same total dispatch count and compute as lockstep.
    #   "bucket": only the oldest row's chunk-bucket group per round,
    #     bucket shrunk until all its rows fit the round budget
    #     (lockstep when all rows are the same length).
    #   "all": every mid-prefill row advances each round at the oldest
    #     row's bucket width (more padding compute, fewer dispatches).
    prefill_round_mode: str = "stagger"
    # Linear path for the PREFILL programs only: "auto" (same path as
    # decode — Pallas when use_pallas), "pallas", or "xla" (stacked XLA
    # oracle: per-layer stack slice + fused unpack/int8-dot — candidate
    # win at MXU-bound prefill GEMM shapes where the GEMV-oriented
    # Pallas kernels underperform). Token-identical either way (both
    # paths match the jnp oracle bit-for-bit). WF_PREFILL_LINEAR env
    # overrides "auto".
    prefill_linear: str = "auto"
    max_queue: int = 256
    # Native C++ host runtime (csrc/wf_runtime.cpp) for page-allocator +
    # radix-tree bookkeeping; auto-falls back to Python if no toolchain.
    use_native_runtime: bool = True
    # Decode steps fused into ONE device program per dispatch: host/tunnel
    # round-trips are paid once per burst (each dispatch->fetch round
    # trip costs ~30 ms on tunnel transports regardless of content).
    # Streaming granularity = burst; 16 balances that against overhead
    # (serving decode measured 698 -> 843 tok/s going 8 -> 32).
    decode_burst: int = 16
    # Speculative decoding in the decode burst: n-gram (prompt-lookup)
    # drafts of up to k tokens verified in one forward, greedy requests
    # only (the engine falls back to plain bursts when any active
    # request samples). Windows are clamped to the current KV page so
    # rejected-draft writes can never clobber committed staging rows.
    # 0 disables.
    speculative_k: int = 0
    # Adaptive spec cutoff: once >= spec_min_accept_window drafts have
    # run, speculative decoding turns itself OFF (sticky, per engine)
    # when the realized per-draft acceptance rate (extra tokens /
    # (drafts*k)) falls below this. Threshold from the round-5 chip
    # measurements: at BATCH-1 the k+1-row verify rides the same
    # weight stream as a 1-row step, so break-even acceptance is 0.0
    # (spec_curve.json, 1.06x at forced 0); at 16-SLOT serving the
    # stream is already amortized over the batch and the verify's
    # extra rows cost real gather/attention — measured 0.69x at
    # acceptance ~0 (k=4, main scenario), i.e. break-even ~= 0.11.
    # Default 0.1: enabling speculative_k is safe everywhere — serving
    # engines shed drafting within spec_min_accept_window drafts when
    # the workload doesn't repeat. 0 = never auto-disable.
    spec_min_accept: float = 0.1
    spec_min_accept_window: int = 256
    # Admission policy: "fifo" (arrival order) or "sjf" (shortest
    # unmatched prompt first — lower mean TTFT under mixed lengths;
    # requests older than admission_aging_s jump the queue so long
    # prompts can't starve).
    admission_policy: str = "fifo"
    admission_aging_s: float = 10.0
    # Cap on rows x chunk tokens per batched prefill round: bounds the
    # KV-write transients ([B, S, 2Lp, KVD] + page transpose), which OOM
    # HBM at 8 rows x 4K chunks. Rounds split automatically.
    max_prefill_tokens_per_round: int = 8192
    # Interleave chunked prefill with decode at chunk granularity (one
    # batched prefill round per engine step). False drains all pending
    # prefill chunks before decoding (lower TTFT for the newest request,
    # longer decode stalls for everyone else).
    interleave_prefill: bool = True
    # KV pool layout: "token" (one row per token; O(1)-DMA writes,
    # strided per-layer reads), "layer" (dual: layer-major main pool with
    # page-contiguous reads + token-major staging page per slot), or
    # "auto" (layer on TPU with unquantized KV, token otherwise).
    kv_layout: str = "auto"
    # int8-quantize the output head (models/bitnet.quantize_lm_head):
    # halves the dominant logits-matmul HBM stream at small batch;
    # approximate (per-row absmax) — off by default for exactness.
    int8_logits: bool = False
    # Sliding-window attention on the paged serving path: pages wholly
    # outside [pos-window, pos] (plus the attn_global_tokens prefix) are
    # never gathered, so per-step attention READ bytes scale with
    # window/context instead of context (kv/paged.py
    # make_dual_window_attention — the reference only post-masks
    # already-computed scores, reference sparse_attention.py:83-119).
    # Approximate for contexts beyond the window; 0 = full attention.
    # Requires the dual KV layout (kv_layout "layer"/"auto" on TPU).
    attn_window: int = 0
    attn_global_tokens: int = 0


# ---------------------------------------------------------------------------
# YAML config tier (reference configs/{serving,models,sparsity,attention}/*.yaml
# loaded via hydra/omegaconf; here plain pyyaml into the dataclasses above).
# ---------------------------------------------------------------------------

CONFIGS_DIR = Path(__file__).resolve().parent.parent / "configs"


def load_yaml(path: Path | str) -> dict:
    """Load one YAML config file (absolute path or relative to configs/)."""
    import yaml

    p = Path(path)
    if not p.exists():
        p = CONFIGS_DIR / path
    with open(p) as f:
        return yaml.safe_load(f) or {}


def model_config_from_yaml(path: Path | str) -> BitNetConfig:
    """Build a BitNetConfig from a configs/models/*.yaml model card."""
    doc = load_yaml(path)
    arch = doc.get("architecture", {})
    fields = {f.name for f in dataclasses.fields(BitNetConfig)}
    return BitNetConfig(**{k: v for k, v in arch.items() if k in fields})


def engine_config_from_yaml(path: Path | str = "serving/default.yaml") -> "EngineConfig":
    doc = load_yaml(path).get("engine", {})
    kw = {}
    if "max_batch_slots" in doc:
        kw["max_batch_slots"] = int(doc["max_batch_slots"])
    if "page_size" in doc:
        kw["page_size"] = int(doc["page_size"])
    if "num_pages" in doc:
        kw["num_pages"] = int(doc["num_pages"])
    if "max_context" in doc:
        kw["max_context"] = int(doc["max_context"])
    if "prefill_buckets" in doc:
        kw["prefill_buckets"] = tuple(doc["prefill_buckets"])
    if "kv_cache_dtype" in doc:
        kw["kv_dtype"] = {"bfloat16": "bf16"}.get(doc["kv_cache_dtype"], doc["kv_cache_dtype"])
    if "radix_cache" in doc:
        kw["enable_radix_cache"] = bool(doc["radix_cache"])
    if "use_pallas" in doc and doc["use_pallas"] != "auto":
        kw["use_pallas"] = bool(doc["use_pallas"])
    if "decode_burst" in doc:
        kw["decode_burst"] = int(doc["decode_burst"])
    if "int8_logits" in doc:
        kw["int8_logits"] = bool(doc["int8_logits"])
    return EngineConfig(**kw)


def activation_sparsity_from_yaml(path: Path | str):
    """configs/sparsity/*.yaml -> ActivationSparsityConfig (or None if off)."""
    from .ops.activation_sparsity import ActivationSparsityConfig, SparsityMode

    doc = load_yaml(path).get("activation_sparsity", {})
    mode = SparsityMode(doc.get("mode", "none"))
    if mode == SparsityMode.NONE:
        return None
    fields = {f.name for f in dataclasses.fields(ActivationSparsityConfig)}
    return ActivationSparsityConfig(
        **{k: v for k, v in doc.items() if k in fields and k != "mode"}, mode=mode
    )


def attention_sparsity_from_yaml(path: Path | str):
    """configs/attention/*.yaml -> AttentionSparsityConfig (or None if off)."""
    from .ops.sparse_attention import AttentionSparsityConfig, AttentionSparsityMode

    doc = load_yaml(path).get("attention_sparsity", {})
    mode = AttentionSparsityMode(doc.get("mode", "none"))
    if mode == AttentionSparsityMode.NONE:
        return None
    fields = {f.name for f in dataclasses.fields(AttentionSparsityConfig)}
    return AttentionSparsityConfig(
        **{k: v for k, v in doc.items() if k in fields and k != "mode"}, mode=mode
    )
