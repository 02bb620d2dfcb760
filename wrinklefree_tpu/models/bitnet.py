"""BitNet b1.58 model — functional JAX implementation.

Architecture (reference scripts/direct_inference_full.py:210-302 and HF
transformers BitNetForCausalLM): embed -> N x { RMSNorm, GQA attention
(RoPE theta=5e5), attn_sub_norm before o_proj, residual, RMSNorm,
ReLU^2-gated MLP with ffn_sub_norm before down_proj, residual } ->
final RMSNorm -> tied-embedding logits.

TPU-first design notes:
- All per-layer parameters are STACKED on a leading [L] axis and the
  layer loop is a single `lax.scan` — one trace, one compile, no Python
  per-layer dispatch (the reference burns ~49ms/token in Python overhead,
  reference docs/research/notebook.md:946-954).
- One `forward` covers prefill and decode against a contiguous KV cache
  with static shapes; the paged-KV path lives in wrinklefree_tpu/engine.
- The ternary matmul is pluggable (`linear_fn`) so the engine can swap in
  the fused Pallas kernel; the default is the exact jnp oracle.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin
from ..ops.ternary import (
    pack_ternary_np,
    quantize_weights_ternary,
    ternary_linear,
)

LinearFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def default_linear(x, qweight, scale, out_dtype=jnp.bfloat16, kernel=None, quant_axis=None):
    return ternary_linear(
        x, qweight, scale, out_dtype=out_dtype, kernel=kernel, quant_axis=quant_axis
    )


class KVCache(NamedTuple):
    """Contiguous per-layer KV cache [L, B, T, KV, D]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def zeros(cls, cfg: BitNetConfig, batch: int, max_len: int, dtype=None):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        dtype = cfg.dtype if dtype is None else dtype
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


@functools.partial(jax.jit, donate_argnums=(0,))
def flatten_cache_for_decode(cache: KVCache) -> KVCache:
    """One-time relayout of a batch-1 cache to the flat [L*T*KV, D] row
    form the manual-DMA decode attention kernel consumes.

    [.., KV, D] with KV=5 is TPU-tile padded (KV 5 -> 8) in HBM, so
    5D<->flat reshape is a ~2 ms full-cache relayout COPY for the 2B
    model — do it ONCE after prefill, never inside the decode loop.
    `forward` accepts either form and returns the form it was given
    (falling back to an internal relayout on paths that need 5D)."""
    L, B, T, KV, D = cache.k.shape
    assert B == 1, "flat decode cache is batch-1 only"
    return KVCache(
        cache.k.reshape(L * T * KV, D), cache.v.reshape(L * T * KV, D)
    )


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _stack(arrs):
    return jnp.asarray(np.stack(arrs, axis=0))


def init_params(cfg: BitNetConfig, seed: int = 0, dtype=None, fast: bool = None):
    """Random ternary model (for tests/benchmarks; real weights come from
    wrinklefree_tpu.models.loader). dtype defaults to cfg.dtype.

    fast=True (default for >=1B-param configs) draws ternary values
    directly instead of quantizing gaussians — billions of float64
    normals otherwise dominate benchmark startup."""
    if dtype is None:
        dtype = cfg.dtype
    if fast is None:
        fast = cfg.hidden_size * cfg.num_layers > 10_000
    if fast:
        return _init_params_on_device(cfg, seed, dtype)
    rng = np.random.default_rng(seed)

    def rand_proj(k, n):
        w = rng.normal(0.0, 0.02, size=(k, n)).astype(np.float32)
        tern, scale = quantize_weights_ternary(w)
        return pack_ternary_np(tern), np.float32(scale)

    H, I = cfg.hidden_size, cfg.intermediate_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    qw = {k: [] for k in ("q", "k", "v", "o", "gate", "up", "down")}
    sc = {k: [] for k in qw}
    dims = {
        "q": (H, Q), "k": (H, KV), "v": (H, KV), "o": (Q, H),
        "gate": (H, I), "up": (H, I), "down": (I, H),
    }
    for _ in range(cfg.num_layers):
        for name, (kk, nn_) in dims.items():
            w, s = rand_proj(kk, nn_)
            qw[name].append(w)
            sc[name].append(s)

    ones_h = np.ones((cfg.num_layers, H), np.float32)
    layers = {
        "input_ln": jnp.asarray(ones_h, dtype),
        "post_ln": jnp.asarray(ones_h, dtype),
        "attn_sub": jnp.asarray(np.ones((cfg.num_layers, Q), np.float32), dtype),
        "ffn_sub": jnp.asarray(np.ones((cfg.num_layers, I), np.float32), dtype),
    }
    for name in dims:
        layers[f"{name}_qw"] = _stack(qw[name])
        layers[f"{name}_scale"] = jnp.asarray(np.asarray(sc[name]), jnp.float32)

    if cfg.num_experts > 0:
        # MoE: per-layer expert stacks [L, E, ...] replace the dense MLP
        E = cfg.num_experts
        for name in ("gate", "up", "down"):
            kk, nn_ = dims[name]
            eqw, esc = [], []
            for _ in range(cfg.num_layers):
                lw, ls = [], []
                for _e in range(E):
                    w, s = rand_proj(kk, nn_)
                    lw.append(w)
                    ls.append(s)
                eqw.append(np.stack(lw))
                esc.append(np.asarray(ls, np.float32))
            layers[f"moe_{name}_qw"] = _stack(eqw)
            layers[f"moe_{name}_scale"] = jnp.asarray(np.stack(esc))
            del layers[f"{name}_qw"], layers[f"{name}_scale"]
        layers["router"] = jnp.asarray(
            rng.normal(0, 0.02, size=(cfg.num_layers, H, E)).astype(np.float32)
        )

    def rand_embed():
        return jnp.asarray(
            rng.normal(0.0, 0.02, size=(cfg.vocab_size, H)).astype(np.float32), dtype
        )

    params = {
        "embed": rand_embed(),
        "final_norm": jnp.ones((H,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rand_embed()
    return params


def _init_params_on_device(cfg: BitNetConfig, seed: int, dtype):
    """Generate random ternary params entirely on-device (host numpy is
    far too slow for 2B+ params on throttled CPUs; the TPU does this in
    well under a second)."""
    H, I, Q, KV = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim, cfg.kv_dim
    L = cfg.num_layers
    key = jax.random.PRNGKey(seed)
    dims = {
        "q": (H, Q), "k": (H, KV), "v": (H, KV), "o": (Q, H),
        "gate": (H, I), "up": (H, I), "down": (I, H),
    }

    @jax.jit
    def build(key):
        keys = jax.random.split(key, len(dims) + 2)
        layers = {}
        for i, (name, (kk, nn_)) in enumerate(dims.items()):
            bits = jax.random.bits(keys[i], (4, L, kk // 4, nn_), dtype=jnp.uint8)
            enc = bits % 3  # {0,1,2} ~ ternary+1 (slight skew is fine here)
            layers[f"{name}_qw"] = (
                enc[0] | (enc[1] << 2) | (enc[2] << 4) | (enc[3] << 6)
            )
            layers[f"{name}_scale"] = jnp.full((L,), 50.0, jnp.float32)
        layers["input_ln"] = jnp.ones((L, H), dtype)
        layers["post_ln"] = jnp.ones((L, H), dtype)
        layers["attn_sub"] = jnp.ones((L, Q), dtype)
        layers["ffn_sub"] = jnp.ones((L, I), dtype)
        if cfg.num_experts > 0:
            E = cfg.num_experts
            ekeys = jax.random.split(keys[0], 4)
            for j, name in enumerate(("gate", "up", "down")):
                kk, nn_ = dims[name]
                bits = jax.random.bits(ekeys[j], (4, L, E, kk // 4, nn_), dtype=jnp.uint8)
                enc = bits % 3
                layers[f"moe_{name}_qw"] = (
                    enc[0] | (enc[1] << 2) | (enc[2] << 4) | (enc[3] << 6)
                )
                layers[f"moe_{name}_scale"] = jnp.full((L, E), 50.0, jnp.float32)
                del layers[f"{name}_qw"], layers[f"{name}_scale"]
            layers["router"] = (
                jax.random.normal(ekeys[3], (L, H, E), jnp.float32) * 0.02
            )
        embed = (jax.random.normal(keys[-1], (cfg.vocab_size, H), jnp.bfloat16) * 0.02).astype(dtype)
        params = {"embed": embed, "final_norm": jnp.ones((H,), dtype), "layers": layers}
        if not cfg.tie_word_embeddings:
            params["lm_head"] = (
                jax.random.normal(keys[-2], (cfg.vocab_size, H), jnp.bfloat16) * 0.02
            ).astype(dtype)
        return params

    return build(key)


def quantize_lm_head(params, cfg: BitNetConfig):
    """Optional int8 per-row quantization of the output head.

    At batch-1 decode the tied-embedding logits matmul reads the whole
    [V, H] bf16 head (0.66 GB for the 2B model — more than the packed
    ternary weights); int8 halves that stream. Adds `lm_head_q` (int8)
    + `lm_head_s` ([V] f32) — `compute_logits` then prefers them.
    Approximate (per-row absmax symmetric); keep off where exact HF
    logits are required.
    """
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    hf = jnp.asarray(head, jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(hf), axis=1, keepdims=True), 1e-8, None)
    q = jnp.clip(jnp.round(hf / absmax * 127.0), -127, 127).astype(jnp.int8)
    out = dict(params)
    out["lm_head_q"] = q
    out["lm_head_s"] = (absmax[:, 0] / 127.0).astype(jnp.float32)
    return out


def fuse_projections(params, cfg: BitNetConfig):
    """Concat q/k/v and gate/up weight stacks along N for the stacked
    Pallas path: 7 -> 4 kernel calls per layer (each Pallas call carries
    ~10 us of fixed launch/pipeline cost, so call count is a first-order
    term at batch-1 decode). Per-tensor scales become per-COLUMN scale
    rows ([L, N] f32) so each segment keeps its own scale in one call.

    Replaces the q/k/v (and gate/up) entries with "qkv_qw"/"qkv_scale"
    ("gateup_qw"/"gateup_scale"). Only for the single-device stacked
    path — under TP, fused column sharding would split segments across
    devices incorrectly. MoE models fuse q/k/v only.
    """
    layers = dict(params["layers"])
    L = layers["q_qw"].shape[0]

    def row(scale, n):
        # [L, 8, n]: 8 identical sublanes so the kernel's scale block
        # satisfies the TPU (8, 128) block-tiling minimum
        return jnp.broadcast_to(
            scale.astype(jnp.float32)[:, None, None], (L, 8, n)
        )

    def fuse(names, out_name):
        qws = [layers.pop(f"{nm}_qw") for nm in names]
        scs = [layers.pop(f"{nm}_scale") for nm in names]
        layers[f"{out_name}_qw"] = jnp.concatenate(qws, axis=-1)
        layers[f"{out_name}_scale"] = jnp.concatenate(
            [row(s, int(w.shape[-1])) for s, w in zip(scs, qws)], axis=-1
        )

    fuse(("q", "k", "v"), "qkv")
    if "gate_qw" in layers:
        fuse(("gate", "up"), "gateup")
    return {**params, "layers": layers}


def split_layers_for_decode(params, cfg: BitNetConfig):
    """Pre-split the stacked per-layer arrays into per-layer entries for
    the UNROLLED megakernel decode path.

    Why: the stacked kernels select their layer via a scalar-prefetch
    grid spec, which costs ~8-10 us PER CALL on v5e (scripts/
    kernel_lab8.py) — with 2 calls x 30 layers that was ~0.5 ms/token.
    Unrolling the layer loop over pre-split weights makes every index
    map static (one Mosaic kernel, 30 call sites, no prefetch). The
    split duplicates the packed weights once (~0.5 GB for the 2B model).

    Requires fuse_projections() applied. Adds params["layers_split"].
    """
    stack = params["layers"]
    if "qkv_qw" not in stack or "gateup_qw" not in stack:
        raise ValueError("split_layers_for_decode requires fuse_projections")
    L = jax.tree.leaves(stack)[0].shape[0]
    H, Q, I = cfg.hidden_size, cfg.q_dim, cfg.intermediate_size

    def rows(a, n):
        return jnp.broadcast_to(
            a.astype(jnp.float32).reshape(1, -1)[:, :n], (8, n)
        )

    split = []
    for l in range(L):
        e = {
            "qkv_qw": stack["qkv_qw"][l],
            "o_qw": stack["o_qw"][l],
            "gateup_qw": stack["gateup_qw"][l],
            "down_qw": stack["down_qw"][l],
            "qkv_scale": stack["qkv_scale"][l].astype(jnp.float32),
            "gateup_scale": stack["gateup_scale"][l].astype(jnp.float32),
            "o_scale": rows(stack["o_scale"][l] * jnp.ones((H,)), H),
            "down_scale": rows(stack["down_scale"][l] * jnp.ones((H,)), H),
            "input_ln": rows(stack["input_ln"][l], H),
            "post_ln": rows(stack["post_ln"][l], H),
        }
        if cfg.sub_norms:
            e["attn_sub"] = rows(stack["attn_sub"][l], Q)
            e["ffn_sub"] = rows(stack["ffn_sub"][l], I)
        split.append(e)
    out = dict(params)
    out["layers_split"] = tuple(split)
    return out


def compute_logits(hidden, params, cfg: BitNetConfig):
    """hidden [..., H] -> logits [..., V] f32 (int8 head when present)."""
    if "lm_head_q" in params:
        logits = jax.lax.dot_general(
            hidden,
            params["lm_head_q"].astype(cfg.dtype),  # convert fused into the dot
            dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return logits * params["lm_head_s"]
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    return jax.lax.dot_general(
        hidden,
        head,
        dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def greedy_exact_topk(hidden, params, cfg: BitNetConfig, k: int = 128,
                      tp_axis: str | None = None):
    """Greedy next-token via int8 scan + exact bf16 top-k rescoring.

    At batch-1 decode the bf16 tied-embedding head streams 0.66 GB/token
    (29% of the step for the 2B model). The int8 head halves that but is
    approximate. This path keeps the cheap int8 SCAN and restores
    exactness: rescore the k best candidates against the ORIGINAL bf16
    rows, then certify with the quantization error bound

        |l_v - l_hat_v| <= 0.5 * s_v * ||h||_1   (absmax rounding)

    that no candidate outside the shortlist can beat the rescored max
    (strict margin, plus slack for f32 accumulation-order noise). When
    the certificate fails — near-ties within the int8 error — fall back
    to the full bf16 head via lax.cond, so the result equals
    ``argmax(compute_logits(bf16 head))`` on every token while paying
    the bf16 stream only on the rare uncertifiable steps.

    hidden: [B, H] post-final-norm. Returns (tokens [B] int32,
    certified [] bool — False means the fallback branch ran).
    Requires quantize_lm_head() applied. Counterpart of the reference's
    approximate low-precision head, which has no exactness story.

    With ``tp_axis`` (inside shard_map, vocab-sharded head): each shard
    scans/rescores its local V/tp rows, then the winner, the outside-
    shortlist bound, and the error scale are combined with pmax/pmin —
    token-identical to the single-device path (same shortlist per shard,
    same tie-break: lowest global id among exact-max rows).
    """
    if "lm_head_q" not in params:
        raise ValueError("greedy_exact_topk requires quantize_lm_head(params)")
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    V = head.shape[0]  # local vocab rows under TP
    approx = jax.lax.dot_general(
        hidden,
        params["lm_head_q"].astype(cfg.dtype),
        dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * params["lm_head_s"]  # [B, V]

    _, cand = jax.lax.approx_max_k(approx, k)  # [B, k] (recall<1 is fine:
    # the certificate below bounds whatever landed OUTSIDE the shortlist)
    rows = head[cand].astype(cfg.dtype)  # [B, k, H]
    exact = jax.lax.dot_general(
        hidden.astype(cfg.dtype),
        rows,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, k]

    # best approx score among non-candidates
    masked = jnp.put_along_axis(
        approx, cand, -jnp.inf, axis=-1, inplace=False
    )
    m_out = jnp.max(masked, axis=-1)  # [B]
    # eps: int8 rounding bound + slack for f32 reduction-order drift
    h1 = jnp.sum(jnp.abs(hidden.astype(jnp.float32)), axis=-1)  # [B]
    s_max = jnp.max(params["lm_head_s"])
    exact_max = jnp.max(exact, axis=-1)  # [B] (local under TP)
    SENT = jnp.int32(2**31 - 1)  # > any global vocab id

    if tp_axis is None:
        cand_g = cand
    else:
        # globalize: shard-local row ids -> global vocab ids; combine the
        # shortlist winner, outside-shortlist bound and error scale
        offset = jax.lax.axis_index(tp_axis).astype(jnp.int32) * V
        cand_g = cand + offset

    is_max = exact >= exact_max[:, None]
    minid = jnp.min(jnp.where(is_max, cand_g, SENT), axis=-1)  # [B]

    if tp_axis is not None:
        g_exact_max = jax.lax.pmax(exact_max, tp_axis)
        # lowest global id among shards that achieve the global max
        minid = jax.lax.pmin(
            jnp.where(exact_max >= g_exact_max, minid, SENT), tp_axis
        )
        exact_max = g_exact_max
        m_out = jax.lax.pmax(m_out, tp_axis)
        s_max = jax.lax.pmax(s_max, tp_axis)

    eps = 0.5 * s_max * h1 + 1e-3 * (jnp.abs(exact_max) + 1.0)
    certified = jnp.all(exact_max > m_out + eps)

    def from_shortlist(_):
        # argmax over candidates with full-vocab tie-breaking (lowest id)
        return minid.astype(jnp.int32)

    def full_head(_):
        logits = jax.lax.dot_general(
            hidden,
            head,
            dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if tp_axis is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # cross-shard argmax with lowest-global-id tie-break
        lmax = jnp.max(logits, axis=-1)
        offset = jax.lax.axis_index(tp_axis).astype(jnp.int32) * V
        ids = jnp.arange(V, dtype=jnp.int32)[None, :] + offset
        lid = jnp.min(
            jnp.where(logits >= lmax[:, None], ids, SENT), axis=-1
        )
        gmax = jax.lax.pmax(lmax, tp_axis)
        return jax.lax.pmin(
            jnp.where(lmax >= gmax, lid, SENT), tp_axis
        ).astype(jnp.int32)

    tok = jax.lax.cond(certified, from_shortlist, full_head, None)
    return tok, certified


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _attention(q, k_cache, v_cache, q_pos, cfg: BitNetConfig, attn_sparsity=None):
    """GQA attention of q [B,S,NH,D] over cache [B,T,KV,D] (full history).

    Mask: key index t attends iff t <= q_pos (cache filled contiguously
    from 0, so index == absolute position). Head counts are derived from
    the array shapes so the same code runs on TP-local shards.

    attn_sparsity: optional AttentionSparsityConfig — WINDOW mode masks
    pre-softmax, the rest sparsify post-softmax (SURVEY.md §5.7).
    """
    B, S, NH, D = q.shape
    T = k_cache.shape[1]
    KV = k_cache.shape[2]
    G = NH // KV
    scale = 1.0 / np.sqrt(D)

    qg = q.reshape(B, S, KV, G, D)
    # scores [B, KV, G, S, T]
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k_cache, preferred_element_type=jnp.float32)
    scores = scores * scale
    if attn_sparsity is not None and attn_sparsity.mode == "window":
        from ..ops.sparse_attention import create_window_mask

        mask = create_window_mask(
            q_pos, T, attn_sparsity.window_size,
            attn_sparsity.global_tokens, attn_sparsity.stride,
        )  # [B,S,T]
        mask = mask[:, None, None, :, :]
    else:
        key_idx = jnp.arange(T)[None, None, None, None, :]
        mask = key_idx <= q_pos[:, None, None, :, None]  # [B,1,1,S,T]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    if attn_sparsity is not None:
        from ..ops.sparse_attention import apply_attention_sparsity

        probs = apply_attention_sparsity(probs, attn_sparsity)
    probs = probs.astype(v_cache.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v_cache)
    return out.reshape(B, S, NH, D)


def forward(
    params,
    cfg: BitNetConfig,
    tokens: jax.Array,  # [B, S] int32
    cache: KVCache,  # [L, B, T, KV, D]
    start_pos: jax.Array,  # [B] int32 — current cache fill per sequence
    *,
    linear_fn: Optional[LinearFn] = None,
    logits_all: bool = True,
    head_fn=None,  # Optional[(hidden [B,H], params) -> anything]; replaces
    # compute_logits. Takes params as an argument (NOT a closure) so the
    # head weights stay jit parameters instead of baked-in constants.
    tp_axis: Optional[str] = None,
    tp_kv_replicated: bool = False,  # KV heads replicated across tp_axis
    # (num_kv_heads % tp != 0, e.g. the flagship 20q/5kv on tp=2/4 —
    # parallel/sharding.tp_kv_replicated). k/v/cache are full-size per
    # device; local Q heads are scattered into the full head layout for
    # attention and sliced back out for the row-parallel o_proj.
    act_sparsity=None,  # ActivationSparsityConfig | None
    attn_sparsity=None,  # AttentionSparsityConfig | None
) -> Tuple[jax.Array, KVCache]:
    """Run S new tokens through the model, updating the KV cache in place.

    Covers prefill (S = prompt len, start_pos = 0) and decode (S = 1).
    Returns (logits [B,S,V] float32 if logits_all else [B,V], new cache).

    With ``tp_axis`` set, this body is the PER-DEVICE program of a
    `shard_map` tensor-parallel run (see wrinklefree_tpu/parallel):
    q/k/v/gate/up are column-sharded (local heads), o/down row-sharded
    (partial sums -> psum over ICI), the tied embedding is vocab-sharded
    (lookup via psum, logits via tiled all-gather). This is the TP design
    the reference stubs out at world_size=1 (SURVEY.md §2.3).
    """
    lf = linear_fn or default_linear
    if act_sparsity is not None:
        from ..ops.activation_sparsity import make_sparse_linear_fn

        lf = make_sparse_linear_fn(lf, act_sparsity)
    B, S = tokens.shape
    dtype = cfg.dtype

    embed = params["embed"]
    if tp_axis is None:
        hidden = embed[tokens].astype(dtype)  # [B,S,H]
    else:
        # vocab-sharded embedding lookup: local gather + psum
        v_local = embed.shape[0]
        v_start = jax.lax.axis_index(tp_axis) * v_local
        local = tokens - v_start
        ok = (local >= 0) & (local < v_local)
        rows = embed[jnp.clip(local, 0, v_local - 1)].astype(dtype)
        hidden = jax.lax.psum(jnp.where(ok[..., None], rows, 0), tp_axis)
    positions = start_pos[:, None] + jnp.arange(S)[None, :]  # [B,S]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, dtype)

    batch_idx = jnp.arange(B)[:, None] * jnp.ones((1, S), jnp.int32)

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis is not None else x

    # Stacked linear_fns (lf.stacked == True) take the WHOLE [L, K4, N]
    # weight stack plus a layer index: inside the layer scan this avoids
    # the per-layer dynamic-slice copy XLA must materialize before a
    # Pallas custom call (~17 MB x L per token for BitNet-2B).
    stacked = getattr(lf, "stacked", False)
    stack = params["layers"]
    fused = "qkv_qw" in stack  # fuse_projections() applied
    if fused and not stacked:
        raise ValueError("fused projections require a stacked linear_fn")

    def wlin(x, lp, l, name, **kw):
        if stacked:
            return lf(x, stack[name + "_qw"], stack[name + "_scale"], l, **kw)
        # honor cfg.dtype (default_linear alone would round through bf16
        # even for an f32 model); stacked pallas kernels emit bf16 only
        kw.setdefault("out_dtype", dtype)
        return lf(x, lp[name + "_qw"], lp[name + "_scale"], **kw)

    # prologue-fused path: norm + act-quant (+ MLP activation) run INSIDE
    # the stacked Pallas kernel — removes ~9 XLA launches/layer, which
    # rival the arithmetic at batch-1 decode. Single-device only.
    prologue = (
        fused
        and "gateup_qw" in stack
        and getattr(lf, "prologue", False)
        and tp_axis is None
        and act_sparsity is None
    )
    if prologue:
        nL = jax.tree.leaves(stack)[0].shape[0]

        def _rows(a, n):
            return jnp.broadcast_to(
                a.astype(jnp.float32).reshape(nL, 1, -1)[:, :, :n], (nL, 8, n)
            )

        def plf(x, name, l, norm_name=None, act="none"):
            qw = stack[name + "_qw"]
            sw = stack[name + "_scale"]
            if sw.ndim == 1:
                sw = _rows(sw[:, None] * jnp.ones((1, qw.shape[-1])), qw.shape[-1])
            nw = None
            if norm_name is not None:
                w = stack[norm_name]
                nw = _rows(w, w.shape[-1])
            return lf(x, qw, sw, l, nw, act=act,
                      norm=norm_name is not None, eps=cfg.rms_norm_eps)

    def layer_step(h, xs):
        lp, ck, cv, l = xs  # ck/cv: [B, T, KV_local, D]
        if prologue:
            qkv = plf(h, "qkv", l, "input_ln")
            kvd = cfg.num_kv_heads * cfg.head_dim
            qd = qkv.shape[-1] - 2 * kvd
            q = qkv[..., :qd].reshape(B, S, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(B, S, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(B, S, -1, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            ck = ck.at[batch_idx, positions].set(k)
            cv = cv.at[batch_idx, positions].set(v)
            attn = _attention(q, ck, cv, positions, cfg, attn_sparsity)
            attn = attn.reshape(B, S, -1)
            h = h + plf(attn, "o", l, "attn_sub" if cfg.sub_norms else None)
            # the two-stage mega MLP wins at batch-1 (one launch) but
            # loses at serving batch (its serialized grid blocks the
            # overlap two separate kernels get): gate by row count
            mega = getattr(lf, "mlp_mega", None) if B * S <= 8 else None
            mlp_act = "silu" if cfg.mlp_act == "silu" else "relu2"
            if mega is not None:
                inter = stack["down_qw"].shape[1] * 4
                h = mega(
                    h, stack["gateup_qw"], stack["down_qw"], l,
                    stack["gateup_scale"],
                    _rows(stack["down_scale"][:, None]
                          * jnp.ones((1, stack["down_qw"].shape[-1])),
                          stack["down_qw"].shape[-1]),
                    _rows(stack["post_ln"], stack["post_ln"].shape[-1]),
                    _rows(stack["ffn_sub"], inter) if cfg.sub_norms else None,
                    eps=cfg.rms_norm_eps, act=mlp_act, norm2=cfg.sub_norms,
                )
            else:
                gu = plf(h, "gateup", l, "post_ln")
                h = h + plf(
                    gu, "down", l, "ffn_sub" if cfg.sub_norms else None,
                    act=mlp_act,
                )
            return h, (ck, cv)
        normed = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)

        if fused:
            qkv = wlin(normed, lp, l, "qkv")
            kvd = cfg.num_kv_heads * cfg.head_dim
            qd = qkv.shape[-1] - 2 * kvd
            q = qkv[..., :qd].reshape(B, S, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(B, S, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(B, S, -1, cfg.head_dim)
        else:
            q = wlin(normed, lp, l, "q").reshape(B, S, -1, cfg.head_dim)
            k = wlin(normed, lp, l, "k").reshape(B, S, -1, cfg.head_dim)
            v = wlin(normed, lp, l, "v").reshape(B, S, -1, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)

        ck = ck.at[batch_idx, positions].set(k)
        cv = cv.at[batch_idx, positions].set(v)

        if tp_axis is not None and tp_kv_replicated:
            # KV replicated, Q head-sharded: scatter the local Q heads
            # into the full [NH] layout (zeros elsewhere) so the grouped
            # GQA reshape maps q->kv correctly, then slice local heads
            # back out. Remote-head outputs are computed but discarded;
            # at decode the cost is dominated by the (replicated) cache
            # read either way.
            nh_local = q.shape[2]
            off = jax.lax.axis_index(tp_axis) * nh_local
            qf = jnp.zeros((B, S, cfg.num_heads, cfg.head_dim), q.dtype)
            q = jax.lax.dynamic_update_slice(qf, q, (0, 0, off, 0))
            attn = _attention(q, ck, cv, positions, cfg, attn_sparsity)
            attn = jax.lax.dynamic_slice(
                attn, (0, 0, off, 0), (B, S, nh_local, cfg.head_dim)
            )
        else:
            attn = _attention(q, ck, cv, positions, cfg, attn_sparsity)  # [B,S,NH_local,D]
        attn = attn.reshape(B, S, -1)
        # NOTE (TP): attn_sub_norm is a true RMS over the FULL q_dim; under
        # TP each device holds q_dim/tp of it, so the mean-square is
        # psum-reduced before normalizing.
        if not cfg.sub_norms:
            pass  # Llama-family: no sub-norm before o_proj
        elif tp_axis is None:
            attn = rms_norm(attn, lp["attn_sub"], cfg.rms_norm_eps)
        else:
            af = attn.astype(jnp.float32)
            ms = jax.lax.psum(jnp.sum(af * af, axis=-1, keepdims=True), tp_axis)
            var = ms / cfg.q_dim
            attn = (af * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(attn.dtype) * lp["attn_sub"]
        # Row-parallel partials are psum'd in f32 so the reduction does not
        # round through bf16 per shard.
        o_dt = jnp.float32 if tp_axis is not None else dtype
        h = h + maybe_psum(
            wlin(attn, lp, l, "o", quant_axis=tp_axis, out_dtype=o_dt)
        ).astype(dtype)

        normed = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        if cfg.num_experts > 0:
            # MoE MLP: ternary experts, top-k routing (models/moe.py)
            from .moe import moe_ffn

            experts = {
                f"{n}_qw": lp[f"moe_{n}_qw"] for n in ("gate", "up", "down")
            }
            experts.update(
                {f"{n}_scale": lp[f"moe_{n}_scale"] for n in ("gate", "up", "down")}
            )
            # under TP the mesh's model axis doubles as the EP axis:
            # experts are sharded on it ([L, E/tp, ...] local stacks) and
            # moe_ffn psums the partial combines (attention stays
            # head-sharded TP — the Switch/GShard hybrid layout)
            y, _aux = moe_ffn(
                normed.reshape(B * S, -1), experts, lp["ffn_sub"], lp["router"],
                top_k=cfg.num_experts_per_tok, eps=cfg.rms_norm_eps,
                ep_axis=tp_axis,
            )
            h = h + y.reshape(B, S, -1).astype(dtype)
            return h, (ck, cv)
        if fused and "gateup_qw" in stack:
            gu = wlin(normed, lp, l, "gateup")
            inter = gu.shape[-1] // 2
            gate, up = gu[..., :inter], gu[..., inter:]
        else:
            gate = wlin(normed, lp, l, "gate")
            up = wlin(normed, lp, l, "up")
        if cfg.mlp_act == "silu":  # Llama-family ternary conversions
            act = jax.nn.silu(gate) * up
        else:
            act = jnp.square(jax.nn.relu(gate)) * up  # BitNet ReLU^2, NOT SiLU
        if not cfg.sub_norms:
            pass  # Llama-family: no sub-norm before down_proj
        elif tp_axis is None:
            act = rms_norm(act, lp["ffn_sub"], cfg.rms_norm_eps)
        else:
            af = act.astype(jnp.float32)
            ms = jax.lax.psum(jnp.sum(af * af, axis=-1, keepdims=True), tp_axis)
            var = ms / cfg.intermediate_size
            act = (af * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(act.dtype) * lp["ffn_sub"]
        h = h + maybe_psum(
            wlin(act, lp, l, "down", quant_axis=tp_axis, out_dtype=o_dt)
        ).astype(dtype)
        return h, (ck, cv)

    L = jax.tree.leaves(params["layers"])[0].shape[0]

    # fully-fused batch-1 decode: 2 pallas calls per layer (attention
    # block + MLP block), cache updated IN PLACE inside the attention
    # kernel (aliased operand) — no per-layer cache slice/stack copies.
    attn_mega = getattr(lf, "attn_mega", None) if prologue else None
    mlp_mega = getattr(lf, "mlp_mega", None) if prologue else None
    # flat-cache protocol: a 2-D cache.k ([L*T*KV, D], batch-1 decode)
    # comes from flatten_cache_for_decode(). The manual-DMA attention
    # path consumes it as-is; every other path pays ONE relayout here.
    # Critical because [.., KV=5, 128] is TPU-tile padded (KV 5 -> 8),
    # so reshape 5D<->flat is a ~2 ms full-cache relayout COPY — it
    # must happen once per sequence, never once per decode step.
    _KVh = cfg.num_kv_heads
    _Dh = cfg.head_dim
    flat_cache = cache.k.ndim == 2
    if flat_cache:
        T_cache = cache.k.shape[0] // (L * _KVh)
        _ck5 = None  # materialized lazily by _cache5()
    else:
        T_cache = cache.k.shape[2]

    def _cache5():
        if not flat_cache:
            return cache
        return KVCache(
            cache.k.reshape(L, 1, T_cache, _KVh, _Dh),
            cache.v.reshape(L, 1, T_cache, _KVh, _Dh),
        )

    def _cache_out(new_k, new_v):
        """Return the cache in the SAME format it arrived in."""
        if flat_cache and new_k.ndim != 2:
            new_k = new_k.reshape(L * T_cache * _KVh, _Dh)
            new_v = new_v.reshape(L * T_cache * _KVh, _Dh)
        elif not flat_cache and new_k.ndim == 2:
            new_k = new_k.reshape(L, 1, T_cache, _KVh, _Dh)
            new_v = new_v.reshape(L, 1, T_cache, _KVh, _Dh)
        return KVCache(new_k, new_v)
    # auto kernel: both cache blocks (in+out, k+v) must fit VMEM next
    # to the weight tiles and scratch. The manual-DMA attention variant
    # (unrolled path only) keeps the cache in HBM and supports larger T
    # — accept it when its own gate (attn_manual_tile) passes.
    _auto_cache_ok = (
        T_cache * cfg.num_kv_heads * cfg.head_dim * 2 * 4 <= 8 * 1024 * 1024
    )
    _manual_possible = False
    if (
        not _auto_cache_ok
        and getattr(lf, "attn_mega_manual_stacked", None) is not None
    ):
        from ..ops.ternary_pallas import attn_manual_tile as _amt

        _manual_possible = (
            jax.devices()[0].platform == "tpu"
            and _amt(T_cache, cfg.num_kv_heads, cfg.head_dim) is not None
        )
    use_attn_mega = (
        attn_mega is not None
        and mlp_mega is not None
        and S == 1
        and B == 1
        and cfg.num_experts == 0
        and "gateup_qw" in stack
        and (_auto_cache_ok or _manual_possible)
    )
    if use_attn_mega:
        H, Q = cfg.hidden_size, cfg.q_dim
        inter = stack["down_qw"].shape[1] * 4
        o_rows = _rows(
            stack["o_scale"][:, None] * jnp.ones((1, H)), H
        )
        down_rows = _rows(
            stack["down_scale"][:, None] * jnp.ones((1, H)), H
        )
        iln_rows = _rows(stack["input_ln"], H)
        pln_rows = _rows(stack["post_ln"], H)
        sub_rows = _rows(stack["attn_sub"], Q) if cfg.sub_norms else None
        ffn_rows = _rows(stack["ffn_sub"], inter) if cfg.sub_norms else None
        D = cfg.head_dim
        cos8 = jnp.broadcast_to(cos.reshape(1, D), (8, D))
        sin8 = jnp.broadcast_to(sin.reshape(1, D), (8, D))
        pos0 = start_pos[0]
        mlp_act = "silu" if cfg.mlp_act == "silu" else "relu2"

        split = params.get("layers_split")
        attn_static = getattr(lf, "attn_mega_static", None)
        mlp_static = getattr(lf, "mlp_mega_static", None)
        # manual-DMA attention variant: cache stays in HBM, read bytes
        # scale with pos, RMW row write — bit-exact vs attn_static and
        # ~3x faster (ops/ternary_pallas.py _attn_megakernel_manual)
        attn_manual = getattr(lf, "attn_mega_manual", None)
        manual_tt = None
        if attn_manual is not None and jax.devices()[0].platform == "tpu":
            from ..ops.ternary_pallas import attn_manual_tile

            manual_tt = attn_manual_tile(T_cache, cfg.num_kv_heads, D)
        if split is not None and attn_static is not None and mlp_static is not None:
            # UNROLLED layer loop over pre-split weights: static index
            # maps, no scalar-prefetch (~8-10 us/call cheaper, lab8).
            h2 = hidden.reshape(B, -1)
            ck_ls, cv_ls = [], []
            KVh = cfg.num_kv_heads
            _c5 = _cache5()
            for l in range(L):
                sl = split[l]
                if manual_tt is not None:
                    h2, ckf, cvf = attn_manual(
                        h2, _c5.k[l].reshape(T_cache * KVh, D),
                        _c5.v[l].reshape(T_cache * KVh, D),
                        sl["qkv_qw"], sl["o_qw"], pos0, sl["qkv_scale"],
                        sl["o_scale"], sl["input_ln"], sl.get("attn_sub"),
                        cos8, sin8, q_dim=Q, n_kv=KVh,
                        n_heads=cfg.num_heads, head_dim=D, tt=manual_tt,
                        eps=cfg.rms_norm_eps, norm2=cfg.sub_norms,
                    )
                    ck_l = ckf.reshape(1, T_cache, KVh, D)
                    cv_l = cvf.reshape(1, T_cache, KVh, D)
                    ck_ls.append(ck_l)
                    cv_ls.append(cv_l)
                    h2 = mlp_static(
                        h2, sl["gateup_qw"], sl["down_qw"],
                        sl["gateup_scale"], sl["down_scale"],
                        sl["post_ln"], sl.get("ffn_sub"),
                        eps=cfg.rms_norm_eps, act=mlp_act,
                        norm2=cfg.sub_norms,
                    )
                    continue
                h2, ck_l, cv_l = attn_static(
                    h2, _c5.k[l], _c5.v[l], sl["qkv_qw"], sl["o_qw"],
                    pos0, sl["qkv_scale"], sl["o_scale"], sl["input_ln"],
                    sl.get("attn_sub"), cos8, sin8,
                    q_dim=Q, n_kv=cfg.num_kv_heads, n_heads=cfg.num_heads,
                    head_dim=D, eps=cfg.rms_norm_eps, norm2=cfg.sub_norms,
                )
                h2 = mlp_static(
                    h2, sl["gateup_qw"], sl["down_qw"], sl["gateup_scale"],
                    sl["down_scale"], sl["post_ln"], sl.get("ffn_sub"),
                    eps=cfg.rms_norm_eps, act=mlp_act, norm2=cfg.sub_norms,
                )
                ck_ls.append(ck_l)
                cv_ls.append(cv_l)
            hidden = h2.reshape(B, S, -1)
            new_k = jnp.stack(ck_ls)
            new_v = jnp.stack(cv_ls)
            hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
            if not logits_all:
                hidden = hidden[:, -1]
            if head_fn is not None:
                return head_fn(hidden, params), _cache_out(new_k, new_v)
            logits = compute_logits(hidden, params, cfg)
            return logits, _cache_out(new_k, new_v)

        layer_mega = getattr(lf, "layer_mega", None)

        def mega_step(carry, l):
            h2, ckf, cvf = carry
            if layer_mega is not None:
                # the whole layer as ONE pallas call
                h2, ckf, cvf = layer_mega(
                    h2, ckf, cvf, stack["qkv_qw"], stack["o_qw"],
                    stack["gateup_qw"], stack["down_qw"], l, pos0,
                    stack["qkv_scale"], o_rows, stack["gateup_scale"],
                    down_rows, iln_rows, sub_rows, pln_rows, ffn_rows,
                    cos8, sin8, q_dim=Q, n_kv=cfg.num_kv_heads,
                    n_heads=cfg.num_heads, head_dim=D,
                    eps=cfg.rms_norm_eps, act=mlp_act, norm2=cfg.sub_norms,
                )
                return (h2, ckf, cvf), None
            h2, ckf, cvf = attn_mega(
                h2, ckf, cvf, stack["qkv_qw"], stack["o_qw"], l, pos0,
                stack["qkv_scale"], o_rows, iln_rows, sub_rows, cos8, sin8,
                q_dim=Q, n_kv=cfg.num_kv_heads, n_heads=cfg.num_heads,
                head_dim=D, eps=cfg.rms_norm_eps, norm2=cfg.sub_norms,
            )
            h2 = mega_mlp_call(h2, l)
            return (h2, ckf, cvf), None

        def mega_mlp_call(h2, l):
            return mlp_mega(
                h2, stack["gateup_qw"], stack["down_qw"], l,
                stack["gateup_scale"], down_rows, pln_rows, ffn_rows,
                eps=cfg.rms_norm_eps, act=mlp_act, norm2=cfg.sub_norms,
            )

        # manual-DMA attention in the PRODUCTION scan path: the caches
        # ride as ONE flat aliased [L*T*KV, D] buffer each (no per-layer
        # BlockSpec traffic — the kernel DMAs only rows < pos of its
        # layer and RMWs the new token's row group). Bit-exact vs
        # attn_mega (kernel_lab15); ~3x less attention-kernel time.
        attn_manual_st = getattr(lf, "attn_mega_manual_stacked", None)
        manual_tt = None
        if (
            attn_manual_st is not None
            and layer_mega is None
            and jax.devices()[0].platform == "tpu"
        ):
            from ..ops.ternary_pallas import attn_manual_tile

            manual_tt = attn_manual_tile(T_cache, cfg.num_kv_heads, D)
        if manual_tt is not None:
            KVh = cfg.num_kv_heads

            def mega_step_manual(carry, l):
                h2, ckf, cvf = carry
                h2, ckf, cvf = attn_manual_st(
                    h2, ckf, cvf, stack["qkv_qw"], stack["o_qw"], l,
                    pos0, stack["qkv_scale"], o_rows, iln_rows, sub_rows,
                    cos8, sin8, T=T_cache, q_dim=Q, n_kv=KVh,
                    n_heads=cfg.num_heads, head_dim=D, tt=manual_tt,
                    eps=cfg.rms_norm_eps, norm2=cfg.sub_norms,
                )
                h2 = mega_mlp_call(h2, l)
                return (h2, ckf, cvf), None

            if flat_cache:
                ck0, cv0 = cache.k, cache.v
            else:
                ck0 = cache.k.reshape(L * T_cache * KVh, D)
                cv0 = cache.v.reshape(L * T_cache * KVh, D)
            (h2, new_k, new_v), _ = jax.lax.scan(
                mega_step_manual,
                (hidden.reshape(B, -1), ck0, cv0),
                jnp.arange(L, dtype=jnp.int32),
            )
        else:
            _c5 = _cache5()
            (h2, new_k, new_v), _ = jax.lax.scan(
                mega_step,
                (hidden.reshape(B, -1), _c5.k, _c5.v),
                jnp.arange(L, dtype=jnp.int32),
            )
        hidden = h2.reshape(B, S, -1)
    else:
        _c5 = _cache5()
        hidden, (new_k, new_v) = jax.lax.scan(
            layer_step,
            hidden,
            (params["layers"], _c5.k, _c5.v, jnp.arange(L, dtype=jnp.int32)),
        )

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if not logits_all:
        hidden = hidden[:, -1]
    if head_fn is not None:
        return head_fn(hidden, params), _cache_out(new_k, new_v)
    logits = compute_logits(hidden, params, cfg)
    if tp_axis is not None:
        # head is vocab-sharded: gather the local [.., V/tp] logits
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1, tiled=True)
    return logits, _cache_out(new_k, new_v)


@functools.partial(jax.jit, static_argnames=("cfg", "logits_all"), donate_argnames=("cache",))
def forward_jit(params, cfg, tokens, cache, start_pos, logits_all=False):
    return forward(params, cfg, tokens, cache, start_pos, logits_all=logits_all)


# ---------------------------------------------------------------------------
# Simple generation loop (milestone-A path; production path is the engine)
# ---------------------------------------------------------------------------


def generate(
    params,
    cfg: BitNetConfig,
    prompt_ids,
    max_new_tokens: int = 32,
    max_len: Optional[int] = None,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
):
    """Greedy/sampled batch-1 generation with a contiguous KV cache."""
    from ..ops.sampling import sample_token

    prompt = jnp.asarray(prompt_ids, jnp.int32)[None, :]
    T = max_len or min(cfg.max_position, prompt.shape[1] + max_new_tokens)
    # 8-slot multiple: the manual-DMA decode attention kernel writes
    # the new token's k/v via an aligned RMW of its 8-slot group
    T = min(-(-T // 8) * 8, cfg.max_position)
    cache = KVCache.zeros(cfg, 1, T, cfg.dtype)

    logits, cache = forward_jit(params, cfg, prompt, cache, jnp.zeros((1,), jnp.int32))
    if jax.devices()[0].platform == "tpu":
        from ..ops.ternary_pallas import attn_manual_tile

        if attn_manual_tile(T, cfg.num_kv_heads, cfg.head_dim):
            # one-time relayout for the manual-DMA decode attention path
            cache = flatten_cache_for_decode(cache)
    rng = jax.random.PRNGKey(seed)
    out = list(np.asarray(prompt[0]))
    pos = prompt.shape[1]
    rng, sub = jax.random.split(rng)
    tok = sample_token(logits, sub, temperature=temperature, top_p=top_p)

    for _ in range(max_new_tokens):
        out.append(int(tok[0]))
        if pos + 1 >= T:
            break
        logits, cache = forward_jit(
            params, cfg, tok[:, None], cache, jnp.full((1,), pos, jnp.int32)
        )
        rng, sub = jax.random.split(rng)
        tok = sample_token(logits, sub, temperature=temperature, top_p=top_p)
        pos += 1
    return out
