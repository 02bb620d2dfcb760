"""Tensor/data-parallel sharding over a jax.sharding.Mesh.

The reference stubs all of this at world_size=1 (FakeProcessGroup,
reference extern/vllm-cpu-stub/src/vllm/distributed/parallel_state.py:10-75,
SURVEY.md §2.3). Here it is real, TPU-native:

- mesh axes ('data', 'model'); multi-host via jax.distributed.initialize()
  then the same Mesh spanning all processes' devices.
- TP layout (Megatron-style, adapted to ternary packing):
    q/k/v/gate/up : COLUMN-parallel — shard the packed [K/4, N] on N
                    (local heads / local FFN slice), no comms.
    o/down        : ROW-parallel — shard on K/4; partial outputs are
                    psum-reduced over ICI.
    embed (tied)  : vocab-sharded; lookup via psum, logits via tiled
                    all-gather.
    norms         : replicated (sub-norm mean-squares psum'd in-model).
- KV cache: KV heads sharded on 'model', batch on 'data'.

IMPORTANT packing detail: the wf-tpu plane-major layout (ops/ternary.py)
encodes plane offsets relative to the K axis it was packed over, so
ROW-parallel weights must be packed PER SHARD. `repack_params_for_tp`
re-packs o/down so each contiguous K/4-chunk is self-consistent; after
that, a plain contiguous shard of the K/4 axis is exactly the local
packed matrix the kernel expects.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BitNetConfig
from ..models.bitnet import KVCache, forward
from ..ops.ternary import pack_ternary_np, unpack_ternary_np

DATA, MODEL = "data", "model"

COL_PARALLEL = ("q", "k", "v", "gate", "up")
ROW_PARALLEL = ("o", "down")


def tp_kv_replicated(cfg: BitNetConfig, tp: int) -> bool:
    """Decide the KV layout for a TP degree.

    The flagship BitNet-2B has 20 Q / 5 KV heads (reference
    legacy/src/models/bitnet.py:27-37): tp=2/4 cannot shard 5 KV heads.
    In that case k/v projections and the KV cache are REPLICATED across
    the model axis while Q heads (and o/gate/up/down, embed) stay
    sharded — each device computes attention with its local Q heads
    scattered into the full head layout (zero rows for remote heads),
    then slices its own heads back out for the row-parallel o_proj.
    Attention HBM traffic is then full-cache per device (not /tp), but
    the linears — the dominant ternary-decode cost — still shard.

    Raises if tp cannot split the Q heads at all."""
    if cfg.num_heads % tp:
        raise ValueError(
            f"num_heads {cfg.num_heads} not divisible by tp={tp}"
        )
    return bool(cfg.num_kv_heads % tp)


def make_mesh(n_data: int = 1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA, MODEL))


def repack_params_for_tp(params, tp: int):
    """Re-pack row-parallel projections so each K/tp shard is plane-major
    within itself (see module docstring). No-op for tp == 1.

    MoE expert stacks (``moe_*_qw``) are sharded on the EXPERT axis, so
    each expert keeps its full K and needs no repacking."""
    if tp == 1:
        return params
    layers = dict(params["layers"])
    for name in ROW_PARALLEL:
        if f"{name}_qw" not in layers:
            continue  # MoE layers: dense gate/up/down replaced by experts
        qw = np.asarray(layers[f"{name}_qw"])  # [L, K4, N]
        L, k4, n = qw.shape
        if (k4 * 4) % (4 * tp):
            raise ValueError(f"{name}: K={k4*4} not divisible by 4*tp={4*tp}")
        out = np.empty_like(qw)
        for l in range(L):
            w = unpack_ternary_np(qw[l])  # [K, N]
            chunks = np.split(w, tp, axis=0)
            out[l] = np.concatenate([pack_ternary_np(c) for c in chunks], axis=0)
        layers[f"{name}_qw"] = jnp.asarray(out)
    new = dict(params)
    new["layers"] = layers
    return new


def param_partition_specs(params, kv_replicated: bool = False) -> dict:
    """PartitionSpec pytree matching the params structure.

    kv_replicated: k/v projections replicated instead of head-sharded
    (KV-head count not divisible by tp — see tp_kv_replicated)."""
    layers = params["layers"]
    lsp = {}
    for name in COL_PARALLEL:
        if f"{name}_qw" in layers:
            if kv_replicated and name in ("k", "v"):
                lsp[f"{name}_qw"] = P(None, None, None)
            else:
                lsp[f"{name}_qw"] = P(None, None, MODEL)
            lsp[f"{name}_scale"] = P(None)
    for name in ROW_PARALLEL:
        if f"{name}_qw" in layers:
            lsp[f"{name}_qw"] = P(None, MODEL, None)
            lsp[f"{name}_scale"] = P(None)
    # MoE: experts sharded on the model axis (EP), router replicated
    for name in ("gate", "up", "down"):
        if f"moe_{name}_qw" in layers:
            lsp[f"moe_{name}_qw"] = P(None, MODEL, None, None)
            lsp[f"moe_{name}_scale"] = P(None, MODEL)
    if "router" in layers:
        lsp["router"] = P(None, None, None)
    for name in ("input_ln", "post_ln"):
        lsp[name] = P(None, None)
    # sub-norm weights span the head-sharded q_dim / FFN-sharded inter axis
    lsp["attn_sub"] = P(None, MODEL)
    if "moe_gate_qw" in layers:
        # EP experts compute the FULL intermediate dim per device
        lsp["ffn_sub"] = P(None, None)
    else:
        lsp["ffn_sub"] = P(None, MODEL)
    specs = {"embed": P(MODEL, None), "final_norm": P(None), "layers": lsp}
    if "lm_head" in params:
        specs["lm_head"] = P(MODEL, None)
    if "lm_head_q" in params:
        # int8 head follows the vocab sharding (per-row quantization
        # commutes with a row shard)
        specs["lm_head_q"] = P(MODEL, None)
        specs["lm_head_s"] = P(MODEL)
    return specs


def cache_partition_spec(kv_replicated: bool = False) -> P:
    # [L, B, T, KV, D]
    if kv_replicated:
        return P(None, DATA, None, None, None)
    return P(None, DATA, None, MODEL, None)


def put_sharded(x, mesh: Mesh, spec: P):
    """device_put that also works when ``mesh`` spans processes.

    Single-controller: plain jax.device_put. Multi-controller (the
    2-process CPU test / real multi-host pods): every process holds the
    FULL host value, so each addressable device fetches its shard by
    GLOBAL index (make_array_from_callback). NOT
    make_array_from_process_local_data: with full-copy input it
    mis-assembles the global array (measured: every sharded leaf's
    global checksum doubled on a 2-process mesh)."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        x_np = np.asarray(x)
        return jax.make_array_from_callback(x_np.shape, sh, lambda idx: x_np[idx])
    return jax.device_put(x, sh)


def shard_params(params, mesh: Mesh, kv_replicated: bool = False):
    """Put params on the mesh with TP NamedShardings (call
    repack_params_for_tp first when the mesh has a model axis > 1)."""
    specs = param_partition_specs(params, kv_replicated)
    return jax.tree.map(
        lambda x, s: put_sharded(x, mesh, s),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )


def make_tp_forward(cfg: BitNetConfig, mesh: Mesh, *, linear_fn=None, logits_all=False):
    """Build a jitted shard_map'd forward: (params, tokens, cache, start_pos)
    -> (logits, cache). Params/cache must be sharded per the specs above."""
    kv_rep = tp_kv_replicated(cfg, mesh.shape[MODEL])

    def body(params, tokens, cache, start_pos):
        return forward(
            params,
            cfg,
            tokens,
            cache,
            start_pos,
            linear_fn=linear_fn,
            logits_all=logits_all,
            tp_axis=MODEL,
            tp_kv_replicated=kv_rep,
        )

    def build(params):
        cspec = cache_partition_spec(kv_rep)
        in_specs = (
            param_partition_specs(params, kv_rep),
            P(DATA, None),  # tokens [B, S]
            KVCache(cspec, cspec),
            P(DATA),  # start_pos [B]
        )
        out_specs = (
            P(DATA),  # logits replicated over model (all-gathered inside)
            KVCache(cspec, cspec),
        )
        fn = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(2,))

    cache_fn = {}

    def stepper(params, tokens, cache, start_pos):
        if "fn" not in cache_fn:
            cache_fn["fn"] = build(params)
        return cache_fn["fn"](params, tokens, cache, start_pos)

    return stepper
