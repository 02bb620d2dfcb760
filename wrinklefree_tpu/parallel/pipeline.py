"""Pipeline parallelism: GPipe-style microbatched stages over a mesh axis.

The reference stubs PP at world_size=1 (reference
extern/vllm-cpu-stub/src/vllm/distributed/parallel_state.py:27-60;
SURVEY.md §2.3 "optional: layer-stage pjit or collective-permute
microbatching"). TPU-native design:

- Parameters are already STACKED on a leading [L] layer axis for
  `lax.scan` (models/bitnet.py), so stage sharding is just
  PartitionSpec('stage') on that axis — stage s holds layers
  [s*L/S, (s+1)*L/S) and the KV cache slices for those layers.
- Activations flow stage-to-stage with `lax.ppermute`; M microbatches
  keep all S stages busy after an S-1 tick fill (total S+M-1 ticks).
- Embedding and the tied-embedding logits matmul are replicated; the
  final stage's hidden states are psum-broadcast so every device
  returns identical logits.

Useful when a model's layers don't fit one chip (e.g. ternary 70B+ on
v5e-16) — for 2B, TP (parallel/sharding.py) is the right axis; this
module exists for completeness and composes with it (mesh
('stage', 'model')).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BitNetConfig
from ..models.bitnet import KVCache, forward


def stage_partition_specs(params) -> dict:
    """PartitionSpecs: per-layer stacks sharded on the layer axis,
    embeddings/final norm replicated."""
    specs = {"embed": P(), "final_norm": P()}
    if "lm_head" in params:
        specs["lm_head"] = P()
    specs["layers"] = {k: P("stage") for k in params["layers"]}
    return specs


def shard_params_pp(params, mesh: Mesh):
    specs = stage_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def make_pp_forward(
    cfg: BitNetConfig,
    mesh: Mesh,
    *,
    num_microbatches: int = 2,
    axis: str = "stage",
    logits_all: bool = False,
):
    """Build f(params, tokens [B,S], cache, start [B]) -> (logits, cache).

    B must be divisible by num_microbatches. The cache is stage-sharded on
    its layer axis; `forward`'s own scan runs the LOCAL layers per stage
    (head counts and layer counts are derived from array shapes).
    """
    S = mesh.shape[axis]
    if cfg.num_layers % S:
        raise ValueError(f"num_layers {cfg.num_layers} % stages {S} != 0")
    M = num_microbatches

    # Per-stage body: embed locally, run local layers for my microbatch
    # schedule, pass activations along the ring.
    def body(params, tokens, k_cache, v_cache, start):
        stage = jax.lax.axis_index(axis)
        B, S_len = tokens.shape
        mb = B // M
        dtype = cfg.dtype

        embed = params["embed"]
        hidden0 = embed[tokens].astype(dtype)  # [B, S_len, H] (replicated work)
        hidden0 = hidden0.reshape(M, mb, S_len, H := cfg.hidden_size)
        start_mb = start.reshape(M, mb)
        tokens_mb = tokens.reshape(M, mb, S_len)

        # local layer sub-forward: reuse the model forward WITHOUT the
        # embedding/logits ends by driving its scan directly
        from ..models.bitnet import _attention
        from ..ops.norms import rms_norm
        from ..ops.rope import apply_rope, rope_cos_sin
        from ..models.bitnet import default_linear as lf

        def run_local_layers(h, ck_all, cv_all, start_v):
            # h [mb, S_len, H]; ck_all/cv_all [L_local, mb, T, KV, D]
            positions = start_v[:, None] + jnp.arange(S_len)[None, :]
            cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, dtype)
            batch_idx = jnp.arange(mb)[:, None] * jnp.ones((1, S_len), jnp.int32)

            def layer_step(hh, xs):
                lp, ck, cv = xs
                normed = rms_norm(hh, lp["input_ln"], cfg.rms_norm_eps)
                q = lf(normed, lp["q_qw"], lp["q_scale"]).reshape(mb, S_len, -1, cfg.head_dim)
                k = lf(normed, lp["k_qw"], lp["k_scale"]).reshape(mb, S_len, -1, cfg.head_dim)
                v = lf(normed, lp["v_qw"], lp["v_scale"]).reshape(mb, S_len, -1, cfg.head_dim)
                q, k = apply_rope(q, k, cos, sin)
                ck = ck.at[batch_idx, positions].set(k)
                cv = cv.at[batch_idx, positions].set(v)
                attn = _attention(q, ck, cv, positions, cfg).reshape(mb, S_len, -1)
                if cfg.sub_norms:
                    attn = rms_norm(attn, lp["attn_sub"], cfg.rms_norm_eps)
                hh = hh + lf(attn, lp["o_qw"], lp["o_scale"])
                normed = rms_norm(hh, lp["post_ln"], cfg.rms_norm_eps)
                gate = lf(normed, lp["gate_qw"], lp["gate_scale"])
                up = lf(normed, lp["up_qw"], lp["up_scale"])
                if cfg.mlp_act == "silu":
                    act = jax.nn.silu(gate) * up
                else:
                    act = jnp.square(jax.nn.relu(gate)) * up
                if cfg.sub_norms:
                    act = rms_norm(act, lp["ffn_sub"], cfg.rms_norm_eps)
                hh = hh + lf(act, lp["down_qw"], lp["down_scale"])
                return hh, (ck, cv)

            hh, (ck_new, cv_new) = jax.lax.scan(
                layer_step, h, (params["layers"], ck_all, cv_all)
            )
            return hh, ck_new, cv_new

        perm = [(i, (i + 1) % S) for i in range(S)]
        outputs = jnp.zeros((M, mb, S_len, H), dtype)
        carry_h = jnp.zeros((mb, S_len, H), dtype)

        def tick(t, state):
            outputs, carry_h, ck_all, cv_all = state
            incoming = jax.lax.ppermute(carry_h, axis, perm)
            mb_idx = t - stage
            active = (mb_idx >= 0) & (mb_idx < M)
            mb_c = jnp.clip(mb_idx, 0, M - 1)
            h_in = jnp.where(stage == 0, hidden0[jnp.clip(t, 0, M - 1)], incoming)
            start_v = start_mb[mb_c]
            h_out, ck_new, cv_new = run_local_layers(h_in, ck_all, cv_all, start_v)
            # only commit KV/output when this tick is active for my stage
            ck_all = jnp.where(active, ck_new, ck_all)
            cv_all = jnp.where(active, cv_new, cv_all)
            carry_h = jnp.where(active, h_out, incoming)
            is_last = stage == (S - 1)
            outputs = jnp.where(
                active & is_last, outputs.at[mb_c].set(h_out), outputs
            )
            return outputs, carry_h, ck_all, cv_all

        # NOTE: microbatches share the KV pools sliced per microbatch; to
        # keep shapes static each stage carries [L_local, M, mb, T, KV, D]
        # and updates only its active microbatch's slice.
        L_local = jax.tree.leaves(params["layers"])[0].shape[0]
        T_cache = k_cache.shape[2]
        ck_all = k_cache.reshape(L_local, M, mb, T_cache, -1, cfg.head_dim)
        cv_all = v_cache.reshape(L_local, M, mb, T_cache, -1, cfg.head_dim)

        def tick_mb(t, state):
            outputs, carry_h, ck_all, cv_all = state
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            o, c, ck_mb, cv_mb = tick(
                t, (outputs, carry_h, ck_all[:, mb_idx], cv_all[:, mb_idx])
            )
            ck_all = ck_all.at[:, mb_idx].set(ck_mb)
            cv_all = cv_all.at[:, mb_idx].set(cv_mb)
            return o, c, ck_all, cv_all

        outputs, carry_h, ck_all, cv_all = jax.lax.fori_loop(
            0, S + M - 1, tick_mb, (outputs, carry_h, ck_all, cv_all)
        )

        hidden = outputs.reshape(B, S_len, H)
        # broadcast the last stage's result to every device
        hidden = jax.lax.psum(
            jnp.where(stage == S - 1, hidden, jnp.zeros_like(hidden)), axis
        )
        hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
        if not logits_all:
            hidden = hidden[:, -1]
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = jax.lax.dot_general(
            hidden, head,
            dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        new_k = ck_all.reshape(L_local, B, T_cache, -1, cfg.head_dim)
        new_v = cv_all.reshape(L_local, B, T_cache, -1, cfg.head_dim)
        return logits, new_k, new_v

    def apply(params, tokens, cache: KVCache, start):
        specs = stage_partition_specs(params)
        cache_spec = P("stage")
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P(), cache_spec, cache_spec, P()),
            out_specs=(P(), cache_spec, cache_spec),
            check_rep=False,
        )
        logits, nk, nv = jax.jit(fn)(params, tokens, cache.k, cache.v, start)
        return logits, KVCache(nk, nv)

    return apply
