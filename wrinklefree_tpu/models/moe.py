"""BitNet MoE: ternary experts, top-k routing, identity-router oracle.

Re-design of the reference MoE library (reference moe/expert.py,
moe/router.py, moe/fake_moe.py) the TPU way: instead of a Python
K-of-N gather/scatter loop per expert (reference moe/expert.py:135-201),
dispatch is a dense einsum over a capacity-bucketed one-hot — fully
static shapes, maps onto the MXU, and shards over an 'expert' mesh axis
with all-to-all inserted by XLA (SURVEY.md §2.3 EP row).

Components:
- TopKRouter / IdentityRouter (+ optional jitter) and the Switch-style
  load-balancing aux loss (reference moe/router.py:59-238)
- moe_ffn: ReLU^2 ternary expert FFN with top-k weighted combine
- make_fake_moe / verify identity-router oracle: an N-expert MoE built
  from a dense layer's weights must be bit-identical to the dense layer
  (reference moe/fake_moe.py:232-277) — the correctness gate before any
  real routing is trusted.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig
from ..ops.norms import rms_norm
from ..ops.ternary import pack_ternary_np, quantize_weights_ternary, ternary_linear


# ---------------------------------------------------------------------------
# Routers
# ---------------------------------------------------------------------------


def router_logits(x: jax.Array, w_router: jax.Array) -> jax.Array:
    """x [T, H] @ w_router [H, E] -> [T, E] (router stays full-precision,
    as in the reference: router.py uses a plain nn.Linear)."""
    return jax.lax.dot_general(
        x.astype(jnp.float32),
        w_router.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def top_k_route(
    logits: jax.Array, k: int, *, jitter: float = 0.0, rng: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Softmax-then-top-k routing (reference TopKRouter, moe/router.py:59-128).

    Returns (weights [T, k] summing to 1, expert_idx [T, k])."""
    if jitter > 0.0 and rng is not None:
        logits = logits + jax.random.uniform(
            rng, logits.shape, minval=-jitter, maxval=jitter
        )
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, k)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return top_w, top_i.astype(jnp.int32)


def identity_route(num_tokens: int, k: int, expert: int = 0):
    """All tokens to one expert with weight 1 (reference IdentityRouter,
    moe/router.py:131-200) — the MoE test harness."""
    w = jnp.zeros((num_tokens, k), jnp.float32).at[:, 0].set(1.0)
    i = jnp.full((num_tokens, k), expert, jnp.int32)
    return w, i


def load_balancing_loss(router_probs: jax.Array, expert_idx: jax.Array, num_experts: int) -> jax.Array:
    """Switch/Mixtral aux loss: E * sum(frac_tokens_e * mean_prob_e)
    (reference moe/router.py:203-238)."""
    T = router_probs.shape[0]
    onehot = jax.nn.one_hot(expert_idx[:, 0], num_experts)  # top-1 assignment
    frac_tokens = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(router_probs, axis=0)
    return num_experts * jnp.sum(frac_tokens * mean_prob)


# ---------------------------------------------------------------------------
# Expert FFN
# ---------------------------------------------------------------------------


def _expert_ffn(x, ew, ffn_sub, eps, lf=None):
    """One ReLU^2 ternary expert: gate/up -> relu(gate)^2 * up -> sub-norm
    -> down (reference moe/expert.py:54-86 math, BitNet MLP shape)."""
    lin = lf or (lambda a, qw, s: ternary_linear(a, qw, s))
    gate = lin(x, ew["gate_qw"], ew["gate_scale"])
    up = lin(x, ew["up_qw"], ew["up_scale"])
    act = jnp.square(jax.nn.relu(gate)) * up
    act = rms_norm(act, ffn_sub, eps)
    return lin(act, ew["down_qw"], ew["down_scale"])


def moe_ffn(
    x: jax.Array,  # [T, H]
    experts,  # pytree with leading [E] axis: gate/up/down qweights+scales
    ffn_sub: jax.Array,  # [I]
    w_router: jax.Array,  # [H, E]
    *,
    top_k: int = 2,
    eps: float = 1e-5,
    route_override=None,  # (weights [T,k], idx [T,k]) for identity oracle
    lf=None,
    ep_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dense-dispatch MoE FFN. Every expert processes every token, then a
    [T, E] combine matrix (zeros except routed weights) selects/weights —
    static shapes, no gathers. Compute cost is E/k x a sparse dispatch,
    the right trade below ~8 experts on MXU; capacity-based all-to-all
    dispatch over `ep_axis` is layered on top in parallel/expert.py.

    With ``ep_axis`` set (expert parallelism under shard_map), `experts`
    holds only this device's E/ep shard; the [T, E] combine matrix is
    sliced by axis_index and partial outputs are psum'd over ICI —
    the reference only ever computes MoE single-device (SURVEY.md §2.3).

    Returns (output [T, H], aux_loss scalar)."""
    T = x.shape[0]
    E = w_router.shape[1]  # GLOBAL expert count (router is replicated)

    logits = router_logits(x, w_router)
    probs = jax.nn.softmax(logits, axis=-1)
    if route_override is not None:
        top_w, top_i = route_override
    else:
        top_w, top_i = top_k_route(logits, top_k)

    # combine[t, e] = routed weight of expert e for token t
    combine = jnp.zeros((T, E), x.dtype)
    t_idx = jnp.arange(T)[:, None] * jnp.ones_like(top_i)
    combine = combine.at[t_idx, top_i].add(top_w.astype(x.dtype))

    e_local = jax.tree.leaves(experts)[0].shape[0]
    if ep_axis is not None:
        e0 = jax.lax.axis_index(ep_axis) * e_local
        combine_local = jax.lax.dynamic_slice_in_dim(combine, e0, e_local, axis=1)
    else:
        assert e_local == E, f"experts {e_local} != router {E} (missing ep_axis?)"
        combine_local = combine

    def run_expert(ew):
        return _expert_ffn(x, ew, ffn_sub, eps, lf)  # [T, H]

    outs = jax.vmap(run_expert)(experts)  # [E_local, T, H]
    # f32 combine/psum: the partial-sum order must not round through
    # bf16 per shard, or EP would drift from the single-device sum
    y = jnp.einsum(
        "te,eth->th", combine_local, outs,
        preferred_element_type=jnp.float32,
    )
    if ep_axis is not None:
        y = jax.lax.psum(y, ep_axis)

    aux = load_balancing_loss(probs, top_i, E)
    return y.astype(x.dtype), aux


# ---------------------------------------------------------------------------
# Construction / fake-MoE converter
# ---------------------------------------------------------------------------


def init_moe_experts(cfg: BitNetConfig, num_experts: int, seed: int = 0):
    """Random ternary experts, stacked on a leading [E] axis."""
    rng = np.random.default_rng(seed)
    H, I = cfg.hidden_size, cfg.intermediate_size

    def proj(k, n):
        w = rng.normal(0, 0.02, size=(k, n)).astype(np.float32)
        tern, scale = quantize_weights_ternary(w)
        return pack_ternary_np(tern), np.float32(scale)

    packs = {f"{nm}_qw": [] for nm in ("gate", "up", "down")}
    scales = {f"{nm}_scale": [] for nm in ("gate", "up", "down")}
    dims = {"gate": (H, I), "up": (H, I), "down": (I, H)}
    for _ in range(num_experts):
        for nm, (kk, nn_) in dims.items():
            qw, sc = proj(kk, nn_)
            packs[f"{nm}_qw"].append(qw)
            scales[f"{nm}_scale"].append(sc)
    experts = {k: jnp.asarray(np.stack(v)) for k, v in packs.items()}
    experts.update({k: jnp.asarray(np.asarray(v, np.float32)) for k, v in scales.items()})
    router = jnp.asarray(rng.normal(0, 0.02, size=(H, num_experts)), jnp.float32)
    return experts, router


def make_fake_moe(dense_layer: Dict, num_experts: int):
    """Replicate one dense FFN's weights into E identical experts
    (reference FakeMoEConverter, moe/fake_moe.py:45-193). With an
    identity router the MoE must be bit-identical to the dense FFN."""
    experts = {}
    for nm in ("gate", "up", "down"):
        qw = dense_layer[f"{nm}_qw"]
        sc = dense_layer[f"{nm}_scale"]
        experts[f"{nm}_qw"] = jnp.broadcast_to(qw[None], (num_experts,) + qw.shape)
        experts[f"{nm}_scale"] = jnp.broadcast_to(
            jnp.asarray(sc)[None], (num_experts,)
        )
    return experts


def verify_moe_matches_dense(
    dense_layer: Dict, cfg: BitNetConfig, num_experts: int = 4, tol: float = 0.0
) -> bool:
    """Identity-router oracle (reference moe/fake_moe.py:232-277)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, cfg.hidden_size)), cfg.dtype)

    dense_out = _expert_ffn(
        x,
        {k: dense_layer[k] for k in
         ("gate_qw", "gate_scale", "up_qw", "up_scale", "down_qw", "down_scale")},
        dense_layer["ffn_sub"],
        cfg.rms_norm_eps,
    )

    experts = make_fake_moe(dense_layer, num_experts)
    w_router = jnp.zeros((cfg.hidden_size, num_experts), jnp.float32)
    route = identity_route(x.shape[0], 1, expert=0)
    moe_out, _ = moe_ffn(
        x, experts, dense_layer["ffn_sub"], w_router, top_k=1, route_override=route,
        eps=cfg.rms_norm_eps,
    )
    diff = float(
        jnp.max(jnp.abs(moe_out.astype(jnp.float32) - dense_out.astype(jnp.float32)))
    )
    return diff <= tol
