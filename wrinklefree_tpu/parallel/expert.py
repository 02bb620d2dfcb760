"""Expert parallelism: capacity-bucketed all-to-all MoE dispatch.

The TPU-native EP design (SURVEY.md §2.3 expert-parallel row — the
reference computes MoE single-device only, moe/expert.py:135-201, and
BASELINE.json config 5 asks for experts sharded across hosts):

- mesh axis `expert`: tokens are data-sharded over it AND experts are
  weight-sharded over it (the classic Switch/GShard layout).
- per device: route local tokens against the GLOBAL router, bucket them
  into per-expert capacity slots (static shapes — drops on overflow),
  `lax.all_to_all` the [E, C, H] dispatch tensor so each device receives
  exactly the tokens routed to ITS experts, run the local ternary expert
  FFNs, all_to_all back, weighted-combine.

Collectives ride ICI; everything is shard_map-traced so XLA overlaps the
two all-to-alls with expert compute where the schedule allows. The dense
psum fallback for small expert counts lives in models/moe.py (ep_axis).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.moe import _expert_ffn, load_balancing_loss, router_logits, top_k_route


def capacity_for(num_tokens: int, top_k: int, num_experts: int, factor: float) -> int:
    """Per-expert slot count: ceil(T*k/E * factor), min 1."""
    return max(1, int(-(-num_tokens * top_k * factor // num_experts)))


def _bucket_assignments(top_i: jax.Array, num_experts: int, capacity: int):
    """Slot each (token, choice) assignment into its expert's capacity
    buffer. Returns (pos [T,k] slot index, keep [T,k] bool)."""
    T, k = top_i.shape
    flat_e = top_i.reshape(-1)  # [T*k] in routing priority order
    onehot = jax.nn.one_hot(flat_e, num_experts, dtype=jnp.int32)  # [T*k, E]
    # rank of each assignment within its expert (0-based, arrival order)
    rank = jnp.cumsum(onehot, axis=0) - onehot  # exclusive prefix count
    pos = jnp.sum(rank * onehot, axis=1).reshape(T, k)
    keep = pos < capacity
    return pos, keep


def ep_moe_ffn(
    x: jax.Array,  # [T_local, H] — this device's token shard
    experts,  # pytree, leading [E_local] axis — this device's experts
    ffn_sub: jax.Array,
    w_router: jax.Array,  # [H, E_global] replicated
    *,
    ep_axis: str,
    top_k: int = 2,
    capacity_factor: float = 2.0,
    eps: float = 1e-5,
    lf=None,
    route_override=None,
) -> Tuple[jax.Array, jax.Array]:
    """All-to-all expert-parallel MoE FFN (call under shard_map).

    Tokens over-capacity for an expert lose that expert's contribution
    (their combine weight is zeroed) — standard Switch behavior; size
    `capacity_factor` so drops are rare, or large enough for exactness
    in tests.
    """
    T, H = x.shape
    E = w_router.shape[1]
    ep = jax.lax.psum(1, ep_axis)  # devices on the axis
    e_local = jax.tree.leaves(experts)[0].shape[0]
    assert e_local * ep == E, f"{e_local} experts/device x {ep} != {E}"
    C = capacity_for(T, top_k, E, capacity_factor)

    logits = router_logits(x, w_router)
    probs = jax.nn.softmax(logits, axis=-1)
    if route_override is not None:
        top_w, top_i = route_override
    else:
        top_w, top_i = top_k_route(logits, top_k)

    pos, keep = _bucket_assignments(top_i, E, C)
    w_eff = jnp.where(keep, top_w, 0.0)  # dropped assignments contribute 0

    # scatter local tokens into [E, C, H]; over-capacity assignments get
    # slot C (out of bounds) and are dropped by the scatter itself
    dispatch = jnp.zeros((E, C, H), x.dtype)
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, top_k))
    pos_s = jnp.where(keep, pos, C)
    dispatch = dispatch.at[top_i, pos_s].set(x[t_idx], mode="drop")

    # [E, C, H] -> [ep, E_local, C, H]; all_to_all so device d receives
    # every source's block for ITS experts, stacked on axis 0.
    dispatch = dispatch.reshape(ep, e_local, C, H)
    received = jax.lax.all_to_all(dispatch, ep_axis, split_axis=0, concat_axis=0)

    # run local experts on all received tokens: [E_local, ep*C, H]
    tokens_in = received.transpose(1, 0, 2, 3).reshape(e_local, ep * C, H)

    def run_expert(ew, xe):
        return _expert_ffn(xe, ew, ffn_sub, eps, lf)

    outs = jax.vmap(run_expert)(experts, tokens_in)  # [E_local, ep*C, H]

    # route results back to their source devices
    outs = outs.reshape(e_local, ep, C, H).transpose(1, 0, 2, 3)
    returned = jax.lax.all_to_all(outs, ep_axis, split_axis=0, concat_axis=0)
    returned = returned.reshape(E, C, H)  # [E, C, H] aligned with dispatch

    # combine: y[t] = sum_j w_eff[t,j] * returned[e_j, pos_j]
    # (dropped assignments gather garbage at clip(C) but carry weight 0)
    gathered = returned[top_i, jnp.clip(pos, 0, C - 1)]  # [T, k, H]
    y = jnp.sum(gathered * w_eff[..., None].astype(gathered.dtype), axis=1)

    aux = jax.lax.pmean(load_balancing_loss(probs, top_i, E), ep_axis)
    return y.astype(x.dtype), aux


def make_ep_moe(
    mesh,
    experts,
    ffn_sub,
    w_router,
    *,
    ep_axis: str = "expert",
    top_k: int = 2,
    capacity_factor: float = 2.0,
    eps: float = 1e-5,
):
    """shard_map-wrapped EP MoE: experts sharded on `ep_axis`, tokens
    data-sharded on `ep_axis`, router replicated. Returns f(x [T,H]) ->
    (y [T,H], aux)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ex_specs = jax.tree.map(lambda _: P(ep_axis), experts)
    experts = jax.device_put(
        experts, jax.tree.map(lambda s: NamedSharding(mesh, s), ex_specs)
    )
    ffn_sub = jax.device_put(ffn_sub, NamedSharding(mesh, P()))
    w_router = jax.device_put(w_router, NamedSharding(mesh, P()))

    def body(x, experts, ffn_sub, w_router):
        return ep_moe_ffn(
            x, experts, ffn_sub, w_router, ep_axis=ep_axis, top_k=top_k,
            capacity_factor=capacity_factor, eps=eps,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(ep_axis), ex_specs, P(), P()),
        out_specs=(P(ep_axis), P()),
        check_rep=False,
    )

    def apply(x):
        x = jax.device_put(x, NamedSharding(mesh, P(ep_axis)))
        y, aux = jax.jit(fn)(x, experts, ffn_sub, w_router)
        return y, jnp.mean(aux)

    return apply
