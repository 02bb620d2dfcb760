"""Ring attention: sequence-parallel attention over a mesh axis.

The TPU-native long-context upgrade the reference lacks entirely
(SURVEY.md §5.7: "ring-attention across the mesh for beyond-HBM contexts
— a new capability, not a port"). Q, K, V are sequence-sharded over a
mesh axis; K/V blocks rotate around the ring via `lax.ppermute` while
each device folds every block into a running online-softmax (flash
-attention style m/l/acc state), so the full [S, S] score matrix is
never materialized and per-device KV memory is S/P.

Communication: P-1 ppermute steps of the local KV block over ICI,
overlappable with the block computation by XLA's latency-hiding
scheduler. Exact (up to float reduction order) vs full attention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """One block's contribution, GQA-aware.

    q [B,Sq,NH,D], k/v [B,Sk,KV,D]; returns (scores-max m [B,KV,G,Sq],
    exp-sum l, weighted acc [B,Sq,NH,D]-shaped partials) in f32.
    """
    B, Sq, NH, D = q.shape
    KV = k.shape[2]
    G = NH // KV
    qg = q.reshape(B, Sq, KV, G, D)
    s = jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
    s = s * scale
    mask = k_pos[None, None, None, None, :] <= q_pos[:, None, None, :, None]
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # [B,KV,G,Sq]
    # rows with no visible keys: exp(-inf - -inf) guards via where
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - m_safe[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)  # [B,KV,G,Sq]
    acc = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32))
    return m_safe, l, acc.reshape(B, Sq, NH, D)


def ring_attention(
    q: jax.Array,  # [B, Sq_local, NH, D]
    k: jax.Array,  # [B, Skv_local, KV, D]
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    q_offset: Optional[jax.Array] = None,  # [B] global start of q block
) -> jax.Array:
    """Sequence-parallel attention body (call under shard_map).

    Block ownership: device i holds global positions
    [i*S_local, (i+1)*S_local). With causal=True the mask uses global
    positions, so the result equals full causal attention over the
    gathered sequence.
    """
    B, Sq, NH, D = q.shape
    Skv = k.shape[1]
    KV = k.shape[2]
    G = NH // KV
    P = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / np.sqrt(D)

    base = idx * Sq + (q_offset[:, None] if q_offset is not None else 0)
    q_pos = base + jnp.arange(Sq)[None, :]  # [B, Sq]
    if not causal:
        q_pos = jnp.full_like(q_pos, 2**30)

    m0 = jnp.full((B, KV, G, Sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, KV, G, Sq), jnp.float32)
    acc0 = jnp.zeros((B, Sq, NH, D), jnp.float32)
    perm = [(i, (i + 1) % P) for i in range(P)]  # pass KV around the ring

    def step(carry, step_i):
        m, l, acc, kb, vb = carry
        src = (idx - step_i) % P  # whose block we currently hold
        k_pos = src * Skv + jnp.arange(Skv)  # [Skv]
        mb, lb, accb = _block_attend(q, kb, vb, q_pos, k_pos, scale)
        # mb is always finite (fully-masked rows come back as 0 with l=0),
        # so m_new is finite and exp(m - m_new) -> 0 for the initial -inf m.
        m_new = jnp.maximum(m, mb)
        a_old = jnp.exp(m - m_new)
        a_new = jnp.exp(mb - m_new)
        l = l * a_old + lb * a_new
        # broadcast [B,KV,G,Sq] factors onto [B,Sq,NH,D] accumulators
        def bshape(f):
            return f.transpose(0, 3, 1, 2).reshape(B, Sq, NH)[..., None]
        acc = acc * bshape(a_old) + accb * bshape(a_new)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (m_new, l, acc, kb, vb), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), jnp.arange(P)
    )
    l = jnp.maximum(l, 1e-30)
    def bshape(f):
        return f.transpose(0, 3, 1, 2).reshape(B, Sq, NH)[..., None]
    return (acc / bshape(l)).astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "seq", causal: bool = True):
    """shard_map wrapper: full [B,S,NH,D] q/k/v sharded on S; returns the
    jitted sequence-parallel attention."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, axis_name)

    fn = shard_map(
        partial(ring_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    jfn = jax.jit(fn)

    def apply(q, k, v):
        sh = NamedSharding(mesh, spec)
        return jfn(
            jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)
        )

    return apply
