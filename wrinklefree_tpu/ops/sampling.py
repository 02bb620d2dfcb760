"""Sampling: greedy / temperature / top-k / top-p, all inside jit.

The reference samples on the host per token (reference
scripts/direct_inference_full.py:304-326); here sampling is part of the
jitted decode step so the host loop stays free of per-token math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_top_k(logits: jax.Array, k: jax.Array) -> jax.Array:
    """Mask all but the top-k logits (k may be traced; vocab-size static)."""
    vocab = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    kth = jnp.take_along_axis(
        sorted_logits, jnp.clip(k - 1, 0, vocab - 1)[..., None], axis=-1
    )
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering: keep the smallest set with cumulative prob > p.

    Matches the reference semantics (direct_inference_full.py:313-322):
    tokens strictly after the first index where cumsum exceeds p are dropped.
    """
    sort_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep position i if the cumulative prob BEFORE it is still <= p
    keep = (cum - probs) <= top_p[..., None]
    keep = keep.at[..., 0].set(True)
    masked = jnp.where(keep, sorted_logits, -jnp.inf)
    # unsort back
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(masked, inv, axis=-1)


def apply_penalties(
    logits: jax.Array,  # [B, V] float32
    ring: jax.Array,  # [B, W] int32 — token at seq position p at ring[b, p%W];
    # never-written slots hold -1
    seq_lens: jax.Array,  # [B] int32 tokens so far (next position index)
    last_n: jax.Array,  # [B] int32 penalty window (<= W)
    rep: jax.Array,  # [B] repetition penalty (1.0 = off)
    pres: jax.Array,  # [B] presence penalty (0.0 = off)
    freq: jax.Array,  # [B] frequency penalty (0.0 = off)
) -> jax.Array:
    """Repetition / presence / frequency penalties over a rolling window.

    Semantics match llama.cpp's sampler (the reference's BitNet.cpp
    backend, SURVEY.md §0 backend 2): for tokens seen in the last
    `last_n` positions, positive logits divide by `rep` and negative
    ones multiply by it; OpenAI-style `pres`/`freq` subtract
    pres*[count>0] + freq*count. Defaults (1, 0, 0) are an exact
    identity, and the whole pass is skipped via `lax.cond` when every
    row is at defaults (a [B, V] scatter per decode step is not free).
    """
    B, V = logits.shape
    W = ring.shape[1]

    def _apply(lg):
        j = jnp.arange(W)[None, :]
        # seq position held by ring slot j: largest p <= seq_len-1 with
        # p % W == j (the ring is written at position p -> slot p % W)
        d = (seq_lens[:, None] - 1 - j) % W
        p = seq_lens[:, None] - 1 - d
        valid = (p >= 0) & (p >= seq_lens[:, None] - last_n[:, None])
        ids = jnp.where(valid & (ring >= 0), ring, V)  # V -> dropped
        cnt = jnp.zeros((B, V), jnp.float32).at[
            jnp.arange(B)[:, None], ids
        ].add(1.0, mode="drop")
        present = cnt > 0
        r = rep[:, None]
        rp = jnp.where(lg > 0, lg / r, lg * r)
        out = jnp.where(present, rp, lg)
        return out - freq[:, None] * cnt - pres[:, None] * present.astype(jnp.float32)

    active = jnp.any((rep != 1.0) | (pres != 0.0) | (freq != 0.0))
    return jax.lax.cond(active, _apply, lambda lg: lg, logits)


def apply_logit_bias(
    logits: jax.Array,  # [B, V] float32
    bias_ids: jax.Array,  # [B, K] int32 token ids; -1 = empty slot
    bias_vals: jax.Array,  # [B, K] float32 additive bias
) -> jax.Array:
    """Per-request additive logit bias (OpenAI `logit_bias`, llama.cpp
    `logit_bias`). Each request carries up to K (id, bias) pairs; empty
    slots hold id -1. Bias is added to the logits before sampling (and
    before the logprob distribution is taken), matching OpenAI's
    "added to the logits prior to sampling". The whole scatter is
    skipped via `lax.cond` when no row carries a bias."""
    B, V = logits.shape

    def _apply(lg):
        ids = jnp.where(bias_ids >= 0, bias_ids, V)  # V -> dropped
        add = jnp.zeros((B, V), jnp.float32).at[
            jnp.arange(B)[:, None], ids
        ].add(bias_vals, mode="drop")
        return lg + add

    active = jnp.any(bias_ids >= 0)
    return jax.lax.cond(active, _apply, lambda lg: lg, logits)


def sample_token(
    logits: jax.Array,  # [B, V] float32
    rng: jax.Array,
    temperature=0.0,
    top_p=1.0,
    top_k=0,
    min_p=0.0,
    typical_p=1.0,
    tfs_z=1.0,
    nucleus_candidates: int = 256,
) -> jax.Array:
    """Returns next token ids [B] int32. All sampler params may be
    scalars or per-row [B] arrays; temperature == 0 rows decode
    greedily; top_k == 0 and min_p == 0 and typical_p/tfs_z == 1 are
    identities.

    min_p follows llama.cpp semantics (its default sampler): drop tokens
    whose probability is below min_p * p(max). `typical_p` is
    locally-typical sampling (keep the lowest-|surprise - entropy| set
    with cumulative prob >= p); `tfs_z` is tail-free sampling (drop the
    tail by normalized |second derivative| of the sorted probs). Filter
    order: top_k -> tfs -> typical -> min_p -> top_p (the reference's
    llama-server chain order; min_p/top_p are both sorted-prefix
    filters, so their relative order is immaterial). All filters see
    the post-temperature distribution.

    Hot-path design: filters run over the `nucleus_candidates` largest
    logits only (a full-vocab sort of [B, 128K] costs tens of ms per
    decode step — measured 4x the whole model forward), and the entire
    sampling branch is skipped via `lax.cond` when every row is greedy.
    """
    B, V = logits.shape
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (B,))
    min_p = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (B,))
    typical_p = jnp.broadcast_to(jnp.asarray(typical_p, jnp.float32), (B,))
    tfs_z = jnp.broadcast_to(jnp.asarray(tfs_z, jnp.float32), (B,))

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def do_sample(_):
        safe_t = jnp.where(temperature > 0, temperature, 1.0)
        scaled = logits / safe_t[:, None]
        c = min(nucleus_candidates, V)
        vals, idx = jax.lax.top_k(scaled, c)  # [B, c] descending
        k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, c), c)
        vals = jnp.where(jnp.arange(c)[None, :] < k_eff[:, None], vals, -jnp.inf)

        # tail-free (llama.cpp tfs): drop the flat tail of the sorted
        # distribution by cumulative normalized |p''|
        def tfs(vals):
            # llama.cpp llama_sample_tail_free: candidate i (of the
            # first c-2, which have a second derivative) survives iff
            # the INCLUSIVE cumsum of normalized |p''| through i is
            # <= z; the last two candidates survive only when no prefix
            # exceeded z. Position 0 always survives.
            p = jax.nn.softmax(vals, axis=-1)
            d2 = jnp.abs(p[:, :-2] - 2 * p[:, 1:-1] + p[:, 2:])  # [B, c-2]
            d2 = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-9)
            cum = jnp.cumsum(d2, axis=-1)
            keep2 = cum <= tfs_z[:, None]  # positions 0..c-3
            tail = keep2[:, -1:]  # "never exceeded" -> keep last two
            keep = jnp.concatenate([keep2, tail, tail], axis=1)
            keep = keep.at[:, 0].set(True)
            return jnp.where(keep | (tfs_z >= 1.0)[:, None], vals, -jnp.inf)

        vals = jax.lax.cond(jnp.any(tfs_z < 1.0), tfs, lambda v: v, vals)

        # locally-typical (llama.cpp typical_p): keep tokens closest to
        # the entropy, smallest set with cum prob >= typical_p
        def typical(vals):
            lp = jax.nn.log_softmax(vals, axis=-1)
            p = jnp.exp(lp)
            ent = -jnp.sum(jnp.where(p > 0, p * lp, 0.0), axis=-1, keepdims=True)
            dev = jnp.abs(-lp - ent)  # [B, c]
            order = jnp.argsort(dev, axis=-1)  # ascending deviation
            p_sorted = jnp.take_along_axis(p, order, axis=-1)
            cum = jnp.cumsum(p_sorted, axis=-1)
            keep_sorted = (cum - p_sorted) < typical_p[:, None]
            keep_sorted = keep_sorted.at[:, 0].set(True)
            inv = jnp.argsort(order, axis=-1)
            keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
            return jnp.where(keep | (typical_p >= 1.0)[:, None], vals, -jnp.inf)

        vals = jax.lax.cond(
            jnp.any(typical_p < 1.0), typical, lambda v: v, vals
        )

        # min_p: p_i/p_max >= min_p  <=>  v_i - v_max >= log(min_p);
        # v_max over the SURVIVING candidates (earlier filters can mask
        # sorted position 0)
        vmax = jnp.max(vals, axis=-1, keepdims=True)
        keep_mp = (vals - vmax) >= jnp.log(
            jnp.maximum(min_p, 1e-38)
        )[:, None]
        vals = jnp.where(keep_mp | (min_p <= 0.0)[:, None], vals, -jnp.inf)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) <= top_p[:, None]
        keep = keep.at[:, 0].set(True)
        masked = jnp.where(keep, vals, -jnp.inf)
        if rng.ndim == 2 and rng.shape[0] == B:
            # per-row keys (per-request seeds): gumbel-max per stream
            noise = jax.vmap(lambda k: jax.random.gumbel(k, (c,)))(rng)
            choice = jnp.argmax(masked + noise, axis=-1)
        else:
            choice = jax.random.categorical(rng, masked, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)

    sampled = jax.lax.cond(
        jnp.any(temperature > 0), do_sample, lambda _: greedy, operand=None
    )
    return jnp.where(temperature > 0, sampled, greedy)


def per_request_keys(seeds: jax.Array, counters: jax.Array) -> jax.Array:
    """[B] uint32 seeds + [B] int32 token counters -> [B, 2] keys.

    Gives every request its own deterministic stream independent of batch
    composition/slot placement (so seeded sampling reproduces across
    continuous-batching schedules)."""
    return jax.vmap(lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c))(
        seeds, counters
    )


def sample_token_mirostat(
    logits: jax.Array,  # [B, V] float32
    rng: jax.Array,  # [B, 2] per-row keys
    mu: jax.Array,  # [B] float32 mirostat state (2*tau at request start)
    temperature,
    top_p,
    top_k,
    min_p,
    typical_p,
    tfs_z,
    miro,  # [B] int32: 0 = standard sampler, >0 = mirostat v2
    tau,  # [B] float32 target surprise (bits)
    eta,  # [B] float32 learning rate
    nucleus_candidates: int = 256,
):
    """Mirostat v2 (llama.cpp llama_sample_token_mirostat_v2) fused with
    the standard sampler: rows with miro > 0 cut candidates whose
    surprise (-log2 p) exceeds mu, sample from the remainder, and adapt
    mu -= eta * (observed_surprise - tau); other rows sample exactly as
    `sample_token` and pass mu through. Returns (tokens [B], new_mu [B]).

    Mirostat replaces the other filters for its rows (llama.cpp chains
    temperature -> mirostat only); temperature still applies.
    """
    B, V = logits.shape
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))
    miro = jnp.broadcast_to(jnp.asarray(miro, jnp.int32), (B,))
    tau = jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (B,))
    eta = jnp.broadcast_to(jnp.asarray(eta, jnp.float32), (B,))

    base = sample_token(
        logits, rng, temperature=temperature, top_p=top_p, top_k=top_k,
        min_p=min_p, typical_p=typical_p, tfs_z=tfs_z,
        nucleus_candidates=nucleus_candidates,
    )

    c = min(nucleus_candidates, V)
    safe_t = jnp.where(temperature > 0, temperature, 1.0)
    vals, idx = jax.lax.top_k(logits / safe_t[:, None], c)
    lp = jax.nn.log_softmax(vals, axis=-1)
    surprise = -lp / jnp.log(2.0)  # [B, c] bits
    keep = surprise <= mu[:, None]
    keep = keep.at[:, 0].set(True)  # never empty
    masked = jnp.where(keep, vals, -jnp.inf)
    noise = jax.vmap(lambda k: jax.random.gumbel(k, (c,)))(rng)
    choice = jnp.argmax(masked + noise, axis=-1)  # [B]
    miro_tok = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    obs = jnp.take_along_axis(surprise, choice[:, None], axis=1)[:, 0]
    new_mu = mu - eta * (obs - tau)

    use_miro = (miro > 0) & (temperature > 0)
    tok = jnp.where(use_miro, miro_tok.astype(jnp.int32), base)
    return tok, jnp.where(use_miro, new_mu, mu)
