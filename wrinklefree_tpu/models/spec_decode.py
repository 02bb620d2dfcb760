"""Speculative decoding: device-side n-gram (prompt-lookup) drafting.

New capability vs the reference (its roadmap stops at kernel/scheduler
work): batch-1 decode is HBM-bandwidth-bound, so verifying k draft
tokens in ONE forward costs barely more than decoding one token — any
accepted draft is nearly free throughput. Draft source is PROMPT-LOOKUP
(a.k.a. n-gram speculation): find the most recent occurrence of the
current n-gram in the sequence-so-far and propose the tokens that
followed it. No draft model, no extra weights, exact greedy equality.

Everything lives in ONE jitted scan (device-resident history buffer,
drafting, k+1-token verify forward, acceptance, cache/hist update), so
a whole window of steps costs one dispatch->fetch round trip (~30 ms on
the axon tunnel regardless of content — see scripts/kernel_lab5.py).

Correctness invariant (tests/test_spec_decode.py): greedy speculative
output == greedy vanilla output, token for token. Rejected drafts leave
garbage KV at positions >= seq_len, which is safe: the next window
overwrites those positions before attention can see them (causal mask
only admits keys <= the query position, and in-window keys are written
before attention runs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import BitNetConfig
from .bitnet import forward


def _draft_ngram(hist, seq_len, k: int, n: int):
    """Propose k tokens per row by n-gram lookup in hist [B, H].

    Finds the most recent position p < seq_len-1 whose preceding n-gram
    matches the current tail n-gram, and returns hist[p+1 : p+1+k].
    Rows with no match return (arbitrary) tokens — the verifier accepts
    none of them, which reduces to a vanilla decode step.
    """
    B, H = hist.shape
    pos = jnp.arange(H)[None, :]  # [1, H]
    ok = jnp.ones((B, H), bool)
    # hist is valid through index seq_len (the last emitted token sits at
    # position seq_len; cache holds positions < seq_len)
    for j in range(n):
        # hist[p - j] must equal the j-th token back from the tail
        tail_tok = jnp.take_along_axis(
            hist, jnp.maximum(seq_len[:, None] - j, 0), axis=1
        )  # [B, 1]
        shifted = jnp.roll(hist, j, axis=1)  # hist[p - j] at column p
        ok = ok & (shifted == tail_tok) & (pos - j >= 0)
    # p is the match END (aligned with the tail's last token); candidates
    # must end strictly before the tail. Stale tokens past seq_len can
    # leak into a draft's TAIL via p close to seq_len — harmless: the
    # verifier only emits drafts that equal its own greedy argmax.
    ok = ok & (pos < seq_len[:, None])
    p_star = jnp.max(jnp.where(ok, pos, -1), axis=1)  # [B], -1 = no match
    start = jnp.clip(p_star + 1, 0, H - k)
    draft = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (k,))
    )(hist, start)
    return draft  # [B, k]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "k", "ngram", "linear_fn",
                     "force_accept"),
    donate_argnames=("cache",),
)
def spec_decode_window(
    params,
    cfg: BitNetConfig,
    last_tok: jax.Array,  # [B] int32 — last emitted token per row
    cache,  # KVCache
    start: jax.Array,  # [B] int32 — tokens already in cache
    hist: jax.Array,  # [B, H] int32 — token at its sequence position
    *,
    steps: int,
    k: int = 4,
    ngram: int = 2,
    linear_fn=None,
    force_accept: Optional[int] = None,
):
    """Run `steps` speculative greedy decode steps in one dispatch.

    Returns (tokens [steps, B, k+1], counts [steps, B], last_tok, cache,
    start, hist). Step s emits tokens[s, b, :counts[s, b]] for row b.

    force_accept: COST-HARNESS ONLY (scripts/spec_accept_curve.py) —
    overrides the acceptance count with a fixed value in [0, k] while
    running the identical compute (draft + k+1-token verify forward +
    bookkeeping), so realized tok/s can be measured at a CONTROLLED
    acceptance rate. Outputs are no longer greedy-exact (forced
    acceptance emits unverified drafts); never use outside benchmarks.
    """

    def step(carry, _):
        last, cache, sl, hist = carry
        draft = _draft_ngram(hist, sl, k, ngram)  # [B, k]
        toks = jnp.concatenate([last[:, None], draft], axis=1)  # [B, k+1]
        logits, cache = forward(
            params, cfg, toks, cache, sl, logits_all=True,
            linear_fn=linear_fn,
        )  # [B, k+1, V]
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
        # accepted = longest prefix where draft matches the model's greedy
        match = draft == g[:, :-1]  # [B, k]
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        if force_accept is not None:  # controlled-acceptance cost harness
            acc = jnp.full_like(acc, min(int(force_accept), k))
        n_new = acc + 1  # emitted this step (g[:, :acc] == draft[:, :acc])
        # record emitted tokens at their positions in hist (positions
        # beyond n_new get garbage — overwritten before ever drafted
        # from, because drafting is masked to p < seq_len)
        idx = sl[:, None] + 1 + jnp.arange(k + 1)[None, :]
        bidx = jnp.broadcast_to(
            jnp.arange(hist.shape[0])[:, None], idx.shape
        )
        hist = hist.at[bidx, jnp.clip(idx, 0, hist.shape[1] - 1)].set(g)
        new_last = jnp.take_along_axis(g, acc[:, None], axis=1)[:, 0]
        return (new_last, cache, sl + n_new, hist), (g, n_new)

    (last_tok, cache, start, hist), (toks, counts) = jax.lax.scan(
        step, (last_tok, cache, start, hist), None, length=steps
    )
    return toks, counts, last_tok, cache, start, hist


def generate_spec(
    params,
    cfg: BitNetConfig,
    prompt_ids,
    max_new_tokens: int = 32,
    max_len: Optional[int] = None,
    k: int = 4,
    ngram: int = 2,
    window: int = 8,
    linear_fn=None,
):
    """Greedy batch-1 generation with n-gram speculative decoding.

    Functional twin of models.bitnet.generate(temperature=0) — returns
    the SAME tokens, faster when the output has repeated structure.
    """
    import numpy as np

    from .bitnet import KVCache, forward_jit

    prompt = jnp.asarray(prompt_ids, jnp.int32)[None, :]
    budget = len(prompt_ids) + max_new_tokens + window * (k + 1) + 1
    T = max_len or min(cfg.max_position, budget)
    cache = KVCache.zeros(cfg, 1, T)
    logits, cache = forward_jit(
        params, cfg, prompt, cache, jnp.zeros((1,), jnp.int32)
    )
    last = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(1)
    hist = jnp.zeros((1, T), jnp.int32)
    hist = hist.at[0, : prompt.shape[1]].set(prompt[0])
    hist = hist.at[0, prompt.shape[1]].set(last[0])
    start = jnp.full((1,), prompt.shape[1], jnp.int32)

    out = [int(np.asarray(last)[0])]
    while len(out) < max_new_tokens:
        toks, counts, last, cache, start, hist = spec_decode_window(
            params, cfg, last, cache, start, hist,
            steps=window, k=k, ngram=ngram, linear_fn=linear_fn,
        )
        toks_np = np.asarray(toks)  # [steps, 1, k+1]
        counts_np = np.asarray(counts)  # [steps, 1]
        for s in range(toks_np.shape[0]):
            n = int(counts_np[s, 0])
            out.extend(int(t) for t in toks_np[s, 0, :n])
            if len(out) >= max_new_tokens:
                break
        if int(np.asarray(start)[0]) + window * (k + 1) + 1 >= T:
            break
    return out[:max_new_tokens]
