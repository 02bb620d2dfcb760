"""Jitted serving programs: decode bursts, prefills, warmup.

Split from engine.py (VERDICT r1: separate the jit program builders
from the host scheduler). Every function takes the Engine instance —
these ARE the engine's device-side half; the split is by concern
(tracing/compilation here, host scheduling in engine.py).
"""

from __future__ import annotations

import functools
import logging
import time as _time
from typing import Dict

import jax
import jax.numpy as jnp

from ..kv.paged import PagedKV, paged_forward
from ..ops.sampling import (
    apply_logit_bias,
    apply_penalties,
    per_request_keys,
    sample_token,
    sample_token_mirostat,
)

logger = logging.getLogger(__name__)


def pool_spec(eng):
    """PagedKV PartitionSpecs: KV-head lane axis sharded over 'model'
    (replicated instead when the KV-head count doesn't divide tp —
    parallel/sharding.tp_kv_replicated)."""
    from jax.sharding import PartitionSpec as P

    spec = (
        P(None, None, None, None)
        if getattr(eng, "_tp_kv_rep", False)
        else P(None, None, None, "model")
    )
    return PagedKV(
        spec,
        None if eng.pools.scale is None else spec,
        None if eng.pools.staging is None else spec,
        None if eng.pools.staging_scale is None else spec,
    )

def build_decode(eng, with_logprobs: bool = False,
                  return_logits: bool = False,
                  with_mirostat: bool = False,
                  burst_steps: int | None = None):
    """Fused K-step decode burst: a device-side `lax.scan` samples K
    tokens per slot per dispatch, so tunnel/host round-trips are paid
    once per K tokens instead of per token (the decode-loop-overhead
    trap, SURVEY.md §7; measured 100x on a remote-tunnel TPU).

    State arrays live on device between bursts; the host re-uploads
    them only after scheduling events (admission/finish).

    ``with_logprobs`` builds the logprobs variant (chosen-token
    logprob + top-N per step; full bf16 head — the int8-scan exact
    head can't produce a distribution); the engine selects it per
    burst when an active request asked for logprobs.

    ``return_logits`` builds the constrained-decoding variant: ONE
    step per dispatch that also returns the full post-penalty
    logits, so the host can re-select tokens through a grammar
    validator (engine json_mode path) and feed the corrected token
    back — KV stays exact because a token's KV is written when it is
    FED, not when it is sampled."""
    cfg, lf, af = eng.cfg, eng._linear_fn, eng._attention_fn
    kvw = eng._kv_write
    K = 1 if return_logits else (burst_steps or eng.ecfg.decode_burst)
    tp_axis = "model" if eng.mesh is not None else None
    fd = eng.ecfg.flash_decode
    ek = (
        0 if (with_logprobs or return_logits or with_mirostat)
        else eng.ecfg.exact_head_k
    )
    lp_n = eng.ecfg.logprobs_top if with_logprobs else 0

    def burst(params, pools, last_tokens, page_table, seq_lens, seeds,
              counters, slot_ids, ring, samp, mu=None):
        # samp: per-slot sampler-state pytree (one dict entry per
        # param — adding a sampler knob = one key, no re-plumbing)
        temps, top_ps = samp["temps"], samp["tps"]
        top_ks, min_ps = samp["topks"], samp["minps"]
        typps, tfs = samp["typps"], samp["tfs"]
        reps, pres, freqs = samp["reps"], samp["pres"], samp["freqs"]
        lastn = samp["lastn"]
        bias_ids, bias_vals = samp["bias_ids"], samp["bias_vals"]
        W = ring.shape[1]
        if (lp_n or return_logits) and eng.ecfg.exact_head_k:
            # logprobs / host re-selection need the clean bf16 head
            params = {kk: vv for kk, vv in params.items()
                      if not kk.startswith("lm_head_")}

        def one(carry, _):
            if with_mirostat:
                pools, tok, sl, ctr, ring, mu = carry
            else:
                pools, tok, sl, ctr, ring = carry
                mu = None
            # the token being fed sits at position sl — it's part of
            # the penalty window for the token sampled this step
            ring = ring.at[jnp.arange(tok.shape[0]), sl % W].set(tok)
            logits, pools = paged_forward(
                params, cfg, tok[:, None], pools, page_table, sl,
                jnp.ones_like(sl), linear_fn=lf, attention_fn=af,
                kv_write=kvw, tp_axis=tp_axis,
                tp_kv_replicated=eng._tp_kv_rep, slot_ids=slot_ids,
                flash_decode=fd,
                # exact head: forward returns the final hidden state;
                # the head runs below under a greedy/sampling cond
                head_fn=(lambda h, p: h) if ek else None,
            )
            keys = per_request_keys(seeds, ctr)
            if ek:
                from ..models.bitnet import (
                    compute_logits,
                    greedy_exact_topk,
                )

                hidden = logits  # [B, H]

                def exact(h):
                    # all rows greedy: int8 scan + certified top-k
                    # rescore (internal bf16-head fallback on near-tie)
                    return greedy_exact_topk(
                        h, params, cfg, k=ek, tp_axis=tp_axis
                    )[0]

                def sample(h):
                    # some row samples or penalizes: full bf16 head so
                    # the distribution is exact (int8 entries dropped)
                    clean = {kk: vv for kk, vv in params.items()
                             if not kk.startswith("lm_head_")}
                    lg = compute_logits(h, clean, cfg)
                    if tp_axis is not None:
                        lg = jax.lax.all_gather(
                            lg, tp_axis, axis=lg.ndim - 1, tiled=True
                        )
                    lg = apply_logit_bias(
                        apply_penalties(
                            lg,
                            ring, sl + 1, lastn, reps, pres, freqs,
                        ),
                        bias_ids, bias_vals,
                    )
                    return sample_token(
                        lg, keys, temperature=temps, top_p=top_ps,
                        top_k=top_ks, min_p=min_ps, typical_p=typps,
                        tfs_z=tfs,
                    )

                pen_on = jnp.any(
                    (reps != 1.0) | (pres != 0.0) | (freqs != 0.0)
                ) | jnp.any(bias_ids >= 0)
                nxt = jax.lax.cond(
                    jnp.any(temps > 0) | pen_on, sample, exact, hidden
                )
            else:
                pen = apply_logit_bias(
                    apply_penalties(
                        logits, ring, sl + 1, lastn, reps, pres, freqs
                    ),
                    bias_ids, bias_vals,
                )
                if with_mirostat:
                    nxt, mu = sample_token_mirostat(
                        pen, keys, mu, temps, top_ps, top_ks, min_ps,
                        typps, tfs, samp["miro"], samp["mtau"],
                        samp["meta"],
                    )
                else:
                    nxt = sample_token(
                        pen, keys, temperature=temps, top_p=top_ps,
                        top_k=top_ks, min_p=min_ps, typical_p=typps,
                        tfs_z=tfs,
                    )
            if lp_n:
                # distribution the step actually sampled from
                # (penalized, pre-temperature), OpenAI/llama.cpp style
                full_lp = jax.nn.log_softmax(pen, axis=-1)
                chosen = jnp.take_along_axis(
                    full_lp, nxt[:, None], axis=1
                )[:, 0]
                top_lps, top_ids = jax.lax.top_k(full_lp, lp_n)
                out = (nxt, chosen, top_ids.astype(jnp.int32), top_lps)
            elif return_logits:
                out = (nxt, pen)
            else:
                out = nxt
            if with_mirostat:
                return (pools, nxt, sl + 1, ctr + 1, ring, mu), out
            return (pools, nxt, sl + 1, ctr + 1, ring), out

        if with_mirostat:
            (pools, last, sl, ctr, ring, mu), outs = jax.lax.scan(
                one, (pools, last_tokens, seq_lens, counters, ring, mu),
                None, length=K,
            )
            return outs, pools, last, sl, ctr, ring, mu
        (pools, last, sl, ctr, ring), outs = jax.lax.scan(
            one, (pools, last_tokens, seq_lens, counters, ring), None,
            length=K,
        )
        return outs, pools, last, sl, ctr, ring

    if eng.mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import param_partition_specs

        pspec = pool_spec(eng)
        rep7 = tuple(P() for _ in range(7))
        samp_spec = {k: P() for k in ("temps", "tps", "topks", "minps", "typps", "tfs", "reps", "pres", "freqs", "lastn", "bias_ids", "bias_vals", "miro", "mtau", "meta")}
        out0 = (
            (P(), P(), P(), P()) if with_logprobs
            else ((P(), P()) if return_logits else P())
        )
        extra_in = (P(),) if with_mirostat else ()
        extra_out = (P(),) if with_mirostat else ()
        burst = jax.shard_map(
            burst, mesh=eng.mesh,
            in_specs=(param_partition_specs(eng.params, eng._tp_kv_rep), pspec)
            + rep7 + (samp_spec,) + extra_in,
            out_specs=(out0, pspec, P(), P(), P(), P()) + extra_out,
            check_vma=False,
        )
    return functools.partial(jax.jit, donate_argnums=(1,))(burst)

def build_decode_spec(eng):
    """Speculative decode burst (greedy-only): each scan step drafts
    up to k tokens by n-gram lookup in a device-resident history
    buffer, verifies them in ONE k+1-token forward, and advances by
    the accepted count. Windows clamp to the current KV page
    (win = min(k+1, ps - sl%ps)), so rejected-draft KV lands either
    in the trash or in positions the next real tokens overwrite
    before they become visible (position-triggered page flushes
    re-flush with real content — see kv/paged._dual_write)."""
    cfg, lf, af = eng.cfg, eng._linear_fn, eng._attention_fn
    kvw = eng._kv_write
    K = eng.ecfg.decode_burst
    k = eng.ecfg.speculative_k
    ps = eng.page_size
    ek = eng.ecfg.exact_head_k
    tp_axis = "model" if eng.mesh is not None else None

    from ..models.spec_decode import _draft_ngram

    def burst(params, pools, last_tokens, page_table, seq_lens, seeds,
              counters, slot_ids, hist):
        if ek:
            # spec verify needs full per-position logits: use the
            # clean bf16 head so greedy streams stay exact
            params = {kk: vv for kk, vv in params.items()
                      if not kk.startswith("lm_head_")}
        H = hist.shape[1]
        B = last_tokens.shape[0]

        def one(carry, _):
            pools, tok, sl, hist = carry
            win = jnp.minimum(k + 1, ps - sl % ps).astype(jnp.int32)
            draft = _draft_ngram(hist, sl, k, 2)  # [B, k]
            toks = jnp.concatenate([tok[:, None], draft], axis=1)
            logits, pools = paged_forward(
                params, cfg, toks, pools, page_table, sl, win,
                linear_fn=lf, attention_fn=af, kv_write=kvw,
                tp_axis=tp_axis, tp_kv_replicated=eng._tp_kv_rep,
                slot_ids=slot_ids, logits_all=True,
            )
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
            match = (draft == g[:, :-1]) & (
                jnp.arange(k)[None, :] < win[:, None] - 1
            )
            acc = jnp.sum(
                jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
            )
            n_new = jnp.minimum(acc + 1, win)
            idx = sl[:, None] + 1 + jnp.arange(k + 1)[None, :]
            bidx = jnp.broadcast_to(jnp.arange(B)[:, None], idx.shape)
            hist = hist.at[bidx, jnp.clip(idx, 0, H - 1)].set(g)
            new_last = jnp.take_along_axis(
                g, (n_new - 1)[:, None], axis=1
            )[:, 0]
            return (pools, new_last, sl + n_new, hist), (g, n_new)

        (pools, last, sl, hist), (toks, counts) = jax.lax.scan(
            one, (pools, last_tokens, seq_lens, hist), None, length=K
        )
        return toks, counts, pools, last, sl, hist

    if eng.mesh is not None:
        # TP: per-device program over sharded params/pools (same specs
        # as build_decode); drafts/history/verify bookkeeping are
        # replicated int32, the k+1-token forward runs column/row
        # sharded with the logits all-gathered for argmax verify
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import param_partition_specs

        pspec = pool_spec(eng)
        rep7 = tuple(P() for _ in range(7))
        burst = jax.shard_map(
            burst, mesh=eng.mesh,
            in_specs=(param_partition_specs(eng.params, eng._tp_kv_rep),
                      pspec) + rep7,
            out_specs=(P(), P(), pspec, P(), P(), P()),
            check_vma=False,
        )
    return functools.partial(jax.jit, donate_argnums=(1,))(burst)

def prefill_for_bucket(eng, bucket: int, with_logprobs: bool = False,
                        return_logits: bool = False):
    key = (bucket, with_logprobs, return_logits)
    if key not in eng._prefill_jits:
        cfg, af = eng.cfg, eng._attention_fn
        # prefill may run a different linear path than decode
        lf = getattr(eng, '_prefill_linear_fn', eng._linear_fn)
        kvw = eng._kv_write
        tp_axis = "model" if eng.mesh is not None else None

        ek = eng.ecfg.exact_head_k
        lp_n = eng.ecfg.logprobs_top if with_logprobs else 0

        def prefill(params, pools, tokens, page_table, seq_len, new_len,
                    seeds, counters, slot_ids, ring, samp):
            temp, top_p = samp["temps"], samp["tps"]
            top_k, min_p = samp["topks"], samp["minps"]
            typp, tfs = samp["typps"], samp["tfs"]
            reps, pres, freqs = samp["reps"], samp["pres"], samp["freqs"]
            lastn = samp["lastn"]
            bias_ids, bias_vals = samp["bias_ids"], samp["bias_vals"]
            if ek:
                # exact-head mode: prefill always uses the clean bf16
                # head (its cost is negligible next to prefill compute)
                params = {kk: vv for kk, vv in params.items()
                          if not kk.startswith("lm_head_")}
            logits, pools = paged_forward(
                params, cfg, tokens, pools, page_table, seq_len, new_len,
                linear_fn=lf, attention_fn=af, kv_write=kvw, tp_axis=tp_axis,
                tp_kv_replicated=eng._tp_kv_rep, slot_ids=slot_ids,
            )
            logits = apply_logit_bias(
                apply_penalties(
                    logits, ring, seq_len + new_len, lastn, reps, pres,
                    freqs,
                ),
                bias_ids, bias_vals,
            )
            keys = per_request_keys(seeds, counters)
            nxt = sample_token(logits, keys, temperature=temp, top_p=top_p,
                               top_k=top_k, min_p=min_p,
                               typical_p=typp, tfs_z=tfs)
            # pad: single-element D2H fetches hit a pathological slow
            # path over remote-tunnel transports
            padded = jnp.pad(nxt, (0, 63))
            if lp_n:
                full_lp = jax.nn.log_softmax(logits, axis=-1)
                chosen = jnp.take_along_axis(
                    full_lp, nxt[:, None], axis=1
                )[:, 0]
                top_lps, top_ids = jax.lax.top_k(full_lp, lp_n)
                return (padded, chosen, top_ids.astype(jnp.int32),
                        top_lps), pools
            if return_logits:
                # constrained first token: host re-selects through
                # the grammar validator from the full distribution
                return (padded, logits), pools
            return padded, pools

        if eng.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.sharding import param_partition_specs

            pspec = pool_spec(eng)
            rep8 = tuple(P() for _ in range(8))
            samp_spec = {k: P() for k in ("temps", "tps", "topks", "minps", "typps", "tfs", "reps", "pres", "freqs", "lastn", "bias_ids", "bias_vals", "miro", "mtau", "meta")}
            out0 = (
                (P(), P(), P(), P()) if with_logprobs
                else ((P(), P()) if return_logits else P())
            )
            prefill = jax.shard_map(
                prefill, mesh=eng.mesh,
                in_specs=(param_partition_specs(eng.params, eng._tp_kv_rep),
                          pspec)
                + rep8 + (samp_spec,),
                out_specs=(out0, pspec),
                check_vma=False,
            )
        eng._prefill_jits[key] = functools.partial(
            jax.jit, donate_argnums=(1,)
        )(prefill)
    return eng._prefill_jits[key]



def warmup(eng, *, prefill_batches=(1,), page_buckets=None,
           full: bool = False) -> Dict[str, float]:
    """Precompile the serving programs at their production shapes
    (VERDICT r1 item 7: a cold server otherwise eats a multi-minute
    XLA compile on the FIRST request per prefill bucket — 249 s
    recorded for the 2B prefill in BENCH_r01.json).

    AOT ``jit.lower(...).compile()`` on ShapeDtypeStructs: no state
    is touched, nothing is dispatched, and with
    JAX_COMPILATION_CACHE_DIR set the compilations persist across
    restarts, so a warmed-up boot serves its first request at
    steady-state TTFT.

    Warms: the decode burst at the first page bucket (plus ALL page
    buckets with ``full=True``) and every prefill bucket at batch
    sizes ``prefill_batches``. Returns {program: seconds}.
    """
    import time as _time

    S = len(eng.slots)
    W = eng.ecfg.penalty_window
    Kb = eng.ecfg.logit_bias_slots

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt)

    def live(x):
        # NO sharding= here: attaching the arrays' shardings bakes
        # sdy.sharding annotations into the lowered module, so the
        # warmup compile landed under a DIFFERENT persistent-cache key
        # than the live call (which lowers uncommitted arrays without
        # annotations) — the first request recompiled everything warmup
        # had just compiled (cold-boot measurement, RESULTS.md)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    params_s = jax.tree.map(live, eng.params)
    pools_s = jax.tree.map(
        live, eng.pools,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )

    def samp_s(B):
        d = {
            k: sds((B,), jnp.float32)
            for k in ("temps", "tps", "minps", "typps", "tfs", "reps",
                      "pres", "freqs", "mtau", "meta")
        }
        d.update({k: sds((B,), jnp.int32) for k in ("topks", "lastn", "miro")})
        d["bias_ids"] = sds((B, Kb), jnp.int32)
        d["bias_vals"] = sds((B, Kb), jnp.float32)
        return d

    if page_buckets is None:
        page_buckets = [8]
        if full:
            mp = 8
            while mp < eng.max_pages_per_seq:
                mp *= 2
                page_buckets.append(mp)

    timings: Dict[str, float] = {}
    for mp in page_buckets:
        t0 = _time.perf_counter()
        # mu is a REAL array in the live call (engine.py _upload_state)
        # — lowering with the mu=None default produced a different
        # signature, so the first real burst recompiled (~5 s) despite
        # warmup (cold-boot measurement, RESULTS.md)
        eng._decode_jit.lower(
            params_s, pools_s, sds((S,), jnp.int32), sds((S, mp), jnp.int32),
            sds((S,), jnp.int32), sds((S,), jnp.uint32), sds((S,), jnp.int32),
            sds((S,), jnp.int32), sds((S, W), jnp.int32), samp_s(S),
            sds((S,), jnp.float32),
        ).compile()
        timings[f"decode_burst[mp={mp}]"] = _time.perf_counter() - t0

        if full:
            # adaptive short-burst variants (engine _dispatch_burst):
            # K/2^i down to 8, engaged when every row's remaining
            # budget fits a shorter burst
            k = eng.ecfg.decode_burst
            while k // 2 >= 8:
                k //= 2
                if k not in eng._decode_jits_k:
                    eng._decode_jits_k[k] = build_decode(eng, burst_steps=k)
                t0 = _time.perf_counter()
                eng._decode_jits_k[k].lower(
                    params_s, pools_s, sds((S,), jnp.int32),
                    sds((S, mp), jnp.int32), sds((S,), jnp.int32),
                    sds((S,), jnp.uint32), sds((S,), jnp.int32),
                    sds((S,), jnp.int32), sds((S, W), jnp.int32),
                    samp_s(S), sds((S,), jnp.float32),
                ).compile()
                timings[f"decode_burst[mp={mp},K={k}]"] = (
                    _time.perf_counter() - t0
                )

    for bucket in eng.ecfg.prefill_buckets:
        # the live prefill's page-table width is
        # _pages_bucket(seq_len + chunk + 1), NOT a constant: warm the
        # fresh-request width for this bucket (first-request TTFT is
        # the product story), plus every width under full=True
        mps = {eng._pages_bucket(bucket + 1)}
        if full:
            mps.update(page_buckets)
        for B in prefill_batches:
            for mp_pre in sorted(mps):
                t0 = _time.perf_counter()
                prefill_for_bucket(eng, bucket).lower(
                    params_s, pools_s, sds((B, bucket), jnp.int32),
                    sds((B, mp_pre), jnp.int32), sds((B,), jnp.int32),
                    sds((B,), jnp.int32), sds((B,), jnp.uint32),
                    sds((B,), jnp.int32), sds((B,), jnp.int32),
                    sds((B, W), jnp.int32), samp_s(B),
                ).compile()
                timings[f"prefill[{bucket}x{B}@mp{mp_pre}]"] = (
                    _time.perf_counter() - t0
                )
    logger.info(
        "warmup compiled %d programs in %.1f s: %s",
        len(timings), sum(timings.values()),
        {k: round(v, 2) for k, v in timings.items()},
    )
    return timings

