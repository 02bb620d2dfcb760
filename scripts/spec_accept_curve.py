#!/usr/bin/env python
"""Speculative-decode acceptance-vs-speedup curve (VERDICT r3 item 7).

The n-gram spec path is token-exact-tested but its VALUE depends on the
workload's acceptance rate — unknown for real weights until they can be
fetched. This harness removes every unknown except acceptance itself:
it forces the acceptance count to each value in [0, k]
(spec_decode_window(force_accept=...)) while running the identical
compute (draft + k+1-token verify forward + bookkeeping), and measures
realized decode tok/s per acceptance level against the vanilla fused
decode window measured in the SAME process.

Output: one JSON line per (k, forced_acc) row + a summary with the
break-even acceptance per k (where spec tok/s crosses vanilla tok/s).

    python scripts/spec_accept_curve.py [--tiny] [--k 2 4 8] [--steps 32]

Timing is fetch-terminated best-of-3 fused windows (the bench.py
methodology: block_until_ready does not wait on the axon tunnel, and a
dispatch->fetch round trip costs ~30 ms regardless of content).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compilation")


def log(m):
    print(f"[spec-curve] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    ap.add_argument("--model", default="bitnet2b",
                    choices=["bitnet2b", "llama8b"])
    ap.add_argument("--k", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--steps", type=int, default=32,
                    help="spec steps per fused window")
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--out", default=None,
                    help="also append rows to this JSON file")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
    from wrinklefree_tpu.models.spec_decode import spec_decode_window

    if args.tiny:
        cfg = BitNetConfig.tiny()
    elif args.model == "llama8b":
        cfg = BitNetConfig.llama3_8b_ternary()
    else:
        cfg = BitNetConfig.bitnet_2b()

    on_tpu = jax.devices()[0].platform == "tpu"
    linear_fn = None
    if on_tpu:
        from wrinklefree_tpu.ops.ternary_pallas import (
            make_pallas_linear_stacked,
        )

        # the spec verify forward is a k+1-row GEMM: the stacked (non-
        # prologue) kernel path covers every k without shape surprises
        linear_fn = make_pallas_linear_stacked()

    max_k = max(args.k)
    P = args.prompt_len
    # window budget: vanilla warm+3 reps, plus per-(k,acc) spec windows
    budget = P + 4 * args.steps + 8
    budget += sum(4 * args.steps * (kk + 1) for kk in args.k)
    max_len = min(cfg.max_position, budget)

    log(f"init {args.model if not args.tiny else 'tiny'} params...")
    params = jax.device_put(init_params(cfg, seed=0))

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,),
                       static_argnames=("steps",))
    def decode_window(params, tok, cache, start, steps):
        def step(carry, _):
            tok, cache, pos = carry
            logits, cache = forward(
                params, cfg, tok, cache, pos, logits_all=False,
                linear_fn=linear_fn,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache, pos + 1), nxt[:, 0]

        (tok, cache, _), toks = jax.lax.scan(
            step, (tok, cache, start), None, length=steps
        )
        return toks, tok, cache

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(params, toks, cache, start):
        logits, cache = forward(params, cfg, toks, cache, start,
                                logits_all=False, linear_fn=linear_fn)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    cache = KVCache.zeros(cfg, 1, max_len)
    toks = jnp.ones((1, P), jnp.int32)
    tok, cache = prefill(params, toks, cache, jnp.zeros((1,), jnp.int32))
    _ = np.asarray(tok)
    pos = P
    log("prefill done; timing vanilla window...")

    def time_best3(fn):
        nonlocal pos
        best = float("inf")
        extra = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            if dt < best:
                best, extra = dt, out
        return best, extra

    # vanilla baseline (same process, same transport conditions)
    toks_w, tok, cache = decode_window(
        params, tok, cache, jnp.full((1,), pos, jnp.int32), args.steps
    )
    _ = np.asarray(toks_w)  # compile + warm
    pos += args.steps

    def run_vanilla():
        nonlocal tok, cache, pos
        toks_w, tok2, cache2 = decode_window(
            params, tok, cache, jnp.full((1,), pos, jnp.int32), args.steps
        )
        n = int(np.asarray(toks_w).shape[0])
        tok, cache = tok2, cache2
        pos += args.steps
        return n

    dt_v, n_v = time_best3(run_vanilla)
    vanilla_toks = n_v / dt_v
    log(f"vanilla: {vanilla_toks:.1f} tok/s ({dt_v / args.steps * 1e3:.2f} ms/tok)")

    rows = []
    breakeven = {}
    for kk in sorted(args.k):
        prev_ratio = None
        for acc in range(kk + 1):
            hist = jnp.zeros((1, max_len), jnp.int32)
            hist = hist.at[0, :pos].set(1)
            last = tok[:, 0]
            start = jnp.full((1,), pos, jnp.int32)
            sargs = dict(steps=args.steps, k=kk, linear_fn=linear_fn,
                         force_accept=acc)

            state = {"last": last, "cache": cache, "start": start,
                     "hist": hist}

            def run_spec():
                toks_s, counts, l2, c2, s2, h2 = spec_decode_window(
                    params, cfg, state["last"], state["cache"],
                    state["start"], state["hist"], **sargs
                )
                c = np.asarray(counts)
                state.update(last=l2, cache=c2, start=s2, hist=h2)
                return int(c.sum())

            tot = run_spec()  # compile + warm
            dt_s, tot = time_best3(run_spec)
            cache = state["cache"]  # windows advanced the cache; reuse
            tok = state["last"][:, None]
            pos = int(np.asarray(state["start"])[0])
            spec_toks = tot / dt_s
            ratio = spec_toks / vanilla_toks
            row = {
                "k": kk, "forced_accept": acc,
                "accept_rate": round(acc / kk, 3),
                "spec_tok_s": round(spec_toks, 1),
                "vanilla_tok_s": round(vanilla_toks, 1),
                "speedup": round(ratio, 3),
                "ms_per_window_step": round(dt_s / args.steps * 1e3, 3),
            }
            rows.append(row)
            log(json.dumps(row))
            if prev_ratio is not None and prev_ratio < 1.0 <= ratio:
                # linear interpolation of the break-even acceptance
                breakeven[kk] = round(
                    (acc - 1 + (1.0 - prev_ratio) / (ratio - prev_ratio))
                    / kk, 3,
                )
            prev_ratio = ratio
        if kk not in breakeven:
            breakeven[kk] = (
                0.0 if rows[-1]["speedup"] >= 1.0 and rows[-(kk + 1)][
                    "speedup"] >= 1.0 else
                (None if rows[-1]["speedup"] < 1.0 else breakeven.get(kk))
            )

    result = {
        "metric": "spec-decode acceptance curve",
        "model": "tiny" if args.tiny else args.model,
        "platform": jax.devices()[0].platform,
        "steps_per_window": args.steps,
        "vanilla_tok_s": round(vanilla_toks, 1),
        "breakeven_accept_rate_per_k": breakeven,
        "rows": rows,
    }
    print(json.dumps(result))
    if args.out:
        from pathlib import Path

        pth = Path(args.out)
        pth.parent.mkdir(parents=True, exist_ok=True)
        pth.write_text(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
