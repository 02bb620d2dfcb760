#!/usr/bin/env python
"""Continuous-batching serving benchmark — engine-level, no HTTP.

Exercises BASELINE.json configs 2 and 3: prefill-heavy batches and many
concurrent streams through the paged-KV engine with radix caching.
Reports aggregate tok/s, TTFT and latency percentiles.

Usage:
  python scripts/serving_bench.py --streams 64 --prompt-len 128 --new-tokens 64
  python scripts/serving_bench.py --streams 8 --prompt-len 4096 --new-tokens 16  # prefill-heavy
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("WF_PLATFORM"):  # e.g. WF_PLATFORM=cpu for CPU smoke
    # the axon TPU plugin ignores JAX_PLATFORMS; use the config API
    import jax

    jax.config.update("jax_platforms", os.environ["WF_PLATFORM"])

from wrinklefree_tpu.bench.metrics import BenchmarkMetrics  # noqa: E402
from wrinklefree_tpu.config import BitNetConfig, EngineConfig  # noqa: E402
from wrinklefree_tpu.engine import Engine, SamplingParams  # noqa: E402
from wrinklefree_tpu.models.bitnet import init_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--num-pages", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=16,
                    help="KV page tokens; bigger pages = bigger gather "
                         "chunks (the 16-slot decode gather profiled at "
                         "~170 GB/s with 20 KB page chunks) at coarser "
                         "radix-prefix granularity")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="tokens of common prefix across streams (radix test)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", default="bitnet2b",
                    choices=["bitnet2b", "llama8b", "moe"],
                    help="moe = 2B geometry with 8 ternary experts/top-2 "
                         "(BASELINE config 5's single-host slice; EP "
                         "sharding is the TP engine's model axis)")
    ap.add_argument("--kv-layout", default="auto", choices=["auto", "token", "layer"])
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "int8", "fp8_e4m3", "fp8_e5m2"],
                    help="quantized KV runs on the dual layer-major "
                         "layout too (0.5x pool memory)")
    ap.add_argument("--burst", type=int, default=None)
    ap.add_argument("--use-pallas", default=None, choices=[None, "0", "1"])
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative_k (greedy n-gram drafts per step)")
    ap.add_argument("--flash-decode", default=None, choices=[None, "0", "1"],
                    help="in-kernel page-gather decode attention")
    ap.add_argument("--prefill-mode", default="stagger",
                    choices=["stagger", "bucket", "all"],
                    help="prefill round membership (EngineConfig"
                         ".prefill_round_mode)")
    ap.add_argument("--max-prefill-slots", type=int, default=None,
                    help="decode-slot reservation cap")
    ap.add_argument("--prefill-linear", default="auto",
                    choices=["auto", "pallas", "xla"],
                    help="linear path for prefill programs only "
                         "(EngineConfig.prefill_linear)")
    ap.add_argument("--exact-head", type=int, default=0, metavar="K",
                    help="exact-greedy head: int8 scan + bf16 top-K rescore "
                         "+ certificate (argmax-exact; 0 = off)")
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window serving attention width "
                         "(page-skipping gather; kv/paged.py)")
    ap.add_argument("--global-tokens", type=int, default=0)
    ap.add_argument("--repetitive", type=int, default=0, metavar="P",
                    help="build prompts by looping a P-token pattern so "
                         "n-gram speculative drafts actually accept "
                         "(random prompts never bigram-repeat)")
    args = ap.parse_args()

    import numpy as np

    if args.tiny:
        cfg = BitNetConfig.tiny()
    elif args.model == "llama8b":
        cfg = BitNetConfig.llama3_8b_ternary()
    elif args.model == "moe":
        import dataclasses

        # 2B layer geometry, 8 ternary experts, top-2 routing; fewer
        # layers keep single-chip HBM/init sane (weights 8x FFN/layer)
        cfg = dataclasses.replace(
            BitNetConfig.bitnet_2b(), num_layers=8, num_experts=8,
            num_experts_per_tok=2,
        )
    else:
        cfg = BitNetConfig.bitnet_2b()
    max_ctx = min(cfg.max_position, args.prompt_len + args.new_tokens + 64)
    if args.window and args.kv_layout == "auto":
        args.kv_layout = "layer"  # the page-skipping gather needs dual
    ecfg = EngineConfig(
        max_batch_slots=args.slots,
        page_size=args.page_size,
        num_pages=args.num_pages,
        max_context=max_ctx,
        prefill_buckets=tuple(
            b for b in (128, 512, 1024, 2048, 4096) if b <= max_ctx
        ) or (128,),
        kv_layout=args.kv_layout,
        kv_dtype=args.kv_dtype,
        **({"decode_burst": args.burst} if args.burst else {}),
        **({"use_pallas": args.use_pallas == "1"} if args.use_pallas else {}),
        **({"flash_decode": args.flash_decode == "1"}
           if args.flash_decode is not None else {}),
        speculative_k=args.spec,
        exact_head_k=args.exact_head,
        prefill_round_mode=args.prefill_mode,
        prefill_linear=args.prefill_linear,
        max_prefill_slots=args.max_prefill_slots,
        attn_window=args.window,
        attn_global_tokens=args.global_tokens,
    )
    print(f"init {('tiny' if args.tiny else args.model)} model + engine "
          f"(slots={args.slots}, pages={args.num_pages})...", file=sys.stderr)
    params = init_params(cfg, seed=0)
    eng = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(0)
    shared = [int(t) for t in rng.integers(1, cfg.vocab_size, args.shared_prefix)]
    if args.repetitive:
        # looping pattern per stream: greedy continuations repeat it, so
        # the n-gram drafter's bigram lookups hit
        prompts = []
        for _ in range(args.streams):
            pat = [int(t) for t in rng.integers(1, cfg.vocab_size, args.repetitive)]
            body = (pat * (args.prompt_len // len(pat) + 1))[
                : args.prompt_len - args.shared_prefix]
            prompts.append(shared + body)
    else:
        prompts = [
            shared + [int(t) for t in rng.integers(
                1, cfg.vocab_size, args.prompt_len - args.shared_prefix)]
            for _ in range(args.streams)
        ]

    # warmup: compile prefill buckets + decode, INCLUDING the batched
    # admission-wave variants (B = slots rounds and their pow2 tails) —
    # otherwise those compiles land inside the measured window
    print("warmup (compiles)...", file=sys.stderr)
    eng.generate(prompts[0][: args.prompt_len], SamplingParams(max_new_tokens=2))
    wrng = np.random.default_rng(12345)  # disjoint prompts: no radix
    # pollution of the measured run (a chance >=1-page prefix match on
    # random tokens is negligible)
    warm = [
        eng.submit([int(t) for t in wrng.integers(1, cfg.vocab_size, args.prompt_len)],
                   SamplingParams(max_new_tokens=args.new_tokens))
        for i in range(args.slots)
    ]
    while not all(r.finished for r in warm):
        eng.step()
    # replay the measured scenario's SHAPE (stream count, prompt length)
    # with disjoint prompts: prefill-round jits are traced per (bucket,
    # rows) and rows follows the admission wave = stream count, so a
    # slots-only warmup leaves e.g. 8-stream rounds compiling inside the
    # measured window (observed: 7.1 s -> 16.0 s wall on the 8x3968
    # scenario after a kernel change invalidated the compile cache)
    # mirror the measured wave's SHARING structure too: with same-wave
    # prefix sharing, a shared-prefix wave runs leader/follower round
    # shapes (1-row full-bucket rounds, wide suffix-bucket rounds) that
    # disjoint warm prompts never produce — they compiled inside the
    # measured window every trial (radix row [2,2,2], trial-1 decode
    # 43.1 vs 314.8/325.1 warm). Warm shared tokens come from wrng so
    # the measured prompts still share nothing with warmup.
    wshared = [int(t) for t in wrng.integers(
        1, cfg.vocab_size, args.shared_prefix)]
    warm2 = [
        eng.submit(wshared + [int(t) for t in wrng.integers(
            1, cfg.vocab_size, args.prompt_len - args.shared_prefix)],
                   SamplingParams(max_new_tokens=args.new_tokens))
        for i in range(args.streams)
    ]
    while not all(r.finished for r in warm2):
        eng.step()
    # drop warmup's radix residue: near pool capacity it forces
    # eviction churn / preemption-retraction inside the measured wave
    # (the prefill-heavy 1,904 self-rematch tokens + 36% trial spread)
    dropped = eng.reset_prefix_cache()
    print(f"warmup radix residue dropped: {dropped} pages", file=sys.stderr)

    results = [None] * args.streams
    lat, ttft = [None] * args.streams, [None] * args.streams

    def submit_all():
        # submission is host-side queue work (sub-ms for 64 prompts) and
        # runs INLINE before stepping: a submitter thread racing the
        # step loop admitted nondeterministic partial waves, compiling
        # row-count prefill variants inside the measured window (caught
        # by the in-window compile guard: [3,3,3] on 8x3968) and
        # fragmenting rounds — TTFT p50 3.5-6.0 s vs 1.35 s with full
        # waves, 36% trial spread. TTFT is still measured per-request
        # from its own submit timestamp.
        for i, p in enumerate(prompts):
            t_sub = time.perf_counter()

            def mk(i=i, t_sub=t_sub):
                def on_token(tok, fin):
                    if ttft[i] is None:
                        ttft[i] = time.perf_counter() - t_sub
                    if fin:
                        lat[i] = time.perf_counter() - t_sub
                return on_token

            results[i] = eng.submit(
                p, SamplingParams(max_new_tokens=args.new_tokens), on_token=mk()
            )

    # snapshot engine counters: stats accumulate from the warmup passes
    # too, and dividing ALL-TIME prefill tokens by the measured wall
    # inflated total_tok_s ~3x on prefill-heavy scenarios (the warmup
    # replays the full scenario shape twice). Deltas = measured window.
    pre = {k: eng.stats[k]
           for k in ("prefill_tokens", "radix_hit_tokens", "decode_steps")}
    # in-window compile guard (VERDICT r4 item 1): any XLA compile
    # after this snapshot means warmup missed a program variant and the
    # measured wall includes compile/deserialize time — publishers
    # refuse the HEALTHY stamp on a nonzero count
    from wrinklefree_tpu.utils.jaxcache import CompileWatcher

    cw = CompileWatcher()
    cw_snap = cw.snapshot()

    t0 = time.perf_counter()
    submit_all()
    steps = 0
    while any(r is None or not r.finished for r in results):
        if not eng.step():
            time.sleep(0.0005)
        steps += 1
    wall = time.perf_counter() - t0

    out_tokens = sum(len(r.output_ids) for r in results)
    prefill_tokens = eng.stats["prefill_tokens"] - pre["prefill_tokens"]
    m = BenchmarkMetrics.from_latencies(
        [l for l in lat if l], ttfts_s=[t for t in ttft if t],
        total_tokens=out_tokens, total_time_s=wall,
    )
    report = {
        "metric": "continuous-batching serving",
        "model": "tiny" if args.tiny else args.model,
        "streams": args.streams,
        "prompt_len": args.prompt_len,
        "new_tokens": args.new_tokens,
        "slots": args.slots,
        "decode_tok_s": round(out_tokens / wall, 1),
        "total_tok_s": round((out_tokens + prefill_tokens) / wall, 1),
        "ttft_p50_s": round(m.ttft_p50_s, 3),
        "ttft_p95_s": round(m.ttft_p95_s, 3),
        "latency_p50_s": round(m.latency_p50_s, 3),
        "latency_p95_s": round(m.latency_p95_s, 3),
        "wall_s": round(wall, 2),
        "radix_hit_tokens": eng.stats["radix_hit_tokens"] - pre["radix_hit_tokens"],
        "kv_layout": eng.kv_layout, "kv_dtype": args.kv_dtype, "spec_k": args.spec,
        "spec_accept_rate": round(eng.stats.get("spec_accepted", 0) / max(eng.stats.get("spec_drafted", 1), 1), 3), "decode_steps": eng.stats["decode_steps"] - pre["decode_steps"],
        "native_runtime": eng.native_runtime,
    }
    cwd = cw.delta(cw_snap)
    report["in_window_compiles"] = cwd["compiles"]
    report["in_window_compile_s"] = cwd["compile_s"]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
