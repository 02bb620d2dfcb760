#!/usr/bin/env python
"""Per-engine-step wall trace for a prefill-heavy admission wave.

Times every `eng.step()` during an 8x3968 wave at steady state (full
warmup replay first, like serving_bench) and prints one line per step:
step kind (prefill round / decode burst), wall, rows advanced, and the
TTFT timeline. Pinpoints WHERE the ~5 s of host time between the ~1 s
of device work goes (dispatch? fetch? python bookkeeping?), which the
phase profiler's group table cannot see.

    python scripts/prefill_step_trace.py [--streams 8] [--prompt-len
        3968] [--new-tokens 16] [--slots 8]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compilation")


def log(m):
    print(f"[ptrace] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=3968)
    ap.add_argument("--new-tokens", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from wrinklefree_tpu.config import BitNetConfig, EngineConfig
    from wrinklefree_tpu.engine.engine import Engine
    from wrinklefree_tpu.engine.sampling_params import SamplingParams

    cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
    max_ctx = args.prompt_len + args.new_tokens + 64
    ecfg = EngineConfig(
        max_batch_slots=args.slots,
        page_size=16,
        num_pages=4096,
        max_context=max_ctx,
        prefill_buckets=tuple(
            b for b in (128, 512, 1024, 2048, 4096) if b <= max_ctx
        ) or (128,),
    )
    from wrinklefree_tpu.models.bitnet import init_params

    log("building engine...")
    params = init_params(cfg, seed=0)
    eng = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(7)
    prompts = [
        [int(t) for t in rng.integers(1, cfg.vocab_size, args.prompt_len)]
        for _ in range(args.streams)
    ]

    log("warmup replay (2 waves)...")
    for wave in range(2):
        wrng = np.random.default_rng(1000 + wave)
        warm = [
            eng.submit(
                [int(t) for t in
                 wrng.integers(1, cfg.vocab_size, args.prompt_len)],
                # full token budget: warmup must cover every decode
                # program variant the measured wave reaches (ADVICE r4
                # item 2 — max_new_tokens=2 left burst shapes beyond 2
                # tokens compiling inside the measured per-step walls)
                SamplingParams(max_new_tokens=args.new_tokens),
            )
            for _ in range(args.streams)
        ]
        while not all(r.finished for r in warm):
            eng.step()

    log("measured wave:")
    ttft = [None] * args.streams
    t_sub = time.perf_counter()
    results = []
    for i, p in enumerate(prompts):
        def mk(i=i):
            def on_token(tok, fin):
                if ttft[i] is None:
                    ttft[i] = time.perf_counter() - t_sub
            return on_token
        results.append(eng.submit(
            p, SamplingParams(max_new_tokens=args.new_tokens),
            on_token=mk()))

    n = 0
    pre_stats = dict(eng.stats)
    while not all(r.finished for r in results):
        s0 = dict(eng.stats)
        t0 = time.perf_counter()
        eng.step()
        dt = time.perf_counter() - t0
        dpre = eng.stats.get("prefill_tokens", 0) - s0.get(
            "prefill_tokens", 0)
        ddec = eng.stats.get("decode_tokens", 0) - s0.get(
            "decode_tokens", 0)
        kind = ("prefill" if dpre else "decode" if ddec else "other")
        mid = sum(
            1 for r in eng.slots if r is not None and r.pending
        )
        log(f"step {n:3d} {kind:7s} wall {dt*1e3:8.1f} ms  "
            f"+pre {dpre:5d} +dec {ddec:3d}  mid-prefill rows {mid}  "
            f"t+{time.perf_counter()-t_sub:6.2f}s")
        n += 1
    wall = time.perf_counter() - t_sub
    pre_tok = eng.stats["prefill_tokens"] - pre_stats.get(
        "prefill_tokens", 0)
    log(f"wall {wall:.2f}s  prefill {pre_tok} tok "
        f"({pre_tok/wall:.0f} tok/s)")
    log("TTFTs: " + " ".join(
        f"{t:.2f}" if t is not None else "-" for t in ttft))
    # per-phase prefill-round decomposition (engine accumulators):
    # where the wall beyond device time goes (host build / H2D upload /
    # dispatch return / fetch+emit) — VERDICT r4 weak item 4
    ph = {
        k: round(eng.stats.get(k, 0.0) - pre_stats.get(k, 0.0), 3)
        for k in ("prefill_host_s", "prefill_upload_s",
                  "prefill_dispatch_s", "prefill_fetch_emit_s")
    }
    rounds = eng.stats.get("prefill_rounds", 0) - pre_stats.get(
        "prefill_rounds", 0)
    log(f"prefill rounds {rounds}  phase walls {ph}")


if __name__ == "__main__":
    main()
