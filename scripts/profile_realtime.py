#!/usr/bin/env python
"""Realtime per-token latency profile of a LIVE server via SSE.

Analog of reference scripts/profile_sglang_realtime.py:54-205 — TTFT and
inter-token mean/median/p95/min/max against a baseline tok/s.

Usage: INFERENCE_URL=http://localhost:30000 python scripts/profile_realtime.py
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default=os.environ.get("INFERENCE_URL", "http://127.0.0.1:30000"))
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--baseline-toks", type=float, default=26.9,
                    help="reference BitNet.cpp CPU decode (BASELINE.md)")
    ap.add_argument("--prompt", default="Explain how ternary quantization works.")
    args = ap.parse_args()

    from wrinklefree_tpu.client import InferenceClient

    c = InferenceClient(args.url)
    all_gaps, ttfts = [], []
    for run in range(args.runs):
        t0 = time.perf_counter()
        last = None
        gaps = []
        n = 0
        for _chunk in c.generate_stream(
            f"{args.prompt} (run {run})", max_tokens=args.max_tokens, temperature=0.0
        ):
            now = time.perf_counter()
            if last is None:
                ttfts.append(now - t0)
            else:
                gaps.append(now - last)
            last = now
            n += 1
        all_gaps.extend(gaps)
        print(f"run {run}: {n} tokens, ttft {ttfts[-1]*1e3:.1f} ms, "
              f"mean gap {statistics.mean(gaps)*1e3:.2f} ms" if gaps else f"run {run}: {n} tokens",
              file=sys.stderr)

    gaps_ms = sorted(g * 1e3 for g in all_gaps)
    tok_s = 1e3 / statistics.mean(gaps_ms) if gaps_ms else 0.0
    out = {
        "ttft_ms_avg": round(statistics.mean(ttfts) * 1e3, 1),
        "inter_token_ms": {
            "mean": round(statistics.mean(gaps_ms), 2),
            "median": round(statistics.median(gaps_ms), 2),
            "p95": round(gaps_ms[int(0.95 * (len(gaps_ms) - 1))], 2) if gaps_ms else 0,
            "min": round(gaps_ms[0], 2) if gaps_ms else 0,
            "max": round(gaps_ms[-1], 2) if gaps_ms else 0,
        },
        "decode_tok_s": round(tok_s, 1),
        "vs_baseline": round(tok_s / args.baseline_toks, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
