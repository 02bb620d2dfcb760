#!/usr/bin/env python
"""Repetition-bug bisection harness.

Analog of reference scripts/debug_repetition.py:1-187: sweep prompt
lengths and kernel on/off to localize degenerate (repeating) output —
the failure mode the reference hit when pack layouts drifted. Reports
the longest single-token run per configuration.

Usage: python scripts/debug_repetition.py [--tiny] [--lengths 4,16,64,256]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.models.bitnet import generate, init_params  # noqa: E402


def longest_run(ids):
    best = run = 1
    for a, b in zip(ids, ids[1:]):
        run = run + 1 if a == b else 1
        best = max(best, run)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--lengths", default="4,16,64,256")
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--repeat-threshold", type=int, default=8)
    args = ap.parse_args()

    if args.model:
        from wrinklefree_tpu.models.loader import load_params

        params, cfg = load_params(args.model)
    else:
        cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
        params = init_params(cfg, seed=0)

    rng = np.random.default_rng(0)
    suspicious = 0
    for n in (int(x) for x in args.lengths.split(",")):
        if n >= cfg.max_position - args.new_tokens:
            continue
        prompt = [int(t) for t in rng.integers(1, cfg.vocab_size, n)]
        for lf_name in ("xla",):
            out = generate(params, cfg, prompt, max_new_tokens=args.new_tokens)
            new = out[n:]
            run = longest_run(new)
            uniq = len(set(new))
            flag = " <-- SUSPICIOUS" if run >= args.repeat_threshold and uniq <= 2 else ""
            print(f"len {n:5d} [{lf_name}]: longest run {run:3d}, "
                  f"{uniq:3d} unique / {len(new)}{flag}", file=sys.stderr)
            if flag:
                suspicious += 1
    print(f"{'FAIL' if suspicious else 'OK'}: {suspicious} suspicious configs")
    sys.exit(1 if suspicious else 0)


if __name__ == "__main__":
    main()
