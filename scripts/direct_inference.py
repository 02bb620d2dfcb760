#!/usr/bin/env python
"""Standalone full-model inference — no engine, no server.

The golden-reference harness (analog of reference
scripts/direct_inference_full.py:328-371): load weights, greedy/sampled
generate with the plain contiguous-KV forward. Useful for bisecting
engine bugs against the simplest possible path.

Usage:
  python scripts/direct_inference.py --model path/to/model --prompt "hi"
  python scripts/direct_inference.py --tiny --ids 1,2,3,4  # no weights needed
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.models.bitnet import generate, init_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--ids", default=None, help="comma-separated token ids")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    tok = None
    if args.model:
        from wrinklefree_tpu.models.loader import load_params, load_tokenizer

        params, cfg = load_params(args.model)
        try:
            tok = load_tokenizer(args.model)
        except Exception:
            tok = None
    else:
        cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
        params = init_params(cfg, seed=0)

    if args.ids:
        prompt_ids = [int(x) for x in args.ids.split(",")]
    elif args.prompt and tok is not None:
        prompt_ids = tok.encode(args.prompt)
    else:
        prompt_ids = [1, 2, 3, 4]

    t0 = time.perf_counter()
    out = generate(
        params, cfg, prompt_ids,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_p=args.top_p, seed=args.seed,
    )
    dt = time.perf_counter() - t0
    new = out[len(prompt_ids):]
    print(f"# {len(new)} tokens in {dt:.2f}s "
          f"({len(new)/dt:.1f} tok/s incl. compile)", file=sys.stderr)
    if tok is not None:
        print(tok.decode(out))
    else:
        print([int(t) for t in out])


if __name__ == "__main__":
    main()
