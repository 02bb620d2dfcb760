#!/usr/bin/env python
"""Decode throughput vs batch size (analog of reference
legacy/benchmark/batch_sweep.py; the reference measured 14.2 tok/s at b1
-> 372.6 at b32 on CPU, notebook.md:337-340).

Usage: python scripts/batch_sweep.py [--batches 1,8,32,64] [--steps 64]
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16,32,64")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
    params = jax.device_put(init_params(cfg, seed=0))
    batches = [int(b) for b in args.batches.split(",")]
    rows = []

    for b in batches:
        max_len = args.prompt_len + args.steps + 8

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step(params, tok, cache, start):
            logits, cache = forward(params, cfg, tok, cache, start, logits_all=False)
            return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

        cache = KVCache.zeros(cfg, b, max_len)
        tok, cache = step(
            params, jnp.ones((b, args.prompt_len), jnp.int32), cache,
            jnp.zeros((b,), jnp.int32),
        )
        tok, cache = step(params, tok[:, :1], cache,
                          jnp.full((b,), args.prompt_len, jnp.int32))
        tok.block_until_ready()

        pos = args.prompt_len + 1
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tok, cache = step(params, tok, cache, jnp.full((b,), pos, jnp.int32))
            pos += 1
        tok.block_until_ready()
        dt = time.perf_counter() - t0
        toks = b * args.steps / dt
        rows.append({"batch": b, "tok_s": round(toks, 1),
                     "ms_per_step": round(dt / args.steps * 1e3, 3)})
        print(f"batch {b:4d}: {toks:10.1f} tok/s  {dt/args.steps*1e3:7.3f} ms/step",
              file=sys.stderr)
        del cache

    print(json.dumps({"sweep": rows, "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
