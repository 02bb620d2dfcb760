#!/usr/bin/env python
"""Capture a jax.profiler trace of prefill + decode steps.

TPU analog of the reference's offline profilers (reference
scripts/profile_forward_pass.py, profile_sglang_overhead.py — component
decomposition of a decode token). Produces a TensorBoard-loadable trace
plus a wall-clock decomposition printed to stderr.

Usage: python scripts/profile_decode.py [--trace-dir /tmp/wf_trace]
       [--steps 16] [--prompt-len 64] [--tiny]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.models.bitnet import KVCache, forward_jit, init_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/wf_trace")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    params = init_params(cfg, seed=0)
    max_len = args.prompt_len + args.steps + 8
    cache = KVCache.zeros(cfg, args.batch, max_len)
    prompt = jnp.ones((args.batch, args.prompt_len), jnp.int32)

    # compile + warm up both programs before tracing
    t0 = time.perf_counter()
    logits, cache = forward_jit(params, cfg, prompt, cache, jnp.zeros((args.batch,), jnp.int32))
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    logits, cache = forward_jit(params, cfg, tok, cache,
                                jnp.full((args.batch,), args.prompt_len, jnp.int32))
    jax.block_until_ready(logits)
    print(f"compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(args.trace_dir):
        t_pref0 = time.perf_counter()
        cache2 = KVCache.zeros(cfg, args.batch, max_len)
        logits, cache2 = forward_jit(params, cfg, prompt, cache2,
                                     jnp.zeros((args.batch,), jnp.int32))
        jax.block_until_ready(logits)
        t_prefill = time.perf_counter() - t_pref0

        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        t_dec0 = time.perf_counter()
        for i in range(args.steps):
            logits, cache2 = forward_jit(
                params, cfg, tok, cache2,
                jnp.full((args.batch,), args.prompt_len + i, jnp.int32),
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        jax.block_until_ready(logits)
        t_decode = time.perf_counter() - t_dec0

    per_tok = t_decode / args.steps
    print(
        f"prefill({args.prompt_len} tok): {t_prefill*1e3:.1f} ms  "
        f"({args.prompt_len/t_prefill:.0f} tok/s)\n"
        f"decode: {per_tok*1e3:.2f} ms/tok ({args.batch/per_tok:.1f} tok/s)\n"
        f"trace written to {args.trace_dir} (tensorboard --logdir {args.trace_dir})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
