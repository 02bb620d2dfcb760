#!/usr/bin/env python
"""Lab 9: A/B the serving decode step's attention path —
XLA page gather (default) vs the in-kernel Pallas page gather
(WF_PAGED_FLASH_DECODE / ops/flash_attention.flash_paged_decode) —
with chain-slope timing (transport excluded).

Also decomposes: attention-only cost for each path by stubbing linears.

Usage: python scripts/kernel_lab9.py [--slots 16] [--hist 192] [--pp 4]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.kv.paged import PagedKV, paged_forward
from wrinklefree_tpu.models.bitnet import fuse_projections, init_params
from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused


def time_one(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


def slope(fn, n1=16, n2=128, reps=3):
    fn(n1)
    fn(n2)
    t1 = min(time_one(fn, n1) for _ in range(reps))
    t2 = min(time_one(fn, n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--hist", type=int, default=192, help="history tokens/slot")
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--pp", type=int, default=4, help="pages per kernel step")
    args = ap.parse_args()

    cfg = BitNetConfig.bitnet_2b()
    B = args.slots
    ps = args.page_size
    mp = args.hist // ps + 2
    MP = 1
    while MP < mp:
        MP *= 2
    num_pages = B * MP + 8

    params = fuse_projections(init_params(cfg, seed=0), cfg)
    params = jax.device_put(params)
    lf = make_pallas_linear_fused(mega=True)

    pt = jnp.asarray(np.arange(1, B * MP + 1, dtype=np.int32).reshape(B, MP))
    seq0 = jnp.full((B,), args.hist, jnp.int32)
    ones = jnp.ones((B,), jnp.int32)
    toks0 = jnp.ones((B, 1), jnp.int32)

    def make_chain(flash_decode):
        os.environ["WF_PAGED_FLASH_DECODE"] = "1" if flash_decode else "0"

        @functools.partial(
            jax.jit, static_argnames=("steps",), donate_argnums=(1,))
        def fwd_chain(prm, pools, steps):
            def step(carry, i):
                pools, tok, sl = carry
                logits, pools = paged_forward(
                    prm, cfg, tok, pools, pt, sl, ones,
                    linear_fn=lf, kv_write="pallas",
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return (pools, nxt, sl + 1), None

            (pools, tok, sl), _ = jax.lax.scan(
                step, (pools, toks0, seq0), jnp.arange(steps))
            return tok, pools

        return fwd_chain

    for name, flash in (("xla-gather", False), ("pallas-paged", True)):
        chain = make_chain(flash)
        st = {"p": PagedKV.zeros_dual(cfg, num_pages, ps, B)}

        def run(n):
            tok, st["p"] = chain(params, st["p"], n)
            np.asarray(tok)

        s = slope(run)
        print(f"decode step [{name:12s}] (B={B}, hist={args.hist}, MP={MP}): "
              f"{s*1e6:9.1f} us -> {B/s:,.0f} tok/s ceiling")

    # attention-only: linears stubbed to zero-cost identity-ish (tiny dot)
    def lin_zero(x, qw, sw, *a, **k):
        n = qw.shape[-1]
        if k.get("norm") is not None or True:
            pass
        return jnp.zeros(x.shape[:-1] + (n,), x.dtype)

    params2 = jax.device_put(init_params(cfg, seed=0))  # unfused: XLA linear
    for name, flash in (("xla-gather", False), ("pallas-paged", True)):
        os.environ["WF_PAGED_FLASH_DECODE"] = "1" if flash else "0"

        @functools.partial(
            jax.jit, static_argnames=("steps",), donate_argnums=(1,))
        def attn_chain(prm, pools, steps):
            def step(carry, i):
                pools, tok, sl = carry
                logits, pools = paged_forward(
                    prm, cfg, tok, pools, pt, sl, ones,
                    kv_write="pallas",  # XLA linear default
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return (pools, nxt, sl + 1), None

            (pools, tok, sl), _ = jax.lax.scan(
                step, (pools, toks0, seq0), jnp.arange(steps))
            return tok, pools

        st2 = {"p": PagedKV.zeros_dual(cfg, num_pages, ps, B)}

        def run2(n):
            tok, st2["p"] = attn_chain(params2, st2["p"], n)
            np.asarray(tok)

        s = slope(run2)
        print(f"decode step [{name:12s}] XLA-linear variant: {s*1e6:9.1f} us")


if __name__ == "__main__":
    main()
