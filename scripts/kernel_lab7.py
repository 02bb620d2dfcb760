#!/usr/bin/env python
"""Lab 7: decompose the SERVING decode step (batch=slots, paged dual-KV)
with chain-slope timing, mirroring the engine's decode burst.

Components:
  1. full paged_forward chain (B slots, dual layout, pallas writes)
  2. linear-only chain (same kernels, attention stubbed to zeros)
  3. attention-gather-only chain (dual-layout history gather + GQA core)

Usage: python scripts/kernel_lab7.py [--slots 16] [--hist 192]
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


def slope(fn, n1=16, n2=128, reps=2):
    fn(n1)
    fn(n2)
    t1 = min(time_one(fn, n1) for _ in range(reps))
    t2 = min(time_one(fn, n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def time_one(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--hist", type=int, default=192, help="history tokens/slot")
    ap.add_argument("--page-size", type=int, default=16)
    args = ap.parse_args()

    cfg = BitNetConfig.bitnet_2b()
    B = args.slots
    ps = args.page_size
    mp = args.hist // ps + 2
    # pow2 table width like the engine
    MP = 1
    while MP < mp:
        MP *= 2
    num_pages = B * MP + 8

    params = fuse_projections(init_params(cfg, seed=0), cfg)
    params = jax.device_put(params)
    lf = make_pallas_linear_fused(mega=True)

    pools = PagedKV.zeros_dual(cfg, num_pages, ps, B)
    pt = jnp.asarray(
        np.arange(1, B * MP + 1, dtype=np.int32).reshape(B, MP)
    )
    seq0 = jnp.full((B,), args.hist, jnp.int32)
    ones = jnp.ones((B,), jnp.int32)
    toks0 = jnp.ones((B, 1), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
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

    st = {"p": pools}

    def run_fwd(n):
        tok, st["p"] = fwd_chain(params, st["p"], n)
        np.asarray(tok)

    s_fwd = slope(run_fwd)
    print(f"paged decode step (B={B}, hist={args.hist}): {s_fwd*1e6:9.1f} us"
          f" -> {B/s_fwd:,.0f} tok/s ceiling")

    # attention stub: same everything, attention returns zeros
    def attn_zero(q, k_cur, v_cur, *a, **k):
        return jnp.zeros_like(q)

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
    def lin_chain(prm, pools, steps):
        def step(carry, i):
            pools, tok, sl = carry
            logits, pools = paged_forward(
                prm, cfg, tok, pools, pt, sl, ones,
                linear_fn=lf, kv_write="pallas", attention_fn=attn_zero,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (pools, nxt, sl + 1), None

        (pools, tok, sl), _ = jax.lax.scan(
            step, (pools, toks0, seq0), jnp.arange(steps))
        return tok, pools

    st2 = {"p": PagedKV.zeros_dual(cfg, num_pages, ps, B)}

    def run_lin(n):
        tok, st2["p"] = lin_chain(params, st2["p"], n)
        np.asarray(tok)

    s_lin = slope(run_lin)
    print(f"  linear+write only : {s_lin*1e6:9.1f} us")
    print(f"  attention share   : {(s_fwd-s_lin)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
