#!/usr/bin/env python
"""Kernel lab 2: calibrate the timing harness and isolate where the
packed-ternary Pallas GEMV loses bandwidth.

Findings from lab 1: the stream-only kernel (no unpack, no dot) is as
slow as the full kernel in a scan harness (~0.5 ms for 4.4 MB). Either
(a) the scan harness adds per-iteration overhead, or (b) the grid /
BlockSpec structure can't stream. Disambiguate with:

  calib   scan of dense bf16 jnp.dot, same byte volume
  scanp   scan of the production pallas kernel (same as lab 1 v0)
  bigN    ONE pallas call over a 16x wider N (70 MB, 432-step grid),
          fori_loop-chained inside one jit -> measures steady-state
          kernel bandwidth without scan
  bigNd   same but dense bf16 jnp.dot
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from wrinklefree_tpu.ops.ternary import pack_ternary  # noqa: E402
from wrinklefree_tpu.ops.ternary_pallas import (  # noqa: E402
    ternary_matmul_pallas,
)


@functools.partial(jax.jit, static_argnames=("mode",))
def scan_run(xs, w, mode):
    def step(c, x):
        if mode == "calib":
            o = jnp.dot(x.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
        else:
            o = ternary_matmul_pallas(x, w).astype(jnp.float32)
        return c + o, None

    acc, _ = jax.lax.scan(step, jnp.zeros((xs.shape[1], w.shape[1]),
                                          jnp.float32), xs)
    return acc


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def chain_run(x, w, iters, mode):
    def body(i, c):
        if mode == "bigNd":
            o = jnp.dot(x.astype(jnp.bfloat16) + c[:, :1].astype(jnp.bfloat16),
                        w, preferred_element_type=jnp.float32)
        else:
            o = ternary_matmul_pallas(
                (x + c[:, :1].astype(jnp.int8)), w
            ).astype(jnp.float32)
        return c + o

    return jax.lax.fori_loop(
        0, iters, body, jnp.zeros((x.shape[0], w.shape[1]), jnp.float32)
    )


def timeit(fn, reps=3):
    _ = np.asarray(fn())  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    k, n = 2560, 6912
    rng = np.random.default_rng(0)
    w8 = rng.integers(-1, 2, size=(k, n), dtype=np.int8)
    qw = jnp.asarray(pack_ternary(jnp.asarray(w8)))
    wb = jnp.asarray(w8, jnp.bfloat16)
    xs = jnp.asarray(rng.integers(-127, 128, (args.iters, 1, k)), jnp.int8)

    t = timeit(lambda: scan_run(xs, wb, "calib")) / args.iters
    print(f"calib scan dense bf16 : {t*1e3:7.3f} ms/iter "
          f"{k*n*2/t/1e9:7.1f} GB/s")
    t = timeit(lambda: scan_run(xs, qw, "scanp")) / args.iters
    print(f"scan pallas ternary   : {t*1e3:7.3f} ms/iter "
          f"{k*n/4/t/1e9:7.1f} GB/s packed")

    nn = n * 16
    w8n = rng.integers(-1, 2, size=(k, nn), dtype=np.int8)
    qwn = jnp.asarray(pack_ternary(jnp.asarray(w8n)))
    wbn = jnp.asarray(w8n, jnp.bfloat16)
    x1 = jnp.asarray(rng.integers(-127, 128, (1, k)), jnp.int8)
    it2 = 8
    t = timeit(lambda: chain_run(x1, qwn, it2, "bigN")) / it2
    print(f"bigN pallas 70MB      : {t*1e3:7.3f} ms/iter "
          f"{k*nn/4/t/1e9:7.1f} GB/s packed")
    t = timeit(lambda: chain_run(x1, wbn, it2, "bigNd")) / it2
    print(f"bigN dense bf16 560MB : {t*1e3:7.3f} ms/iter "
          f"{k*nn*2/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
