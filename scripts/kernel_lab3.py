#!/usr/bin/env python
"""Kernel lab 3: decisive structure experiments.

Lab 2 found a ~0.5 ms/iteration floor in scan harnesses (even dense
bf16 hit it) and ~14 GB/s packed for a chained huge-N pallas call —
while the production model measures ~124 GB/s on the same kernel. This
lab replicates the MODEL's structure precisely and toggles one variable
at a time:

  A_scan_xs    scan over L stacked DIFFERENT weights (model structure),
               serial dep through the activation
  B_scan_same  scan over L but weight is a closure constant (reused)
  C_unrolled   unrolled python-loop over L different closure weights
               inside one jit (no scan at all)
  D_dense_*    same three, dense bf16 jnp.dot
Per-layer weight is [K=2560, N=55296] -> 35 MB packed / 283 MB dense,
large enough that 124 GB/s vs 14 GB/s separates cleanly from the floor.
"""

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

K, N, L = 2560, 55296, 8


def _next_x(o):
    """Derive the next int8 activation from the output (serial dep)."""
    return (o[:, :K].astype(jnp.int32) & 63).astype(jnp.int8)


@jax.jit
def a_scan_xs(x, ws):
    def step(x, w):
        o = ternary_matmul_pallas(x, w)
        return _next_x(o), o[0, :8]

    _, outs = jax.lax.scan(step, x, ws)
    return outs


@jax.jit
def b_scan_same(x, w):
    def step(x, _):
        o = ternary_matmul_pallas(x, w)
        return _next_x(o), o[0, :8]

    _, outs = jax.lax.scan(step, x, jnp.arange(L))
    return outs


@jax.jit
def c_unrolled(x, *ws):
    outs = []
    for w in ws:
        o = ternary_matmul_pallas(x, w)
        x = _next_x(o)
        outs.append(o[0, :8])
    return jnp.stack(outs)


def _dnext(o):
    return o[:, :K].astype(jnp.bfloat16) * 1e-3


@jax.jit
def d_scan_xs(x, ws):
    def step(x, w):
        o = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return _dnext(o), o[0, :8]

    _, outs = jax.lax.scan(step, x, ws)
    return outs


@jax.jit
def d_unrolled(x, *ws):
    outs = []
    for w in ws:
        o = jnp.dot(x, w, preferred_element_type=jnp.float32)
        x = _dnext(o)
        outs.append(o[0, :8])
    return jnp.stack(outs)


def timeit(fn, reps=3):
    _ = np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"L={L} layers of K={K} N={N}: packed {K*N/4/1e6:.0f} MB/layer",
          file=sys.stderr)
    ws_np = [rng.integers(-1, 2, size=(K, N), dtype=np.int8) for _ in range(L)]
    qws = [jnp.asarray(pack_ternary(jnp.asarray(w))) for w in ws_np]
    qw_stack = jnp.stack(qws)
    x = jnp.asarray(rng.integers(-127, 128, (1, K)), jnp.int8)
    pb = K * N / 4 * L

    t = timeit(lambda: a_scan_xs(x, qw_stack))
    print(f"A pallas scan-xs   : {t*1e3:8.2f} ms  {pb/t/1e9:7.1f} GB/s packed")
    t = timeit(lambda: b_scan_same(x, qws[0]))
    print(f"B pallas scan-same : {t*1e3:8.2f} ms  {pb/t/1e9:7.1f} GB/s packed")
    t = timeit(lambda: c_unrolled(x, *qws))
    print(f"C pallas unrolled  : {t*1e3:8.2f} ms  {pb/t/1e9:7.1f} GB/s packed")

    dws = [jnp.asarray(w, jnp.bfloat16) for w in ws_np]
    dw_stack = jnp.stack(dws)
    xb = x.astype(jnp.bfloat16)
    db = K * N * 2 * L
    t = timeit(lambda: d_scan_xs(xb, dw_stack))
    print(f"D dense scan-xs    : {t*1e3:8.2f} ms  {db/t/1e9:7.1f} GB/s dense")
    t = timeit(lambda: d_unrolled(xb, *dws))
    print(f"E dense unrolled   : {t*1e3:8.2f} ms  {db/t/1e9:7.1f} GB/s dense")


if __name__ == "__main__":
    main()
