#!/usr/bin/env python
"""Lab 8: why does a stacked+fused ternary kernel cost ~25 us when a
plain GEMV measured <=5 us (lab 5)? Chain-slope the variants:

  1. plain ternary_matmul_pallas       [K=2560 -> N=3840]
  2. stacked (scalar-prefetch layer)   same shape, L=30
  3. stacked + per-column scale rows
  4. stacked + fused prologue (norm+quant in-kernel)
  5. stacked fused, L=1 (does the stack depth matter?)
  6. plain, N tile = full N (grid 1x1)

Each chain feeds the output back into the input (y[:, :K]) to create a
dependency. B=8 rows.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrinklefree_tpu.ops.ternary_pallas import (
    ternary_matmul_pallas,
    ternary_matmul_pallas_stacked,
    ternary_matmul_stacked_fused,
)


def slope(fn, n1=64, n2=512, reps=2):
    fn(n1)
    fn(n2)
    t1 = min(_t(fn, n1) for _ in range(reps))
    t2 = min(_t(fn, n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


def main():
    K, N, L, B = 2560, 3840, 30, 8
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.integers(0, 256, (K // 4, N)), jnp.uint8)
    wL = jnp.asarray(rng.integers(0, 256, (L, K // 4, N)), jnp.uint8)
    scL = jnp.full((L,), 50.0, jnp.float32)
    rowsL = jnp.full((L, 8, N), 50.0, jnp.float32)
    nrm = jnp.ones((L, 8, K), jnp.float32)
    x0 = jnp.asarray(rng.integers(-100, 100, (B, K)), jnp.int8)
    h0 = jnp.asarray(rng.normal(0, 1, (B, K)), jnp.bfloat16)
    sx0 = jnp.ones((B, 1), jnp.float32)

    def chain(body):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def run(x, steps, *args):
            def step(x, l):
                return body(x, l, *args), None
            x, _ = jax.lax.scan(step, x, jnp.arange(steps, dtype=jnp.int32))
            return x
        return run

    # 1. plain
    r1 = chain(lambda x, l, w: ternary_matmul_pallas(
        x, w, sx0, jnp.float32(50.0), out_dtype=jnp.bfloat16
    )[:, :K].astype(jnp.int8))

    def f1(n):
        np.asarray(r1(x0, n, w1))

    print(f"plain GEMV [2560->3840]          : {slope(f1)*1e6:7.1f} us")

    # 2. stacked
    r2 = chain(lambda x, l, w: ternary_matmul_pallas_stacked(
        x, w, l % L, sx0, scL, out_dtype=jnp.bfloat16
    )[:, :K].astype(jnp.int8))

    def f2(n):
        np.asarray(r2(x0, n, wL))

    print(f"stacked (prefetch layer idx)     : {slope(f2)*1e6:7.1f} us")

    # 3. stacked + rowscale
    r3 = chain(lambda x, l, w: ternary_matmul_pallas_stacked(
        x, w, l % L, sx0, rowsL, out_dtype=jnp.bfloat16
    )[:, :K].astype(jnp.int8))

    def f3(n):
        np.asarray(r3(x0, n, wL))

    print(f"stacked + column-scale rows      : {slope(f3)*1e6:7.1f} us")

    # 4. stacked fused prologue
    r4 = chain(lambda h, l, w: ternary_matmul_stacked_fused(
        h, w, l % L, rowsL, nrm, act="none", norm=True
    )[:, :K])

    def f4(n):
        np.asarray(r4(h0, n, wL))

    print(f"stacked fused (norm+quant inside): {slope(f4)*1e6:7.1f} us")

    # 5. stacked fused with L=1
    r5 = chain(lambda h, l, w: ternary_matmul_stacked_fused(
        h, w, 0, rowsL[:1], nrm[:1], act="none", norm=True
    )[:, :K])

    def f5(n):
        np.asarray(r5(h0, n, wL[:1]))

    print(f"stacked fused, L=1               : {slope(f5)*1e6:7.1f} us")


if __name__ == "__main__":
    main()
