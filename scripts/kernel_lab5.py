#!/usr/bin/env python
"""Kernel lab 5: separate the fixed dispatch->fetch latency from real
per-op cost on the axon tunnel.

Labs 2-4 showed every fetch-terminated timed call costs ~30 ms almost
regardless of the work inside (dense 2.26 GB vs packed 280 MB vs 4x less
data: all ~30 ms). Hypothesis: t(call) = T_fixed + work/BW with
T_fixed ~ 30 ms. If true, all prior per-op "bandwidth" numbers were
fiction, and the engine's decode_burst (dispatches per fetch) is the
dominant serving knob.

Measures:
  fetch-only        np.asarray of an already-computed small array
  trivial           jit(x+1) -> fetch
  chain(L) sweep    L x [2560x2560] ternary pallas GEMVs serially in one
                    jit, L in {1,8,32,128}; linear fit gives T_fixed
                    (intercept) and honest per-GEMV cost (slope)
  dense chain(L)    same with dense bf16 for the BW reference
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

K = N = 2560


@functools.partial(jax.jit, static_argnames=("length", "mode"))
def chain(x, w, length, mode):
    def body(i, x):
        if mode == "pallas":
            o = ternary_matmul_pallas(x, w)
            return (o.astype(jnp.int32) & 63).astype(jnp.int8)
        o = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (o * 1e-3).astype(jnp.bfloat16)

    x = jax.lax.fori_loop(0, length, body, x)
    return x[:, :128]


def t_fetch(fn, reps=5):
    _ = np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    w8 = rng.integers(-1, 2, size=(K, N), dtype=np.int8)
    qw = jnp.asarray(pack_ternary(jnp.asarray(w8)))
    wb = jnp.asarray(w8, jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (1, K)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)

    small = jnp.zeros((8, 128), jnp.float32) + 1  # precomputed
    _ = np.asarray(small)
    t = t_fetch(lambda: small)
    print(f"fetch-only [8,128] precomputed : {t*1e3:8.2f} ms")

    f = jax.jit(lambda x: x + 1.0)
    t = t_fetch(lambda: f(small))
    print(f"trivial jit + fetch            : {t*1e3:8.2f} ms")

    for mode, x, w, bytes_per in (
        ("pallas", x8, qw, K * N / 4),
        ("dense ", xb, wb, K * N * 2),
    ):
        pts = []
        for L in (1, 8, 32, 128):
            t = t_fetch(lambda L=L: chain(x, w, L, mode.strip()))
            pts.append((L, t))
            print(f"{mode} chain L={L:4d}: {t*1e3:8.2f} ms "
                  f"({t/L*1e3:7.3f} ms/op raw)", flush=True)
        ls = np.array([p[0] for p in pts], float)
        ts = np.array([p[1] for p in pts], float)
        slope, intercept = np.polyfit(ls, ts, 1)
        print(f"{mode} fit: T_fixed={intercept*1e3:.2f} ms, "
              f"per-op={slope*1e6:.0f} us "
              f"({bytes_per/slope/1e9:.0f} GB/s honest)")


if __name__ == "__main__":
    main()
