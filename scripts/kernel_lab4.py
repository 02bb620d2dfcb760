#!/usr/bin/env python
"""Kernel lab 4: weight-layout hypothesis.

Lab 3: serial-chain step time is ~linear in N and independent of data
volume or kernel (dense 283 MB and packed 35 MB per layer both ~3.6 ms).
The one prior measurement that DID hit ~730 GB/s was the tied-embedding
logits matmul — whose weight is [N, K] row-major (contract dim LAST).
Hypothesis: [K, N] weights stream pathologically on this chip/XLA; the
fix is N-major packed layout.

  kn_dense    dense bf16 w[K,N], dot contract (1,0)   (lab-3 baseline)
  nk_dense    dense bf16 w[N,K], dot contract (1,1)
  kn_b256     like kn_dense but batch 256 (is it M-latency?)
  nk_pallas   packed ternary w[N, K4] u8, N-major kernel
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from wrinklefree_tpu.ops.ternary import pack_ternary  # noqa: E402

K, N, L = 2560, 27648, 4


def _nmajor_kernel(x_ref, w_ref, o_ref):
    """x [TB, K] i8, w [TN, K4] u8 -> o [TB, TN] i32."""
    k4 = w_ref.shape[1]
    w = w_ref[:].astype(jnp.int32)
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[0]), jnp.int32)
    for j in range(4):
        w_j = (((w >> (2 * j)) & 3) - 1).astype(jnp.int8)
        x_j = x_ref[:, j * k4 : (j + 1) * k4]
        acc += jax.lax.dot_general(
            x_j, w_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[:] = acc


def nmajor_matmul(x_q, qw_nk, tn=256):
    n, k4 = qw_nk.shape
    k = 4 * k4
    b = x_q.shape[0]
    tb = -(-b // 32) * 32
    xp = jnp.pad(x_q, ((0, tb - b), (0, 0))) if tb != b else x_q
    out = pl.pallas_call(
        _nmajor_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tb, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k4), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tb, n), jnp.int32),
    )(xp, qw_nk)
    return out[:b]


@jax.jit
def chain_nk_pallas(x, ws):
    def step(x, w):
        o = nmajor_matmul(x, w)
        return (o[:, :K].astype(jnp.int32) & 63).astype(jnp.int8), o[0, :8]

    _, outs = jax.lax.scan(step, x, ws)
    return outs


@functools.partial(jax.jit, static_argnames=("tmode",))
def chain_dense(x, ws, tmode):
    cdim = 1 if tmode else 0

    def step(x, w):
        o = jax.lax.dot_general(
            x, w, (((1,), (cdim,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return o[:, :K].astype(jnp.bfloat16) * 1e-3, o[:1, :8]

    _, outs = jax.lax.scan(step, x, ws)
    return outs


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
    ws_np = np.stack(
        [rng.integers(-1, 2, size=(K, N), dtype=np.int8) for _ in range(L)]
    )
    dnk = jnp.asarray(ws_np.transpose(0, 2, 1), jnp.bfloat16)
    x1 = jnp.asarray(rng.integers(-127, 128, (1, K)), jnp.int8)
    xb = x1.astype(jnp.bfloat16)
    x256 = jnp.asarray(rng.integers(-127, 128, (256, K)), jnp.int8).astype(
        jnp.bfloat16
    )
    db = K * N * 2 * L
    pb = K * N / 4 * L

    import os

    t = timeit(lambda: chain_dense(xb, dnk, True))
    print(f"nk_dense b=1  : {t*1e3:8.2f} ms  {db/t/1e9:7.1f} GB/s", flush=True)

    # correctness of the N-major pallas kernel vs int oracle
    qw_nk = jnp.stack(
        [pack_ternary(jnp.asarray(ws_np[i])).T for i in range(L)]
    )  # [N, K4]: row n holds K packed plane-major
    ref = (np.asarray(x1, np.int32) @ ws_np[0].astype(np.int32))[0]
    got = np.asarray(nmajor_matmul(x1, qw_nk[0]))[0]
    assert np.array_equal(ref, got), "nmajor kernel wrong"
    print("nmajor kernel correct vs oracle", file=sys.stderr)
    t = timeit(lambda: chain_nk_pallas(x1, qw_nk))
    print(f"nk_pallas b=1 : {t*1e3:8.2f} ms  {pb/t/1e9:7.1f} GB/s packed",
          flush=True)

    if os.environ.get("WF_LAB4_ALL"):
        dkn = jnp.asarray(ws_np, jnp.bfloat16)
        t = timeit(lambda: chain_dense(xb, dkn, False))
        print(f"kn_dense b=1  : {t*1e3:8.2f} ms  {db/t/1e9:7.1f} GB/s")
        t = timeit(lambda: chain_dense(x256, dkn, False))
        print(f"kn_dense b=256: {t*1e3:8.2f} ms  {db/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
