#!/usr/bin/env python
"""Ternary-GEMV kernel lab: diagnose the packed-stream bandwidth gap.

RESULTS.md measured the Pallas fused ternary GEMV at ~140 GB/s on the
packed stream while the same chip streams dense bf16 at ~730 GB/s. This
lab times kernel VARIANTS with fetch-terminated scan-chained timing (the
only honest timing on the axon tunnel) to find the bottleneck:

  v0  current kernel (int32 unpack, int8 MXU dot)
  v1  u8-native shifts (no int32 round-trip in VMEM)
  v2  encoded-weights: dot with (w>>2j)&3 in {0,1,2}, hoist the -1
      correction out of the kernel as sum(x) (reference's trick,
      direct_inference_full.py:186-208 — but computed on-device)
  v3  stream-only: read the weight block, emit one row-sum — an upper
      bound on achievable DMA bandwidth with this grid/blockspec
  v4  v1 with TN=512 / 1024 tiles

Usage: python scripts/kernel_lab.py [--iters 64] [--kn 2560,6912]
"""

import argparse
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
from wrinklefree_tpu.ops.ternary_pallas import (  # noqa: E402
    ternary_matmul_pallas,
)


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------- variants
def _v1_kernel(x_ref, w_ref, o_ref):
    """u8-native shifts kept in 8-bit; -1 folded via int32 subtract at
    the accumulator (Mosaic cannot legalize subi on packed i8)."""
    k4 = w_ref.shape[0]
    w = w_ref[:]
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.int32)
    sx = jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    for j in range(4):
        w_j = ((w >> (2 * j)) & 3).astype(jnp.int8)
        x_j = x_ref[:, j * k4 : (j + 1) * k4]
        acc += jax.lax.dot_general(
            x_j, w_j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[:] = acc - sx


def _v2_kernel(x_ref, w_ref, sx_ref, o_ref):
    """Encoded dot: w_enc in {0,1,2}; subtract precomputed sum(x)."""
    k4 = w_ref.shape[0]
    w = w_ref[:]
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.int32)
    for j in range(4):
        w_j = ((w >> (2 * j)) & 3).astype(jnp.int8)
        x_j = x_ref[:, j * k4 : (j + 1) * k4]
        acc += jax.lax.dot_general(
            x_j, w_j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[:] = acc - sx_ref[:]


def _v3_kernel(x_ref, w_ref, o_ref):
    """Stream-only: touch every weight byte with minimal compute."""
    del x_ref
    o_ref[:] = jnp.sum(w_ref[:].astype(jnp.int32), axis=0, keepdims=True)


def _call(kernel, x_q, qw, tn, extra=None, out_rows=None):
    k4, n = qw.shape
    k = 4 * k4
    b = x_q.shape[0]
    tb = _round_up(b, 32)
    xp = jnp.pad(x_q, ((0, tb - b), (0, 0))) if tb != b else x_q
    grid = (n // tn,)
    in_specs = [
        pl.BlockSpec((tb, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k4, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [xp, qw]
    if extra is not None:
        in_specs.append(
            pl.BlockSpec((tb, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(extra)
    orows = out_rows or tb
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((orows, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((orows, n), jnp.int32),
    )(*args)
    return out[:b] if out_rows is None else out


@functools.partial(jax.jit, static_argnames=("variant", "tn"))
def run_variant(xs, qw, variant, tn):
    """Scan N different x through the kernel; sum outputs (defeats LICM)."""
    def step(carry, x):
        if variant == "v0":
            o = ternary_matmul_pallas(x, qw)
        elif variant == "v1":
            o = _call(_v1_kernel, x, qw, tn)
        elif variant == "v2":
            sx = jnp.sum(x.astype(jnp.int32), axis=-1, keepdims=True)
            tb = _round_up(x.shape[0], 32)
            sxp = jnp.pad(sx, ((0, tb - x.shape[0]), (0, 0)))
            o = _call(_v2_kernel, x, qw, tn, extra=sxp)
        elif variant == "v3":
            o = _call(_v3_kernel, x, qw, tn, out_rows=1)
        else:
            raise ValueError(variant)
        return carry + o.astype(jnp.int32), None

    init = jnp.zeros(
        (1 if variant == "v3" else xs.shape[1], qw.shape[1]), jnp.int32
    )
    acc, _ = jax.lax.scan(step, init, xs)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--kn", default="2560,6912")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    k, n = (int(v) for v in args.kn.split(","))
    rng = np.random.default_rng(0)
    w = rng.integers(-1, 2, size=(k, n), dtype=np.int8)
    qw = jnp.asarray(pack_ternary(jnp.asarray(w)))
    xs = jnp.asarray(
        rng.integers(-127, 128, size=(args.iters, args.batch, k)),
        jnp.int8,
    )
    packed_bytes = qw.size  # uint8
    print(f"shape K={k} N={n} batch={args.batch} packed={packed_bytes/1e6:.2f} MB"
          f" iters={args.iters}", file=sys.stderr)

    # correctness spot-check (v1/v2 vs v0) on CPU-cheap path
    o0 = np.asarray(run_variant(xs[:2], qw, "v0", 256))

    cases = [("v0", 256), ("v1", 256), ("v2", 256), ("v3", 256),
             ("v1", 512), ("v1", 1024), ("v2", 1024), ("v3", 1024)]
    for variant, tn in cases:
        if n % tn:
            continue
        try:
            ov = np.asarray(run_variant(xs[:2], qw, variant, tn))
        except Exception as e:  # noqa: BLE001
            print(f"{variant} tn={tn}: COMPILE FAIL: {str(e)[:160]}")
            continue
        if variant != "v3" and not np.array_equal(o0, ov):
            print(f"{variant} tn={tn}: WRONG RESULT")
            continue
        # warm compile
        _ = np.asarray(run_variant(xs, qw, variant, tn))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = run_variant(xs, qw, variant, tn)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        per_iter = best / args.iters
        gbps = packed_bytes / per_iter / 1e9
        print(f"{variant} tn={tn:4d}: {per_iter*1e3:7.3f} ms/iter"
              f"  {gbps:7.1f} GB/s packed-stream")


if __name__ == "__main__":
    main()
