#!/usr/bin/env python
"""Kernel microbenchmark: packed-ternary matmul, Pallas vs XLA, with
roofline scoring.

Analog of the reference's kernel bench (reference
scripts/benchmark_kernels.py — GEMV/GEMM ms / GFLOPS / GB/s; measured
sgl-kernel GEMV 2560x2560 ~= 0.033 ms, notebook.md:1002-1007).

Usage: python scripts/benchmark_kernels.py [--batch 1] [--iters 50]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from wrinklefree_tpu.bench.roofline import (  # noqa: E402
    detect_chip,
    roofline,
    ternary_matmul_traffic,
)
from wrinklefree_tpu.ops.ternary import ternary_matmul_reference  # noqa: E402


# BitNet-2B projection shapes (K, N) per SURVEY.md §3.4
SHAPES = [
    ("qkv 2560x2560", 2560, 2560),
    ("kv 2560x640", 2560, 640),
    ("gate/up 2560x6912", 2560, 6912),
    ("down 6912x2560", 6912, 2560),
    ("square 4096x4096", 4096, 4096),
]


def _time(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    dev = jax.devices()[0]
    chip = detect_chip(dev)
    print(f"device: {dev.device_kind} (roofline key: {chip})", file=sys.stderr)

    use_pallas = dev.platform != "cpu"
    if use_pallas:
        from wrinklefree_tpu.ops.ternary_pallas import ternary_matmul_pallas

    rng = np.random.default_rng(0)
    rows = []
    for name, k, n in SHAPES:
        qw = jnp.asarray(rng.integers(0, 255, (k // 4, n), dtype=np.uint8))
        x = jnp.asarray(rng.integers(-127, 128, (args.batch, k), dtype=np.int8))
        sx = jnp.ones((args.batch, 1), jnp.float32)
        sw = jnp.float32(50.0)

        traffic = ternary_matmul_traffic(args.batch, k, n)
        xla_fn = jax.jit(ternary_matmul_reference)
        impls = {"xla": lambda x=x, qw=qw, f=xla_fn: f(x, qw)}
        if use_pallas:
            impls["pallas"] = lambda x=x, qw=qw, sx=sx: ternary_matmul_pallas(
                x, qw, sx, sw
            )
        for impl, fn in impls.items():
            t = _time(fn, iters=args.iters)
            pt = roofline(f"{impl} {name}", t, traffic["bytes"], traffic["flops"], chip)
            rows.append(pt.as_dict())
            print(
                f"{pt.name:28s} {pt.time_ms:8.3f} ms  {pt.gbytes_per_s:8.1f} GB/s "
                f"{pt.gflops:9.1f} GFLOP/s  {100*pt.bw_utilization:5.1f}% BW  [{pt.bound}]",
                file=sys.stderr,
            )

    print(json.dumps({"chip": chip, "batch": args.batch, "kernels": rows}))


if __name__ == "__main__":
    main()
