#!/usr/bin/env python
"""Roofline statement for the packed-ternary matmul kernels.

Chain-slope timing (lab-5 pattern): N data-dependent kernel calls inside
ONE lax.scan jit, fetched once; per-call cost = (t(N2)-t(N1))/(N2-N1).
This excludes the ~30 ms dispatch->fetch transport constant — the only
honest way to time a ~5 us kernel over the axon tunnel (RESULTS.md).

Reports GB/s and % of peak HBM bandwidth per shape. BASELINE target:
>=85% roofline on the ternary GEMV (reference hit ~0.033 ms on a
2560x2560 GEMV on AVX512 CPU, notebook.md:1002-1007).

Usage: python scripts/roofline_gemv.py [--batch 1 16] [--n1 128 --n2 2048]
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrinklefree_tpu.bench.roofline import (  # noqa: E402
    detect_chip,
    roofline,
    ternary_matmul_traffic,
)

# BitNet-2B projection shapes (K, N) per SURVEY.md §3.4, plus a square.
SHAPES = [
    ("qkv 2560x2560", 2560, 2560),
    ("gate/up 2560x6912", 2560, 6912),
    ("down 6912x2560", 6912, 2560),
    ("square 4096x4096", 4096, 4096),
]


def _fetch(x):
    return np.asarray(jax.device_get(x))  # real completion barrier on axon


def make_chain(kernel, x0, qw, sx, sw):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(x, steps):
        def step(x, _):
            out = kernel(x, qw, sx, sw)
            # scalar data dependency: forces sequencing, ~free traffic
            bump = (out.reshape(-1)[0] > jnp.float32(1e30)).astype(jnp.int8)
            return x0 + bump, out.reshape(-1)[0]

        _, outs = jax.lax.scan(step, x, None, length=steps)
        return outs[-1]

    return lambda n: _fetch(chain(x0, steps=n))


def slope(fn, n1, n2, reps=3):
    fn(n1)
    fn(n2)  # compile both
    t1 = min(_t(fn, n1) for _ in range(reps))
    t2 = min(_t(fn, n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--n1", type=int, default=128)
    ap.add_argument("--n2", type=int, default=2048)
    ap.add_argument("--xla", action="store_true", help="also time the XLA reference")
    args = ap.parse_args()

    dev = jax.devices()[0]
    chip = detect_chip(dev)
    print(f"device: {dev.device_kind} (roofline key: {chip})", file=sys.stderr)

    from wrinklefree_tpu.ops.ternary import ternary_matmul_reference
    from wrinklefree_tpu.ops.ternary_pallas import ternary_matmul_pallas

    rng = np.random.default_rng(0)
    rows = []
    for b in args.batch:
        for name, k, n in SHAPES:
            qw = jnp.asarray(rng.integers(0, 255, (k // 4, n), dtype=np.uint8))
            x0 = jnp.asarray(rng.integers(-127, 128, (b, k), dtype=np.int8))
            sx = jnp.ones((b, 1), jnp.float32)
            sw = jnp.float32(50.0)
            traffic = ternary_matmul_traffic(b, k, n)

            impls = {
                "pallas": lambda x, w, s, t: ternary_matmul_pallas(
                    x, w, s, t, out_dtype=jnp.float32
                )
            }
            if args.xla:
                impls["xla"] = lambda x, w, s, t: (
                    ternary_matmul_reference(x, w).astype(jnp.float32) / (s * t)
                )
            for impl, kern in impls.items():
                fn = make_chain(kern, x0, qw, sx, sw)
                t = slope(fn, args.n1, args.n2)
                pt = roofline(
                    f"{impl} b{b} {name}", t, traffic["bytes"], traffic["flops"], chip
                )
                rows.append(pt.as_dict())
                print(
                    f"{pt.name:30s} {1e6*t:8.2f} us  {pt.gbytes_per_s:8.1f} GB/s "
                    f"{pt.gflops:10.1f} GFLOP/s  {100*pt.bw_utilization:5.1f}% BW"
                    f"  [{pt.bound}]",
                    file=sys.stderr,
                )

    print(json.dumps({"chip": chip, "kernels": rows}))


if __name__ == "__main__":
    main()
