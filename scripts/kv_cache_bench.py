#!/usr/bin/env python
"""KV-cache dtype benchmark: quality + memory across bf16/int8/fp8.

Analog of reference legacy/benchmark/kv_cache_bench.py and the research
result it reproduced (INT8/FP8 KV: cos-sim >= 0.998, 50% memory —
reference kv_cache/kv_cache.py:8-11, notebook.md:690-709).

Usage: python scripts/kv_cache_bench.py [--tiny]
"""

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.kv.quantized import dequantize_kv, quantize_kv  # noqa: E402
from wrinklefree_tpu.kv.paged import KV_DTYPES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--context", type=int, default=2048)
    args = ap.parse_args()

    cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
    rng = np.random.default_rng(0)
    # realistic KV magnitudes: unit-normal per head-dim
    kv = jnp.asarray(
        rng.normal(0, 1, (args.context, cfg.num_kv_heads, cfg.head_dim)),
        jnp.float32,
    )

    bytes_bf16 = kv.size * 2
    rows = []
    for name in KV_DTYPES:
        q, scale = quantize_kv(kv.astype(jnp.bfloat16), name)
        deq = dequantize_kv(q, scale, jnp.float32)
        a = np.asarray(kv).ravel()
        b = np.asarray(deq, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        nbytes = q.size * q.dtype.itemsize + (
            scale.size * scale.dtype.itemsize if scale is not None else 0
        )
        rows.append({
            "kv_dtype": name,
            "cos_sim": round(cos, 5),
            "bytes": int(nbytes),
            "memory_vs_bf16": round(nbytes / bytes_bf16, 3),
        })
        print(f"{name:10s} cos={cos:.5f}  mem={nbytes/bytes_bf16:5.2f}x bf16",
              file=sys.stderr)

    # full-cache memory projection for the model at max context
    per_tok = 2 * cfg.num_layers * cfg.kv_dim  # K+V elements
    rows_mem = {
        name: round(
            per_tok * cfg.max_position * jnp.dtype(KV_DTYPES[name]).itemsize / 2**20, 1
        )
        for name in KV_DTYPES
    }
    print(json.dumps({"quality": rows, "full_cache_mb_at_max_ctx": rows_mem}))


if __name__ == "__main__":
    main()
