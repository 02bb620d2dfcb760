#!/usr/bin/env python
"""Sparsity level vs output quality sweep.

Analog of reference legacy/benchmark/sparsity_benchmark.py and the
research findings it anchors (30% activation sparsity -> 0.992 cos-sim;
dynamic attention at 53% sparsity -> 0.990 — reference
docs/research/notebook.md:793-813, 843-852).

Usage: python scripts/sparsity_benchmark.py [--tiny]
"""

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from wrinklefree_tpu.config import BitNetConfig  # noqa: E402
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params  # noqa: E402
from wrinklefree_tpu.ops.activation_sparsity import (  # noqa: E402
    ActivationSparsityConfig,
    SparsityMode,
)
from wrinklefree_tpu.ops.sparse_attention import (  # noqa: E402
    AttentionSparsityConfig,
    AttentionSparsityMode,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seq", type=int, default=64)
    args = ap.parse_args()

    cfg = BitNetConfig.tiny() if args.tiny else BitNetConfig.bitnet_2b()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (1, args.seq)), jnp.int32
    )
    cache = KVCache.zeros(cfg, 1, args.seq + 8)
    start = jnp.zeros((1,), jnp.int32)

    dense, _ = forward(params, cfg, tokens, cache, start)

    results = {"activation": [], "attention": []}
    for ratio in (0.1, 0.3, 0.5, 0.6):
        sp = ActivationSparsityConfig(mode=SparsityMode.TOP_K, sparsity_ratio=ratio)
        out, _ = forward(params, cfg, tokens, cache, start, act_sparsity=sp)
        c = _cos(dense, out)
        results["activation"].append({"sparsity": ratio, "cos_sim": round(c, 4)})
        print(f"act top-k {int(ratio*100)}%: cos={c:.4f}", file=sys.stderr)

    for mode, kw in (
        (AttentionSparsityMode.TOP_K, {"top_k": max(4, args.seq // 4)}),
        (AttentionSparsityMode.THRESHOLD, {"threshold": 1e-3}),
        (AttentionSparsityMode.WINDOW, {"window_size": max(8, args.seq // 4)}),
        (AttentionSparsityMode.DYNAMIC, {}),
    ):
        at = AttentionSparsityConfig(mode=mode, **kw)
        out, _ = forward(params, cfg, tokens, cache, start, attn_sparsity=at)
        c = _cos(dense, out)
        results["attention"].append({"mode": mode.value, "cos_sim": round(c, 4), **kw})
        print(f"attn {mode.value}: cos={c:.4f}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
