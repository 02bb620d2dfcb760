#!/usr/bin/env python
"""Headline benchmark: BitNet-2B ternary decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tok/s", "vs_baseline": N, ...}

Baseline: 26.9 tok/s — the reference's BitNet.cpp CLI decode on a Ryzen 7
7700 (BASELINE.md row 1, reference docs/research/notebook.md:17-23).
Weights are random ternary (throughput is value-independent).
"""

import json
import os
import sys
import time


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

BASELINE_TOKS = 26.9


def main():
    import jax
    import jax.numpy as jnp

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

    model = os.environ.get("WF_BENCH_MODEL", "bitnet2b")
    cfg = (
        BitNetConfig.llama3_8b_ternary()
        if model == "llama8b"
        else BitNetConfig.bitnet_2b()
    )
    prompt_len = int(os.environ.get("WF_BENCH_PROMPT", "64"))
    decode_steps = int(os.environ.get("WF_BENCH_STEPS", "64"))
    batch = int(os.environ.get("WF_BENCH_BATCH", "1"))
    max_len = prompt_len + 3 * decode_steps + 8  # 3 timing windows

    # Default compute path on TPU: the fused Pallas ternary GEMV/GEMM —
    # 2.2x the XLA-fused unpack+dot at batch 1 under honest (fetch
    # -terminated) timing. WF_BENCH_PALLAS=0 selects the XLA path.
    default_pallas = "1" if batch <= 4 else "0"  # pallas wins small-batch
    use_pallas = os.environ.get("WF_BENCH_PALLAS", default_pallas) == "1" and (
        jax.devices()[0].platform != "cpu"
    )
    linear_fn = None
    if use_pallas:
        from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear

        linear_fn = make_pallas_linear()

    log("initializing params...")
    t0 = time.perf_counter()
    params = init_params(cfg, seed=0)
    int8_logits = os.environ.get("WF_BENCH_INT8_LOGITS", "0") == "1"
    if int8_logits:
        from wrinklefree_tpu.models.bitnet import quantize_lm_head

        params = quantize_lm_head(params, cfg)
    params = jax.device_put(params)
    init_s = time.perf_counter() - t0
    log(f"params ready in {init_s:.1f}s; compiling prefill...")

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_step(params, tok, cache, start):
        logits, cache = forward(
            params, cfg, tok, cache, start, logits_all=False, linear_fn=linear_fn
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(params, toks, cache, start):
        logits, cache = forward(
            params, cfg, toks, cache, start, logits_all=False, linear_fn=linear_fn
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    cache = KVCache.zeros(cfg, batch, max_len)
    toks = jnp.ones((batch, prompt_len), jnp.int32)
    start0 = jnp.zeros((batch,), jnp.int32)

    import numpy as _np0

    t0 = time.perf_counter()
    tok, cache = prefill(params, toks, cache, start0)
    _ = _np0.asarray(tok)
    ttft_s = time.perf_counter() - t0  # includes compile on first call
    log(f"prefill done in {ttft_s:.1f}s; compiling decode...")

    # warmup decode (compile)
    import numpy as _np1

    pos = prompt_len
    tok, cache = decode_step(params, tok, cache, jnp.full((batch,), pos, jnp.int32))
    _ = _np1.asarray(tok)
    pos += 1
    log("decode compiled; timing...")

    # HONEST timing: on remote-tunnel transports block_until_ready can
    # return before execution completes — only a real device->host fetch
    # is a reliable completion barrier. Fetch-terminated, best of 3.
    import numpy as _np

    best_dt = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(decode_steps):
            tok, cache = decode_step(
                params, tok, cache, jnp.full((batch,), pos, jnp.int32)
            )
            pos += 1
        _ = _np.asarray(tok)  # true completion barrier
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    toks_per_s = decode_steps * batch / dt
    result = {
        "metric": "%s ternary decode throughput (batch %d, greedy)"
        % ("llama-3-8b" if model == "llama8b" else "bitnet-2b", batch),
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS, 2),
        "baseline": BASELINE_TOKS,
        "baseline_desc": "BitNet.cpp CLI decode, Ryzen 7 7700 AVX512 (notebook.md:17-23)",
        "platform": jax.devices()[0].platform,
        "pallas": bool(use_pallas),
        "int8_logits": int8_logits,
        "ms_per_token": round(dt / decode_steps * 1000, 3),
        "prefill_first_call_s": round(ttft_s, 2),
        "param_init_s": round(init_s, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
