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

# reuse compiles across runs (first 2B compile over the tunnel is ~5 min)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation"
)


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

BASELINE_TOKS = 26.9


def main():
    import jax

    # WF_BENCH_PLATFORM=cpu forces CPU via the config API (the axon TPU
    # plugin ignores a runtime JAX_PLATFORMS env) — used by the tiny
    # CPU smoke of the full bench path.
    plat = os.environ.get("WF_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # install the compile-event listeners before anything compiles so
    # the end-of-run cache report covers the whole process
    from wrinklefree_tpu.utils.jaxcache import CompileWatcher

    CompileWatcher()

    import jax.numpy as jnp

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

    model = os.environ.get("WF_BENCH_MODEL", "bitnet2b")
    if model == "llama8b":
        cfg = BitNetConfig.llama3_8b_ternary()
    elif model == "tiny":  # CPU smoke of the whole bench path
        cfg = BitNetConfig.tiny()
    else:
        cfg = BitNetConfig.bitnet_2b()
    prompt_len = int(os.environ.get("WF_BENCH_PROMPT", "64"))
    decode_steps = int(os.environ.get("WF_BENCH_STEPS", "64"))
    batch = int(os.environ.get("WF_BENCH_BATCH", "1"))
    max_len = prompt_len + 4 * decode_steps + 8  # warm + 3 timing windows
    _spec_k = int(os.environ.get("WF_BENCH_SPEC", "0"))
    if _spec_k:
        max_len += 4 * 16 * (_spec_k + 1)  # spec windows write k+1/step

    # Default compute path on TPU: the fused Pallas ternary GEMV/GEMM —
    # 2.2x the XLA-fused unpack+dot at batch 1 under honest (fetch
    # -terminated) timing. WF_BENCH_PALLAS=0 selects the XLA path.
    default_pallas = "1" if batch <= 4 else "0"  # pallas wins small-batch
    use_pallas = os.environ.get("WF_BENCH_PALLAS", default_pallas) == "1" and (
        jax.devices()[0].platform != "cpu"
    )
    linear_fn = None
    fuse = False
    if use_pallas:
        fuse = os.environ.get("WF_BENCH_FUSE_PROJ", "1") == "1"
        prologue = fuse and os.environ.get("WF_BENCH_PROLOGUE", "1") == "1"
        if prologue:
            from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused

            linear_fn = make_pallas_linear_fused()
        else:
            from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_stacked

            linear_fn = make_pallas_linear_stacked()

    log("initializing params...")
    t0 = time.perf_counter()
    params = init_params(cfg, seed=0)
    int8_logits = os.environ.get("WF_BENCH_INT8_LOGITS", "0") == "1"
    # exact-greedy head: int8 scan + bf16 top-k rescore + certificate
    # (argmax-exact, unlike the plain int8 head); value = shortlist size.
    # Default ON at batch 1 (measured +12.5%: 433 vs 385 tok/s, exact);
    # WF_BENCH_EXACT_HEAD=0 disables.
    exact_head_k = int(
        os.environ.get("WF_BENCH_EXACT_HEAD", "64" if batch == 1 else "0")
    )
    if int8_logits or exact_head_k:
        from wrinklefree_tpu.models.bitnet import quantize_lm_head

        params = quantize_lm_head(params, cfg)
    if fuse:
        from wrinklefree_tpu.models.bitnet import fuse_projections

        params = fuse_projections(params, cfg)  # 7 -> 4 kernel calls/layer
        if (
            getattr(linear_fn, "attn_mega_static", None) is not None
            and batch == 1
            and os.environ.get("WF_BENCH_SPLIT", "0") == "1"
        ):
            # unrolled-layer decode (pre-split weights, static index
            # maps). Measured NEUTRAL vs the scan path on v5e (the
            # prefetch latency overlaps inside the big kernels) at 5x
            # the compile time -> default off
            from wrinklefree_tpu.models.bitnet import split_layers_for_decode

            params = split_layers_for_decode(params, cfg)
    params = jax.device_put(params)
    init_s = time.perf_counter() - t0
    log(f"params ready in {init_s:.1f}s; compiling prefill...")

    import functools

    if exact_head_k:
        from wrinklefree_tpu.models.bitnet import greedy_exact_topk

        def head_fn(h, p):
            return greedy_exact_topk(h, p, cfg, k=exact_head_k)[0]
    else:
        head_fn = None

    def _greedy(params, tok, cache, start):
        out, cache = forward(
            params, cfg, tok, cache, start, logits_all=False,
            linear_fn=linear_fn, head_fn=head_fn,
        )
        if head_fn is None:
            out = jnp.argmax(out, axis=-1)
        return out.astype(jnp.int32)[:, None], cache

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_step(params, tok, cache, start):
        return _greedy(params, tok, cache, start)

    # The whole timing window is ONE dispatched program (lax.scan over
    # decode steps): on the axon tunnel every dispatch->fetch round trip
    # costs ~30 ms REGARDLESS of the work inside (scripts/kernel_lab5.py:
    # trivial jit+fetch 29.5 ms; dense 2560^2 matmul slope 15 us =
    # 875 GB/s), so a per-step dispatch loop measures transport, not the
    # chip. Production decode is device-resident too (engine decode
    # bursts), so this is the honest model-throughput measurement.
    @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("steps",))
    def decode_window(params, tok, cache, start, steps):
        def step(carry, _):
            tok, cache, pos = carry
            nxt, cache = _greedy(params, tok, cache, pos)
            return (nxt, cache, pos + 1), nxt[:, 0]

        (tok, cache, _), toks = jax.lax.scan(
            step, (tok, cache, start), None, length=steps
        )
        return toks, tok, cache

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

    # one-time flat relayout for the manual-DMA decode attention kernel
    # (5D<->flat is a ~2 ms relayout copy — NEVER per step; forward
    # accepts either form and returns what it was given)
    if batch == 1 and getattr(linear_fn, "attn_mega_manual_stacked", None) \
            is not None and jax.devices()[0].platform == "tpu":
        from wrinklefree_tpu.ops.ternary_pallas import attn_manual_tile

        if attn_manual_tile(max_len, cfg.num_kv_heads, cfg.head_dim):
            from wrinklefree_tpu.models.bitnet import flatten_cache_for_decode

            cache = flatten_cache_for_decode(cache)
            log("cache flattened for manual-DMA decode attention")

    # warmup decode (compile)
    import numpy as _np1

    pos = prompt_len
    tok, cache = decode_step(params, tok, cache, jnp.full((batch,), pos, jnp.int32))
    _ = _np1.asarray(tok)
    pos += 1
    log("decode compiled; compiling fused window...")

    # HONEST timing: fetch-terminated (block_until_ready can return
    # before execution completes on remote-tunnel transports), with the
    # whole window fused into one dispatch (see decode_window). Best of 3.
    import numpy as _np

    toks_w, tok, cache = decode_window(
        params, tok, cache, jnp.full((batch,), pos, jnp.int32), decode_steps
    )
    _ = _np.asarray(toks_w)  # compile + warm
    pos += decode_steps
    log("window compiled; timing...")

    best_dt = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        toks_w, tok, cache = decode_window(
            params, tok, cache, jnp.full((batch,), pos, jnp.int32), decode_steps
        )
        _ = _np.asarray(toks_w)  # true completion barrier
        best_dt = min(best_dt, time.perf_counter() - t0)
        pos += decode_steps
    dt = best_dt

    toks_per_s = decode_steps * batch / dt

    # Optional: speculative (n-gram) decode metric — WF_BENCH_SPEC=<k>.
    # Reported separately: acceptance depends on output repetitiveness,
    # so it is a workload-dependent multiplier on the vanilla number.
    spec_k = int(os.environ.get("WF_BENCH_SPEC", "0"))
    spec_result = None
    if spec_k > 0 and batch == 1:
        from wrinklefree_tpu.models.spec_decode import spec_decode_window

        hist = jnp.zeros((batch, max_len), jnp.int32)
        hist = hist.at[:, :prompt_len].set(1)
        hist = hist.at[jnp.arange(batch), pos].set(tok[:, 0])
        window = 16
        sargs = dict(steps=window, k=spec_k, linear_fn=linear_fn)
        last = tok[:, 0]
        start = jnp.full((batch,), pos, jnp.int32)
        toks_s, counts, last, cache, start, hist = spec_decode_window(
            params, cfg, last, cache, start, hist, **sargs
        )
        _ = _np.asarray(counts)  # compile + warm
        best = float("inf")
        tot_tokens = 0
        for _rep in range(3):
            t0 = time.perf_counter()
            toks_s, counts, last, cache, start, hist = spec_decode_window(
                params, cfg, last, cache, start, hist, **sargs
            )
            c = _np.asarray(counts)
            dt_s = time.perf_counter() - t0
            if dt_s < best:
                best, tot_tokens = dt_s, int(c.sum())
        spec_result = {
            "spec_tok_s": round(tot_tokens / best, 2),
            "spec_accept_per_step": round(tot_tokens / (window * batch), 2),
            "spec_k": spec_k,
        }

    result = {
        "metric": "%s ternary decode throughput (batch %d, greedy)"
        % ({"llama8b": "llama-3-8b", "tiny": "tiny-smoke"}.get(
            model, "bitnet-2b"), batch),
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS, 2),
        "baseline": BASELINE_TOKS,
        "baseline_desc": "BitNet.cpp CLI decode, Ryzen 7 7700 AVX512 (notebook.md:17-23)",
        "platform": jax.devices()[0].platform,
        "pallas": bool(use_pallas),
        "int8_logits": int8_logits,
        "ms_per_token": round(dt / decode_steps * 1000, 3),
        "fused_window_steps": decode_steps,
        "prefill_first_call_s": round(ttft_s, 2),
        "param_init_s": round(init_s, 1),
    }
    # persistent-cache health (VERDICT r4 item 7): compiles counts
    # backend invocations incl. cache hits (~0 s each on a hit);
    # compile_s >> 0 with cache_hits == 0 means a genuinely cold cache
    cwc, cws, cwh = CompileWatcher().snapshot()
    result["compile_cache"] = {
        "dir_set": bool(jax.config.jax_compilation_cache_dir),
        "compiles": cwc, "compile_s": round(cws, 1), "cache_hits": cwh,
    }
    if spec_result:
        result.update(spec_result)
    print(json.dumps(result))
    return result


def _run_attempt(timeout_s):
    """Run the real bench in a child process with a hard timeout.

    Returns (rc, stdout, stderr_tail). A hung backend init (the r3 failure
    mode: jax.devices() blocked on an unavailable TPU tunnel) cannot be
    interrupted in-process, so each attempt gets a fresh process we can
    kill as a group.
    """
    import signal
    import subprocess

    env = dict(os.environ, WF_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
        start_new_session=True,  # own pgid: kill the whole tree on timeout
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        return proc.returncode, out, err[-2000:]
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        out, err = proc.communicate()
        return -9, out, (err or "")[-2000:] + f"\n[bench] attempt timed out after {timeout_s}s"


def _supervise():
    """Retry-with-backoff supervisor. Emits ONE JSON line no matter what."""
    attempts = int(os.environ.get("WF_BENCH_ATTEMPTS", "4"))
    # r2's cold run: 24 s init + 139 s first prefill compile + decode
    # window compiles — 1800 s covers a fully cold attempt with margin
    timeout_s = float(os.environ.get("WF_BENCH_ATTEMPT_TIMEOUT", "1800"))
    backoffs = [20, 45, 90, 150, 240]
    last_err = ""
    for i in range(attempts):
        log(f"attempt {i + 1}/{attempts} (timeout {timeout_s:.0f}s)")
        rc, out, err_tail = _run_attempt(timeout_s)
        # forward the child's JSON result line if present
        json_line = None
        for line in reversed(out.splitlines()):
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                json_line = line
                break
        if rc == 0 and json_line:
            print(json_line)
            return 0
        last_err = err_tail or out[-2000:]
        log(f"attempt {i + 1} failed rc={rc}: ...{last_err[-300:]!r}")
        if i + 1 < attempts:
            delay = backoffs[min(i, len(backoffs) - 1)]
            log(f"backing off {delay}s before retry")
            time.sleep(delay)
    # terminal failure: structured, parseable error line (never a bare trace)
    print(
        json.dumps(
            {
                "metric": "bitnet-2b ternary decode throughput (batch 1, greedy)",
                "value": None,
                "unit": "tok/s",
                "vs_baseline": None,
                "error": last_err[-800:],
                "attempts": attempts,
            }
        )
    )
    return 1


if __name__ == "__main__":
    if os.environ.get("WF_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
