#!/usr/bin/env python
"""Server cold-boot story: boot wall time + first-request TTFT vs
steady-state, warm or cold JAX compile cache (VERDICT r2 item 7).

Boots the real server process (`python -m wrinklefree_tpu.server
--model synth:bitnet_2b --warmup`) on the real chip, measures
time-to-/health, then streams one request for first-request TTFT and
several more for steady-state TTFT. `--cold` points the JAX compile
cache at a fresh temp dir so the warmup pays full XLA compile cost;
default reuses ~/.cache/jax_compilation (the deploy configuration —
deploy/Dockerfile sets the same env).

Reference analog: the reference has no boot-latency instrumentation at
all (its SGLang launch just blocks, scripts/launch_server.py) — this
metric is native to the TPU design, where the compile cost is real and
the mitigation (--warmup + persistent cache) needs proof.

Usage:
  python scripts/cold_boot_bench.py                 # warm cache
  python scripts/cold_boot_bench.py --cold          # fresh cache
  python scripts/cold_boot_bench.py --tiny --platform cpu   # smoke
"""

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _ttft(url: str, prompt: str, n: int) -> float:
    """SSE-streamed TTFT: time to first content delta (llama.cpp
    /completion endpoint — same parse as bench/runner.py)."""
    import requests

    t0 = time.perf_counter()
    with requests.post(f"{url}/completion",
                       json={"prompt": prompt, "n_predict": n,
                             "temperature": 0.0, "stream": True},
                       stream=True, timeout=1200) as r:
        r.raise_for_status()
        for line in r.iter_lines():
            if line.startswith(b"data: "):
                return time.perf_counter() - t0
    raise RuntimeError("no stream data")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="synth:bitnet_2b")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cold", action="store_true",
                    help="fresh JAX compile cache (full compile cost)")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--boot-timeout", type=int, default=3600)
    ap.add_argument("--steady-requests", type=int, default=4)
    args = ap.parse_args()

    port = _free_port()
    cmd = [sys.executable, "-m", "wrinklefree_tpu.server",
           "--port", str(port), "--host", "127.0.0.1"]
    cmd += ["--tiny"] if args.tiny else ["--model", args.model]
    if not args.no_warmup:
        cmd.append("--warmup")
    if args.platform:
        cmd += ["--platform", args.platform]

    env = dict(os.environ)
    tmp = None
    if args.cold:
        tmp = tempfile.TemporaryDirectory(prefix="wf_coldcache_")
        env["JAX_COMPILATION_CACHE_DIR"] = tmp.name
    else:
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_compilation"))

    import requests

    url = f"http://127.0.0.1:{port}"
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, env=env, cwd=ROOT,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT,
                            start_new_session=True)
    try:
        boot_s = None
        while time.perf_counter() - t0 < args.boot_timeout:
            if proc.poll() is not None:
                raise RuntimeError(f"server exited rc={proc.returncode}")
            try:
                if requests.get(f"{url}/health", timeout=2).status_code == 200:
                    boot_s = time.perf_counter() - t0
                    break
            except requests.RequestException:
                time.sleep(0.5)
        if boot_s is None:
            raise RuntimeError("server did not come up in time")

        prompt = "The quick brown fox jumps over the lazy dog. " * 4
        first = _ttft(url, prompt, 8)
        steady = min(_ttft(url, f"{prompt} ({i})", 8)
                     for i in range(args.steady_requests))
        print(json.dumps({
            "model": "tiny" if args.tiny else args.model,
            "cache": "cold" if args.cold else "warm",
            "warmup": not args.no_warmup,
            "boot_s": round(boot_s, 1),
            "ttft_first_s": round(first, 3),
            "ttft_steady_s": round(steady, 3),
            "first_over_steady": round(first / steady, 2),
        }))
    finally:
        try:
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass  # server already exited (its rc was reported above)
        if tmp:
            tmp.cleanup()


if __name__ == "__main__":
    main()
