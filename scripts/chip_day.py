#!/usr/bin/env python
"""Run the whole chip-window measurement queue unattended (ROADMAP
round-4 queue). Each step runs serially in its own subprocess with a
timeout; failures are recorded and the queue continues. Artifacts land
in results/chipday_<stamp>/.

    python scripts/chip_day.py [--only STEP ...] [--skip STEP ...]
        [--list]

NEVER run concurrently with another TPU process (1-CPU host + tunnel:
a contended serving run measured 49 tok/s vs 1097 solo).
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PY = sys.executable


def steps(out: Path):
    e = {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_compilation"}
    return [
        # (name, argv, timeout_s, extra_env)
        ("probe", [PY, "-c",
                   "import jax,numpy,jax.numpy as jnp;"
                   "print(float(numpy.asarray(jnp.ones((256,256))@jnp.ones((256,256))).sum()),"
                   "jax.devices()[0].platform)"], 600, e),
        ("bench_headline", [PY, "bench.py"], 2400, e),
        ("tpu_unit_tests", [PY, "-m", "pytest", "-m", "tpu", "-q",
                            "tests/test_attn_manual.py",
                            "tests/test_pallas_kernels.py"],
         2400, {**e, "WF_TPU_TESTS": "1"}),
        ("bench_ctx2048", [PY, "bench.py"], 1800,
         {**e, "WF_BENCH_PROMPT": "2048", "WF_BENCH_STEPS": "64"}),
        ("bench_ctx3968", [PY, "bench.py"], 1800,
         {**e, "WF_BENCH_PROMPT": "3968", "WF_BENCH_STEPS": "64"}),
        # small-T auto-kernel decomposition ladder (VERDICT r4 item 5):
        # body ablations timed in the REAL window; full - skipsm =
        # softmax reductions, skipsm - noattn = scores/PV dots,
        # noattn - nocache = pipelined cache in/out DMA. Tokens are
        # garbage under ablation — timing only.
        # WF_BENCH_EXACT_HEAD=0 on EVERY rung (incl. the full baseline):
        # ablation garbage would trip the exact head's near-tie lax.cond
        # fallback inconsistently; the plain bf16 head is branch-free so
        # rung deltas stay valid.
        ("bench_ablate_full", [PY, "bench.py"], 1800,
         {**e, "WF_BENCH_EXACT_HEAD": "0"}),
        ("bench_ablate_skipsm", [PY, "bench.py"], 1800,
         {**e, "WF_ATTN_ABLATE": "skipsm", "WF_BENCH_EXACT_HEAD": "0"}),
        ("bench_ablate_noattn", [PY, "bench.py"], 1800,
         {**e, "WF_ATTN_ABLATE": "noattn", "WF_BENCH_EXACT_HEAD": "0"}),
        ("bench_ablate_nocache", [PY, "bench.py"], 1800,
         {**e, "WF_ATTN_ABLATE": "nocache", "WF_BENCH_EXACT_HEAD": "0"}),
        ("long_context_16k", [PY, "scripts/long_context_bench.py",
                              "--prompt-len", "16384", "--new-tokens",
                              "32"], 2400, e),
        ("profile_decode_step", [PY, "scripts/profile_serving_step.py",
                                 "--slots", "16", "--bursts", "4"], 2400, e),
        ("profile_prefill", [PY, "scripts/profile_serving_step.py",
                             "--phase", "prefill", "--slots", "8",
                             "--prompt-len", "3968"], 2400, e),
        ("kernels_b512", [PY, "scripts/benchmark_kernels.py",
                          "--batch", "512"], 1200, e),
        ("kernels_b4096", [PY, "scripts/benchmark_kernels.py",
                           "--batch", "4096"], 1200, e),
        ("prefill_heavy_stagger", [PY, "scripts/serving_bench.py",
                                   "--streams", "8", "--prompt-len", "3968",
                                   "--new-tokens", "16", "--slots", "8"],
         2400, e),
        ("prefill_heavy_lockstep", [PY, "scripts/serving_bench.py",
                                    "--streams", "8", "--prompt-len", "3968",
                                    "--new-tokens", "16", "--slots", "8",
                                    "--prefill-mode", "bucket"], 2400, e),
        ("prefill_heavy_xla_linear", [PY, "scripts/serving_bench.py",
                                      "--streams", "8", "--prompt-len",
                                      "3968", "--new-tokens", "16",
                                      "--slots", "8",
                                      "--prefill-linear", "xla"], 2400, e),
        ("spec_curve", [PY, "scripts/spec_accept_curve.py",
                        "--k", "2", "4", "8", "--out",
                        str(out / "spec_curve.json")], 2400, e),
        ("publish_campaign", [PY, "scripts/publish_results.py",
                              "--trials", "3"], 14000, e),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    stamp = time.strftime("%Y%m%d_%H%M%S")
    out = ROOT / "results" / f"chipday_{stamp}"
    todo = steps(out)
    if args.list:
        for name, *_ in todo:
            print(name)
        return
    out.mkdir(parents=True, exist_ok=True)

    summary = []
    for name, argv, timeout_s, extra_env in todo:
        if args.only and name not in args.only:
            continue
        if name in args.skip:
            continue
        print(f"[chip-day] {name} ...", file=sys.stderr, flush=True)
        env = dict(os.environ)
        env.update(extra_env)
        t0 = time.time()
        try:
            p = subprocess.run(argv, capture_output=True, text=True,
                               timeout=timeout_s, env=env, cwd=ROOT)
            rc, so, se = p.returncode, p.stdout, p.stderr
        except subprocess.TimeoutExpired as ex:
            rc = -1
            so = (ex.stdout or b"").decode() if isinstance(
                ex.stdout, bytes) else (ex.stdout or "")
            se = f"TIMEOUT after {timeout_s}s"
        wall = round(time.time() - t0, 1)
        (out / f"{name}.stdout.txt").write_text(so or "")
        (out / f"{name}.stderr.txt").write_text(se or "")
        last_json = None
        for ln in reversed((so or "").splitlines()):
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    last_json = json.loads(ln)
                except json.JSONDecodeError:
                    pass
                break
        row = {"step": name, "rc": rc, "wall_s": wall, "result": last_json}
        summary.append(row)
        print(f"[chip-day] {name}: rc={rc} wall={wall}s "
              f"{json.dumps(last_json)[:180] if last_json else ''}",
              file=sys.stderr, flush=True)
        (out / "summary.json").write_text(json.dumps(summary, indent=1))
        if name == "probe" and rc != 0:
            print("[chip-day] TPU probe failed — aborting queue",
                  file=sys.stderr)
            break

    print(json.dumps({"out": str(out),
                      "steps": len(summary),
                      "failed": [r["step"] for r in summary if r["rc"]]}))


if __name__ == "__main__":
    main()
