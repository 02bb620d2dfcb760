#!/usr/bin/env python
"""Parameter-sweep benchmark suite — the TPU-native successor to the
reference's Modal cloud benches.

The reference ran its sweep campaigns as Modal cloud functions
(/root/reference/legacy/modal/modal_extended_benchmark.py:333-460 —
batch sizes 1..256; :222-330 — long-context; mixed prefill+decode) and
then deprecated the launcher in favour of local/SkyPilot execution
(/root/reference/legacy/modal/README.md "Migration"). This harness
keeps the sweep CONTENT and the per-point process isolation (each grid
point is a fresh `serving_bench.py` subprocess, like each Modal
function invocation was a fresh container) while running locally or
under deploy/skypilot.yaml.

Grids:
  batch    streams 1->256 at fixed prompt/decode (modal large_batches)
  context  prompt 128->3968, prefill-heavy (modal long_context)
  mixed    decode lengths 8->512 at fixed prompt (modal mixed p+d)

Artifacts follow the dated results discipline: results/raw/
<ts>_sweep_<grid>.json + results/reports/<ts>_sweep_<grid>.md, stamped
with the transport-health calibration (wrinklefree_tpu/bench/calibrate)
so degraded-tunnel sweeps are self-labeling.

Usage:
  python scripts/sweep_bench.py --grid batch
  python scripts/sweep_bench.py --grid context --timeout 1800
  python scripts/sweep_bench.py --grid mixed --tiny   # CPU smoke
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "scripts" / "serving_bench.py"

# grid -> (sweep axis flag, values, fixed args)
GRIDS = {
    "batch": ("--streams", [1, 4, 16, 64, 128, 256],
              ["--prompt-len", "128", "--new-tokens", "64", "--burst", "64"]),
    "context": ("--prompt-len", [128, 512, 1024, 2048, 3968],
                ["--streams", "8", "--new-tokens", "16", "--slots", "8"]),
    "mixed": ("--new-tokens", [8, 32, 128, 512],
              ["--streams", "32", "--prompt-len", "128", "--slots", "16",
               "--burst", "64"]),
}
TINY_VALUES = {"batch": [1, 4], "context": [16, 32], "mixed": [4, 8]}
TINY_FIXED = {
    "batch": ["--prompt-len", "16", "--new-tokens", "8", "--slots", "4"],
    "context": ["--streams", "4", "--new-tokens", "4", "--slots", "4"],
    "mixed": ["--streams", "4", "--prompt-len", "16", "--slots", "4"],
}


def run_point(axis: str, value: int, fixed: list, tiny: bool,
              timeout: int, extra: list) -> dict:
    cmd = [sys.executable, str(BENCH), axis, str(value)] + fixed + extra
    if tiny:
        cmd.append("--tiny")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_compilation"))
    if tiny:
        env["WF_PLATFORM"] = "cpu"
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return {axis.lstrip("-").replace("-", "_"): value, "error": "timeout"}
    line = next((ln for ln in reversed(p.stdout.splitlines())
                 if ln.startswith("{")), "")
    if p.returncode != 0 or not line:
        return {axis.lstrip("-").replace("-", "_"): value,
                "error": (p.stderr or p.stdout)[-2000:],
                "returncode": p.returncode}
    rep = json.loads(line)
    rep["harness_wall_s"] = round(time.time() - t0, 1)
    return rep


def calibrate(tiny: bool):
    if tiny:
        return None
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_compilation"))
    try:
        p = subprocess.run(
            [sys.executable, "-m", "wrinklefree_tpu.bench.calibrate"],
            capture_output=True, text=True, timeout=900, env=env, cwd=ROOT)
        line = next((ln for ln in reversed(p.stdout.splitlines())
                     if ln.startswith("{")), "")
        return json.loads(line) if line else {"error": p.stderr[-500:]}
    except Exception as e:  # noqa: BLE001 — stamp is best-effort
        return {"error": str(e)[-500:]}


def render_md(grid: str, axis: str, rows: list, cal) -> str:
    key = axis.lstrip("-").replace("-", "_")
    lines = [f"# Sweep — {grid}", ""]
    if cal and "error" not in cal:
        v = "HEALTHY" if cal.get("healthy") else "DEGRADED"
        lines += [f"Transport calibration: **{v}** — rt "
                  f"{cal['transport_rt_ms']} ms, stream "
                  f"{cal['stream_us_per_layer']} us/layer.", ""]
    lines += [f"| {key} | decode tok/s | total tok/s | TTFT p50 | "
              "lat p95 | wall |", "|---|---|---|---|---|---|"]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r.get(key)} | ERROR | | | | |")
        else:
            lines.append(
                f"| {r.get(key)} | {r['decode_tok_s']} | {r['total_tok_s']} "
                f"| {r['ttft_p50_s']} s | {r['latency_p95_s']} s "
                f"| {r['wall_s']} s |")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", required=True, choices=sorted(GRIDS))
    ap.add_argument("--tiny", action="store_true", help="CPU smoke grid")
    ap.add_argument("--timeout", type=int, default=900, help="per point (s)")
    ap.add_argument("--values", default=None,
                    help="override sweep values, comma-separated")
    ap.add_argument("--out", default=str(ROOT / "results"))
    ap.add_argument("extra", nargs="*",
                    help="extra serving_bench.py args after --")
    args = ap.parse_args()

    axis, values, fixed = GRIDS[args.grid]
    if args.tiny:
        values, fixed = TINY_VALUES[args.grid], TINY_FIXED[args.grid]
    if args.values:
        values = [int(v) for v in args.values.split(",")]

    cal = calibrate(args.tiny)
    rows = []
    for v in values:
        print(f"[{args.grid}] {axis}={v} ...", file=sys.stderr, flush=True)
        r = run_point(axis, v, fixed, args.tiny, args.timeout, args.extra)
        rows.append(r)
        print(f"[{args.grid}] {axis}={v}: "
              f"{r.get('total_tok_s', r.get('error', '?'))}",
              file=sys.stderr, flush=True)

    stamp = time.strftime("%Y%m%d_%H%M%S")
    out = Path(args.out)
    (out / "raw").mkdir(parents=True, exist_ok=True)
    (out / "reports").mkdir(parents=True, exist_ok=True)
    raw = out / "raw" / f"{stamp}_sweep_{args.grid}.json"
    raw.write_text(json.dumps({"timestamp": stamp, "grid": args.grid,
                               "tiny": args.tiny, "calibration": cal,
                               "rows": rows}, indent=1))
    md = out / "reports" / f"{stamp}_sweep_{args.grid}.md"
    md.write_text(render_md(args.grid, axis, rows, cal))
    print(json.dumps({"raw": str(raw), "report": str(md),
                      "points": len(rows),
                      "errors": sum("error" in r for r in rows)}))


if __name__ == "__main__":
    main()
