#!/usr/bin/env python
"""Serving-batch decode-step decomposition (VERDICT r3 item 4).

The batch-1 path got the kernel-lab treatment down to the microsecond;
the 16-slot serving step (~7 ms vs the 2.09 ms batch-1 step) never did.
This tool profiles the REAL engine decode burst at serving batch with
jax.profiler and reports per-kernel device time grouped into
paged-gather / attention / linears / sampling / other, per decode step
— the table RESULTS.md needs before attacking the top term.

    python scripts/profile_serving_step.py [--tiny] [--slots 16]
        [--prompt-len 128] [--bursts 4] [--trace-dir /tmp/wf_sstep]

Also prints a chain-slope wall measurement (burst walls at two K
values) so dispatch overhead is separated from device time.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compilation")


def log(m):
    print(f"[sstep] {m}", file=sys.stderr, flush=True)


GROUPS = (
    # (group, name substrings — first match wins)
    ("attention", ("attn", "flash", "softmax")),
    ("linears", ("ternary", "mlp", "gateup", "qkv", "megakernel",
                 "planes", "dot", "convolution")),
    ("kv-gather/write", ("gather", "scatter", "dynamic-update",
                         "dynamic_update", "dynamic-slice",
                         "dynamic_slice", "kv", "copy")),
    ("sampling/head", ("sort", "top-k", "topk", "top_k", "argmax",
                       "rng", "threefry", "iota", "logits")),
)


def classify(name: str) -> str:
    n = name.lower()
    for grp, subs in GROUPS:
        if any(s in n for s in subs):
            return grp
    return "other"


def parse_trace(trace_dir: str):
    """Sum device-lane event durations by kernel name from the Chrome
    trace jax.profiler wrote. Returns {name: total_us} (device lanes
    only — host python/runtime rows are excluded)."""
    files = sorted(glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)
    if not files:
        return {}
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions TPU/device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = (e.get("args") or {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm:
                dev_pids.add(e.get("pid"))
    # SELF time per name (flame-graph logic): wrapper spans like
    # "jit_prefill" / "while.6" enclose their kernels on the same lane
    # — raw duration sums double-count and made 68.6% of r4's profile
    # land in "other" (VERDICT r4 weak item 4). An event's self time is
    # its duration minus the durations of its direct children.
    by_lane = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_lane[(e.get("pid"), e.get("tid"))].append(
                (float(e.get("ts", 0.0)), float(e.get("dur", 0.0)),
                 e.get("name", "?"))
            )
    sums = defaultdict(float)
    for lane in by_lane.values():
        lane.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # [end_ts, name, dur, child_total]
        def close(upto):
            while stack and stack[-1][0] <= upto + 1e-9:
                end, nm, dur, child = stack.pop()
                sums[nm] += max(0.0, dur - child)
                if stack:
                    stack[-1][3] += dur
        for ts, dur, name in lane:
            close(ts)
            stack.append([ts + dur, name, dur, 0.0])
        close(float("inf"))
    return dict(sums)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", default="bitnet2b",
                    choices=["bitnet2b", "llama8b"])
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--bursts", type=int, default=4)
    ap.add_argument("--trace-dir", default="/tmp/wf_sstep")
    ap.add_argument("--exact-head", type=int, default=64)
    ap.add_argument("--top", type=int, default=15,
                    help="top-N kernels to print")
    ap.add_argument("--phase", default="decode",
                    choices=["decode", "prefill"],
                    help="prefill: trace the chunked-prefill rounds "
                         "instead (the 2.2k-tok/s prefill-heavy gap)")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from wrinklefree_tpu.config import BitNetConfig, EngineConfig
    from wrinklefree_tpu.engine import Engine, SamplingParams
    from wrinklefree_tpu.models.bitnet import init_params

    if args.tiny:
        cfg = BitNetConfig.tiny()
        ecfg = EngineConfig(max_batch_slots=4, page_size=8, num_pages=128,
                            max_context=128, prefill_buckets=(16, 32, 64))
        args.slots, args.prompt_len = 4, 24
    else:
        cfg = (BitNetConfig.llama3_8b_ternary() if args.model == "llama8b"
               else BitNetConfig.bitnet_2b())
        ecfg = EngineConfig(
            max_batch_slots=args.slots,
            num_pages=max(2048, args.slots * 40),
            exact_head_k=args.exact_head,
        )
    log(f"building engine ({args.slots} slots)...")
    params = init_params(cfg, seed=0)
    eng = Engine(params, cfg, ecfg)

    import shutil

    def submit_wave():
        return [
            eng.submit(list(range(1, args.prompt_len + 1)),
                       SamplingParams(max_new_tokens=4096))
            for _ in range(args.slots)
        ]

    if args.phase == "prefill":
        # warm the prefill programs on one wave, then trace a fresh one
        # (disable radix reuse by varying the prompt)
        warm = [
            eng.submit([2 + i] * args.prompt_len,
                       SamplingParams(max_new_tokens=1))
            for i in range(args.slots)
        ]
        while not all(r.finished for r in warm):
            eng.step()
        reqs = submit_wave()
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.trace_dir):
            while any(r.slot < 0 or r.pending for r in reqs):
                eng.step()
        wall = time.perf_counter() - t0
        toks = args.slots * args.prompt_len
        log(f"prefill wall {wall:.2f}s for {toks} tokens "
            f"({toks / wall:.0f} prefill tok/s)")
        sums = parse_trace(args.trace_dir)
        by_group = defaultdict(float)
        for name, us in sums.items():
            by_group[classify(name)] += us
        if sums:
            total = sum(sums.values())
            log("--- device time for the prefill wave ---")
            for grp, us in sorted(by_group.items(), key=lambda kv: -kv[1]):
                log(f"  {grp:16s} {us / 1e3:9.1f} ms ({100 * us / total:5.1f}%)")
            log(f"  {'TOTAL':16s} {total / 1e3:9.1f} ms (wall {wall * 1e3:.0f})")
            for name, us in sorted(sums.items(), key=lambda kv: -kv[1])[:args.top]:
                log(f"  {us / 1e3:9.2f} ms  [{classify(name):14s}] {name[:80]}")
        print(json.dumps({
            "metric": "prefill decomposition",
            "model": "tiny" if args.tiny else args.model,
            "slots": args.slots, "prompt_len": args.prompt_len,
            "prefill_tok_s": round(toks / wall, 1),
            "wall_s": round(wall, 2),
            "groups": {g: round(us / 1e3, 1) for g, us in
                       sorted(by_group.items(), key=lambda kv: -kv[1])},
        }))
        return

    # fill every slot; prefill to completion so bursts are pure decode
    reqs = submit_wave()
    t0 = time.perf_counter()
    while any(r.slot < 0 or r.pending for r in reqs):
        eng.step()
    log(f"prefill done in {time.perf_counter() - t0:.1f}s; warming decode...")
    for _ in range(2):
        eng.step()  # compile + warm the burst

    K = eng.ecfg.decode_burst
    # chain-slope wall: separate dispatch overhead from per-step cost
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.step()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    log(f"burst wall (K={K}): {wall * 1e3:.2f} ms "
        f"({wall / K * 1e3:.3f} ms/step, "
        f"{args.slots * K / wall:.0f} decode tok/s)")

    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.bursts):
            eng.step()
    steps = args.bursts * K

    sums = parse_trace(args.trace_dir)
    if not sums:
        log("no device trace events found (CPU backend traces may lack "
            "device lanes) — wall numbers above still stand")
        print(json.dumps({"metric": "serving-step decomposition",
                          "ms_per_step_wall": round(wall / K * 1e3, 3),
                          "decode_tok_s": round(args.slots * K / wall, 1),
                          "groups": {}, "kernels": {}}))
        return

    # program-wrapper spans ("jit_*", "while.*") live on a DIFFERENT
    # trace lane than the op events, so self-time can't subtract their
    # cross-lane children — including them double-counts the whole
    # step (r4's 68.6%-"other" artifact in a new guise). Sum ops only;
    # report the wrappers separately as the program-span time.
    def _is_wrapper(n):
        return n.startswith("jit_") or n.startswith("while")

    by_group = defaultdict(float)
    for name, us in sums.items():
        if not _is_wrapper(name):
            by_group[classify(name)] += us
    total = sum(us for n, us in sums.items() if not _is_wrapper(n))
    span = max((us for n, us in sums.items() if _is_wrapper(n)),
               default=0.0)

    log(f"--- device time per decode step ({steps} steps traced) ---")
    for grp, us in sorted(by_group.items(), key=lambda kv: -kv[1]):
        log(f"  {grp:16s} {us / steps / 1e3:8.3f} ms/step "
            f"({100 * us / total:5.1f}%)")
    log(f"  {'TOTAL ops':16s} {total / steps / 1e3:8.3f} ms/step "
        f"(program span {span / steps / 1e3:.3f}, wall "
        f"{wall / K * 1e3:.3f})")
    log(f"--- top {args.top} kernels ---")
    for name, us in sorted(sums.items(), key=lambda kv: -kv[1])[:args.top]:
        log(f"  {us / steps * 1e0:9.1f} us/step  [{classify(name):14s}] "
            f"{name[:80]}")

    print(json.dumps({
        "metric": "serving-step decomposition",
        "model": "tiny" if args.tiny else args.model,
        "slots": args.slots,
        "ms_per_step_wall": round(wall / K * 1e3, 3),
        "decode_tok_s": round(args.slots * K / wall, 1),
        "ms_per_step_device": round(total / steps / 1e3, 3),
        "groups": {g: round(us / steps / 1e3, 3)
                   for g, us in sorted(by_group.items(),
                                       key=lambda kv: -kv[1])},
        "kernels": {n[:80]: round(us / steps, 1) for n, us in
                    sorted(sums.items(), key=lambda kv: -kv[1])[:args.top]},
    }))


if __name__ == "__main__":
    main()
