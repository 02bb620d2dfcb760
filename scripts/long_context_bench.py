#!/usr/bin/env python
"""Long-context ring serving measurement (SURVEY §5.7, VERDICT r4 item 9).

Times ONE --long-context style request through
`engine/long_context.py` (ring-attention prefill + context-parallel
decode): prefill tok/s and decode tok/s, cold and warm, fetch-terminated.
On the single real chip the mesh is 1 device — the ring degenerates but
the program is the same blockwise-q shard_map the multi-device path
runs (the 8-device virtual-mesh exactness tests cover the collectives).

  python scripts/long_context_bench.py --prompt-len 16384 --new-tokens 32
  python scripts/long_context_bench.py --tiny        # CPU smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=16384)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="jax.profiler trace of the WARM pass; prints a "
                         "per-kernel self-time table (decode-step "
                         "decomposition for the 16K surface)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.engine.long_context import LongContextEngine
    from wrinklefree_tpu.models.bitnet import init_params

    if args.tiny:
        cfg = BitNetConfig.tiny()
        args.prompt_len = min(args.prompt_len, 512)
        args.devices = max(args.devices, 4)
    else:
        cfg = BitNetConfig.bitnet_2b()

    print(f"init params ({'tiny' if args.tiny else '2b'})...",
          file=sys.stderr, flush=True)
    params = init_params(cfg, seed=0)
    if "qkv_qw" in params["layers"]:
        raise SystemExit("needs unfused params")
    mesh = Mesh(np.asarray(jax.devices()[: args.devices]), ("seq",))
    eng = LongContextEngine(params, cfg, mesh,
                            decode_buf=max(128, args.new_tokens))

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, size=args.prompt_len).tolist()

    rep = {"metric": "long-context ring serving", "model":
           "tiny" if args.tiny else "bitnet2b",
           "prompt_len": args.prompt_len, "new_tokens": args.new_tokens,
           "devices": args.devices,
           "q_chunk": eng.PREFILL_Q_CHUNK}
    for phase in ("cold", "warm"):
        if phase == "warm" and args.profile:
            # decode-only window (LongContextEngine.generate hook):
            # tracing the whole warm pass buried the decode kernels
            # under the prefill's per-layer ring fusions
            eng.profile_decode_dir = args.profile
        t0 = time.perf_counter()
        out = eng.generate(prompt, max_new_tokens=args.new_tokens)
        wall = time.perf_counter() - t0
        eng.profile_decode_dir = None
        t = dict(eng.last_timings)
        rep[phase] = {
            "wall_s": round(wall, 2),
            "prefill_s": round(t["prefill_s"], 3),
            "prefill_tok_s": round(t["prompt_tokens"] / t["prefill_s"], 1),
            "decode_s": round(t.get("decode_s", 0.0), 3),
            "decode_tok_s": round(
                t.get("decode_tokens", 0) / t["decode_s"], 1)
            if t.get("decode_s") else None,
        }
        print(f"[{phase}] {rep[phase]} tokens={out[:4]}...",
              file=sys.stderr, flush=True)
    if args.profile:
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent))
        from profile_serving_step import parse_trace

        sums = parse_trace(args.profile)
        steps = max(args.new_tokens - 1, 1)
        for name, us in sorted(sums.items(), key=lambda kv: -kv[1])[:18]:
            print(f"[prof] {us / steps:9.1f} us/step  {name[:80]}",
                  file=sys.stderr)
        print(f"[prof] TOTAL {sum(sums.values()) / steps / 1e3:.2f} "
              f"ms/step over {steps} decode steps (prefill excluded "
              "only if it ran outside the trace window — it did not; "
              "subtract the prefill-named rows)", file=sys.stderr)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
