#!/usr/bin/env python
"""Worker process for the multi-controller (cross-host) engine test.

SURVEY.md §4's prescribed no-hardware validation of cross-host serving:
run the SAME engine host-loop in N processes under
`jax.distributed.initialize`, each owning a slice of a global CPU mesh
(the CPU stand-in for one TPU host each). Every process executes the
identical SPMD schedule; jitted shard_map programs span the global mesh,
so decode bursts / prefills execute as collective programs across
processes — the real replacement for the reference's FakeProcessGroup
stub (reference extern/vllm-cpu-stub/.../parallel_state.py:10-75).

Usage: multiproc_engine_worker.py PORT NPROC PID LOCAL_DEVICES
Prints one line: `RESULT <json tokens>` (all processes print the same
tokens — outputs are replicated).
"""

import json
import os
import sys


def main():
    port, nproc, pid, ndev = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wrinklefree_tpu.config import BitNetConfig, EngineConfig
    from wrinklefree_tpu.engine import Engine, SamplingParams
    from wrinklefree_tpu.models.bitnet import init_params
    from wrinklefree_tpu.parallel.sharding import make_mesh

    cfg = BitNetConfig.tiny()
    ecfg = EngineConfig(
        max_batch_slots=2, page_size=8, num_pages=64, max_context=64,
        prefill_buckets=(8, 16, 32),
    )
    # model axis spans BOTH processes: every TP collective (qkv psum,
    # logits all-gather) crosses the process boundary — this is the
    # cross-host continuous-batching path, not a single-host rehearsal
    mesh = make_mesh(1, jax.device_count())
    params = init_params(cfg, seed=0)
    eng = Engine(params, cfg, ecfg, mesh=mesh)

    outs = []
    for prompt in ([1, 5, 9, 2, 7], [3, 3, 4], [2, 4, 6, 8]):
        r = eng.generate(prompt, SamplingParams(max_new_tokens=8))
        outs.append(r.output_ids)
    print("RESULT " + json.dumps(outs), flush=True)


if __name__ == "__main__":
    main()
