"""Cross-process engine serving (VERDICT r1 item 3; SURVEY.md §2.3
comm-backend row; BASELINE config 3's cross-host continuous batching).

Launches TWO OS processes under `jax.distributed`, each contributing
half of a global CPU mesh, running the identical engine host loop; the
TP model axis spans the process boundary so every decode-burst psum /
logits all-gather is a real cross-process collective. Outputs must be
(a) identical across the two processes and (b) token-identical to the
single-process engine — the live replacement for the reference's no-op
FakeProcessGroup (reference extern/vllm-cpu-stub/.../parallel_state.py:10-75).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multiproc_engine_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc: int, ndev: int, timeout: int = 600):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via config API
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(nproc), str(i), str(ndev)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def _single_process_reference():
    """Same prompts/engine as the worker, in-process on the CPU mesh."""
    from wrinklefree_tpu.config import BitNetConfig, EngineConfig
    from wrinklefree_tpu.engine import Engine, SamplingParams
    from wrinklefree_tpu.models.bitnet import init_params

    cfg = BitNetConfig.tiny()
    ecfg = EngineConfig(
        max_batch_slots=2, page_size=8, num_pages=64, max_context=64,
        prefill_buckets=(8, 16, 32),
    )
    eng = Engine(init_params(cfg, seed=0), cfg, ecfg)
    return [
        eng.generate(p, SamplingParams(max_new_tokens=8)).output_ids
        for p in ([1, 5, 9, 2, 7], [3, 3, 4], [2, 4, 6, 8])
    ]


@pytest.mark.slow
def test_two_process_engine_token_identical():
    ref = _single_process_reference()
    outs = _run_cluster(nproc=2, ndev=1)
    results = []
    for rc, out in outs:
        assert rc == 0, f"worker failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    assert results[0] == results[1], "processes disagree"
    assert results[0] == ref, (results[0], ref)
