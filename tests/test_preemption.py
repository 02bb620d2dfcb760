"""Preemption snapshot/restore + admission policy.

The snapshot is request-level (token ids + sampling state): KV pools
are recomputable caches, so a restored engine re-prefills
prompt+generated and must continue EXACTLY the stream an uninterrupted
run would have produced — greedy and seeded-sampling alike (the RNG
counter offset keeps the per-request stream aligned). SURVEY.md §5.3
lists elastic recovery as absent in the reference; designed fresh.
"""

import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.models.bitnet import init_params

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(max_batch_slots=4, page_size=8, num_pages=64,
                    max_context=64, prefill_buckets=(8, 16, 32),
                    decode_burst=2)  # fine-grained steps: snapshot mid-stream


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_snapshot_restore_continues_stream(params, temperature):
    prompts = [[1, 5, 9, 2, 7], [3, 4, 5, 6], [11, 12, 13]]
    sp = lambda: SamplingParams(max_new_tokens=16, temperature=temperature, seed=123)  # noqa: E731

    ref_eng = Engine(params, CFG, ECFG)
    want = [ref_eng.generate(p, sp()).output_ids for p in prompts]

    eng1 = Engine(params, CFG, ECFG)
    reqs1 = [eng1.submit(p, sp()) for p in prompts]
    while min(len(r.output_ids) for r in reqs1) < 5:
        eng1.step()
    snap = eng1.snapshot()
    assert len(snap["requests"]) == 3
    got_prefix = [list(r.output_ids) for r in reqs1]

    eng2 = Engine(params, CFG, ECFG)  # simulated restart
    reqs2 = eng2.restore(snap)
    while not all(r.finished for r in reqs2):
        eng2.step()
    got = [p + r.output_ids for p, r in zip(got_prefix, reqs2)]
    # the interrupted run may have emitted a few more tokens after the
    # snapshot prefix than the snapshot recorded — compare prefix-wise
    for w, g in zip(want, got):
        assert g[: len(w)] == w and len(g) >= len(w)


def test_snapshot_includes_queued_requests(params):
    eng = Engine(params, CFG, ECFG)
    reqs = [eng.submit([1 + i, 2, 3], SamplingParams(max_new_tokens=4))
            for i in range(7)]  # 7 > 4 slots: some stay queued
    eng.step()
    snap = eng.snapshot()
    live = sum(1 for r in reqs if not r.finished)
    assert len(snap["requests"]) == live


def test_sjf_admission_orders_by_prompt_len(params):
    ecfg = EngineConfig(max_batch_slots=1, page_size=8, num_pages=64,
                        max_context=64, prefill_buckets=(8, 16, 32),
                        admission_policy="sjf")
    eng = Engine(params, CFG, ecfg)
    long_r = eng.submit(list(range(1, 30)), SamplingParams(max_new_tokens=2))
    short_r = eng.submit([7, 8], SamplingParams(max_new_tokens=2))
    while not (long_r.finished and short_r.finished):
        eng.step()
    # with one slot, SJF must finish the short request first
    assert short_r.finish_t < long_r.finish_t


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_page_oom_preempts_not_kills(params, temperature):
    """An oversubscribed page pool retracts victims (SGLang semantics)
    instead of failing them: every request completes with output
    token-identical to an uncontended run, and no request ever sees an
    "oom" finish reason from decode (VERDICT r2 item 2).

    Page math: budget 6+26=32 tokens -> 8 pre-allocated pages/req at
    page_size 4 (tokens 0..31); the last burst starts at seq_len 30, so
    its max advance (30+8 tokens) demands pages 8 and 9 — 2 top-ups per
    request, 8 total against the pool's 34-32=2 free pages — guaranteed
    mid-decode contention."""
    import time as _time

    ecfg = EngineConfig(max_batch_slots=4, page_size=4, num_pages=34,
                        max_context=64, prefill_buckets=(8, 16, 32),
                        decode_burst=8)
    roomy = EngineConfig(max_batch_slots=4, page_size=4, num_pages=200,
                         max_context=64, prefill_buckets=(8, 16, 32),
                         decode_burst=8)
    prompts = [[1 + i, 2, 3, 4, 5, 6] for i in range(4)]

    def sp(i):
        return SamplingParams(max_new_tokens=26, temperature=temperature,
                              seed=1000 + i, ignore_eos=True)

    ref = Engine(params, CFG, roomy)
    want = [ref.generate(p, sp(i)).output_ids for i, p in enumerate(prompts)]

    eng = Engine(params, CFG, ecfg)
    reqs = [eng.submit(p, sp(i)) for i, p in enumerate(prompts)]
    for _ in range(20000):
        if all(r.finished for r in reqs):
            break
        if not eng.step():
            _time.sleep(0.001)
    assert all(r.finished for r in reqs)
    assert all(r.finish_reason in ("stop", "length") for r in reqs), \
        [r.finish_reason for r in reqs]
    # the pool really was contended — retraction actually exercised
    assert eng.stats.get("preemptions", 0) > 0
    for r, w in zip(reqs, want):
        assert r.output_ids == w
