"""Engine tests: paged forward == contiguous forward, continuous batching,
radix prefix reuse, page accounting (reference analogs:
tests/test_kv_cache_cpp.py, test_batching.py, kv_cache/validator.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, PageAllocator, RadixCache, SamplingParams
from wrinklefree_tpu.kv.paged import PagedKV, paged_forward
from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params

CFG = BitNetConfig.tiny()
ECFG = EngineConfig(
    max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.fixture()
def engine(params):
    return Engine(params, CFG, ECFG)


class TestPagedForward:
    def test_matches_contiguous(self, params):
        """Paged path must equal the contiguous-cache forward."""
        rng = np.random.default_rng(0)
        B, S = 2, 12
        tokens = rng.integers(0, CFG.vocab_size, size=(B, S)).astype(np.int32)

        cache = KVCache.zeros(CFG, B, 32)
        ref_logits, _ = forward(
            params, CFG, jnp.asarray(tokens), cache, jnp.zeros((B,), jnp.int32),
            logits_all=True,
        )
        ref_last = np.asarray(ref_logits)[:, -1]

        ps, npages = 8, 32
        pools = PagedKV.zeros(CFG, npages, ps)
        page_table = np.zeros((B, 4), np.int32)
        page_table[0, :2] = [1, 2]
        page_table[1, :2] = [3, 4]
        logits, pools = paged_forward(
            params, CFG, jnp.asarray(tokens), pools,
            jnp.asarray(page_table), jnp.zeros((B,), jnp.int32),
            jnp.full((B,), S, jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(logits), ref_last, rtol=2e-2, atol=2e-1)
        assert np.array_equal(np.asarray(logits).argmax(-1), ref_last.argmax(-1))

    def test_padding_is_harmless(self, params):
        """Bucket padding (new_lens < S) must not change logits."""
        rng = np.random.default_rng(1)
        toks = rng.integers(0, CFG.vocab_size, size=(6,)).astype(np.int32)
        ps = 8
        pools = PagedKV.zeros(CFG, 16, ps)
        pt = np.zeros((1, 4), np.int32)
        pt[0, :2] = [1, 2]

        padded = np.zeros((1, 16), np.int32)
        padded[0, :6] = toks
        lp, _ = paged_forward(
            params, CFG, jnp.asarray(padded), pools, jnp.asarray(pt),
            jnp.zeros((1,), jnp.int32), jnp.asarray([6], jnp.int32),
        )
        pools2 = PagedKV.zeros(CFG, 16, ps)
        le, _ = paged_forward(
            params, CFG, jnp.asarray(toks[None, :]), pools2, jnp.asarray(pt),
            jnp.zeros((1,), jnp.int32), jnp.asarray([6], jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(lp), np.asarray(le), rtol=1e-4, atol=1e-4)


class TestEngine:
    def test_warmup_precompiles_and_serves(self, params):
        """warmup() AOT-compiles the decode burst + every prefill bucket
        without touching state; generation afterwards is unchanged
        (VERDICT r1 item 7 — cold-boot TTFT)."""
        eng = Engine(params, CFG, ECFG)
        ref = eng.generate([1, 5, 9, 2, 7], SamplingParams(max_new_tokens=8))

        eng2 = Engine(params, CFG, ECFG)
        timings = eng2.warmup()
        assert any(k.startswith("decode_burst") for k in timings)
        assert sum(k.startswith("prefill[") for k in timings) == len(
            eng2.ecfg.prefill_buckets
        )
        got = eng2.generate([1, 5, 9, 2, 7], SamplingParams(max_new_tokens=8))
        assert got.output_ids == ref.output_ids

    def test_single_request_matches_simple_generate(self, params, engine):
        from wrinklefree_tpu.models.bitnet import generate

        prompt = [1, 5, 9, 2, 7]
        want = generate(params, CFG, prompt, max_new_tokens=10)[len(prompt):]
        req = engine.generate(prompt, SamplingParams(max_new_tokens=10))
        assert req.output_ids == want

    def test_concurrent_requests_match_sequential(self, params):
        """Batched decode must give the same tokens as one-at-a-time
        (reference tests/test_batching.py semantics)."""
        rng = np.random.default_rng(2)
        prompts = [rng.integers(0, CFG.vocab_size, size=(n,)).tolist() for n in (5, 9, 13)]

        seq_engine = Engine(params, CFG, ECFG)
        sequential = [
            seq_engine.generate(p, SamplingParams(max_new_tokens=8)).output_ids
            for p in prompts
        ]

        # fresh engine without radix (prefix reuse changes nothing for these
        # disjoint prompts, but keep it apples-to-apples)
        batch_engine = Engine(params, CFG, ECFG)
        reqs = [batch_engine.submit(p, SamplingParams(max_new_tokens=8)) for p in prompts]
        while not all(r.finished for r in reqs):
            batch_engine.step()
        assert [r.output_ids for r in reqs] == sequential

    def test_radix_prefix_reuse(self, params):
        """Second request sharing a long prefix must reuse cached pages and
        produce identical output (reference kv_cache/validator.py:103-148)."""
        eng = Engine(params, CFG, ECFG)
        shared = list(range(1, 25))  # 24 tokens = 3 full pages
        r1 = eng.generate(shared + [30], SamplingParams(max_new_tokens=5))
        hits_before = eng.stats["radix_hit_tokens"]
        r2 = eng.generate(shared + [30], SamplingParams(max_new_tokens=5))
        assert eng.stats["radix_hit_tokens"] > hits_before, "no radix hit"
        assert r1.output_ids == r2.output_ids

        # and a no-radix engine agrees
        ecfg = EngineConfig(**{**ECFG.__dict__, "enable_radix_cache": False})
        eng2 = Engine(params, CFG, ecfg)
        r3 = eng2.generate(shared + [30], SamplingParams(max_new_tokens=5))
        assert r3.output_ids == r1.output_ids

    def test_reset_prefix_cache(self, params):
        """Engine.reset_prefix_cache drops every cached page (bench/ops
        hygiene: warmup residue near pool capacity caused mid-window
        eviction churn + preemption self-rematch on the chip)."""
        eng = Engine(params, CFG, ECFG)
        free0 = eng.allocator.num_free
        shared = list(range(1, 25))
        r1 = eng.generate(shared + [30], SamplingParams(max_new_tokens=5))
        assert eng.radix.num_cached_pages > 0
        dropped = eng.reset_prefix_cache()
        assert dropped > 0 and eng.radix.num_cached_pages == 0
        assert eng.allocator.num_free == free0
        # post-reset: no hits, identical output
        hits = eng.stats["radix_hit_tokens"]
        r2 = eng.generate(shared + [30], SamplingParams(max_new_tokens=5))
        assert eng.stats["radix_hit_tokens"] == hits
        assert r2.output_ids == r1.output_ids
        # refuses while a request is in flight
        req = eng.submit(shared, SamplingParams(max_new_tokens=4))
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            eng.reset_prefix_cache()
        while not req.finished:
            eng.step()

    def test_page_accounting_no_leaks(self, params):
        eng = Engine(params, CFG, ECFG)
        free0 = eng.allocator.num_free
        for i in range(5):
            eng.generate(list(range(i + 1, i + 12)), SamplingParams(max_new_tokens=6))
        # all non-tree pages returned
        leaked = free0 - eng.allocator.num_free - eng.radix.num_cached_pages
        assert leaked == 0, f"leaked {leaked} pages"
        # evicting everything returns all pages
        eng.radix.reset()
        assert eng.allocator.num_free == free0

    def test_max_new_tokens_respected(self, params, engine):
        req = engine.generate([1, 2, 3], SamplingParams(max_new_tokens=4))
        assert len(req.output_ids) == 4
        assert req.finish_reason == "length"

    def test_streaming_callback(self, params, engine):
        got = []
        req = engine.submit(
            [4, 5, 6], SamplingParams(max_new_tokens=5),
            on_token=lambda t, fin: got.append((t, fin)),
        )
        while not req.finished:
            engine.step()
        assert [t for t, _ in got] == req.output_ids
        assert got[-1][1] is True


class TestAllocatorRadix:
    def test_allocator_lifo_and_refcounts(self):
        a = PageAllocator(8)
        p = a.alloc(3)
        assert len(set(p)) == 3 and 0 not in p
        a.retain(p[0])
        a.release(p[0])
        assert a.refcount(p[0]) == 1
        a.release(p[0])
        assert a.refcount(p[0]) == 0
        q = a.alloc(1)[0]
        assert q == p[0]  # LIFO
        with pytest.raises(MemoryError):
            a.alloc(10)

    def test_radix_match_insert_evict(self):
        a = PageAllocator(16)
        r = RadixCache(a, 4)
        toks = list(range(12))
        pages = a.alloc(3)
        r.insert(toks, pages)
        m, mp, nodes = r.match(toks + [99])
        assert m == 12 and mp == pages
        r.lock(nodes)
        assert r.evict(10) == 0  # locked nodes not evictable
        r.unlock(nodes)
        a.release_all(pages)
        assert r.evict(10) == 3
        assert a.num_free == 15


class TestInterleavedPrefill:
    """Batched prefill rounds + chunk-granularity interleave with decode."""

    def test_wave_admission_matches_sequential(self, params):
        rng = np.random.default_rng(7)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (5, 9, 13, 21, 6, 17)]  # > slots: queue waves
        seq_eng = Engine(params, CFG, ECFG)
        want = [seq_eng.generate(p, SamplingParams(max_new_tokens=6)).output_ids
                for p in prompts]
        eng = Engine(params, CFG, ECFG)
        reqs = [eng.submit(p, SamplingParams(max_new_tokens=6)) for p in prompts]
        while not all(r.finished for r in reqs):
            eng.step()
        assert [r.output_ids for r in reqs] == want

    def test_padded_round_no_nan_poison(self, params):
        """A padded (new_lens == 0) prefill row must not write NaN into
        the shared trash page (softmax over a fully-masked row)."""
        eng = Engine(params, CFG, ECFG)
        # 3 admits -> one batched round padded to 4 rows
        reqs = [eng.submit([1 + i, 5, 9], SamplingParams(max_new_tokens=4))
                for i in range(3)]
        while not all(r.finished for r in reqs):
            eng.step()
        pool = np.asarray(eng.pools.kv, dtype=np.float32)
        assert np.isfinite(pool).all()
        assert all(len(r.output_ids) == 4 for r in reqs)

    def test_long_prompt_interleaves_with_decode(self, params):
        """While a long prompt prefills chunk-by-chunk, an already-running
        request keeps producing tokens between rounds."""
        eng = Engine(params, CFG, ECFG)
        a = eng.submit([1, 2, 3], SamplingParams(max_new_tokens=400))
        eng.step()
        tokens_before = len(a.output_ids)
        assert tokens_before > 0
        # long prompt: needs multiple chunks at the largest bucket
        long_prompt = list(np.random.default_rng(0).integers(
            1, CFG.vocab_size, size=(max(ECFG.prefill_buckets) + 8,)))
        b = eng.submit(long_prompt, SamplingParams(max_new_tokens=4))
        eng.step()  # admit + first chunk (+ decode burst for a)
        assert eng.slots[b.slot] is b and b.pending  # still mid-prefill
        assert len(a.output_ids) > tokens_before  # a kept decoding
        while not (a.finished and b.finished):
            eng.step()
        assert a.finish_reason and b.finish_reason


class TestSchedulerKnobs:
    """Opt-in scheduler refinements: decode-slot reservation
    (max_prefill_slots) and all-rows prefill rounds (prefill_round_mode).
    Both must be token-identical to the defaults."""

    def _run_all(self, eng, prompts, max_new=6):
        reqs = [eng.submit(p, SamplingParams(max_new_tokens=max_new))
                for p in prompts]
        while not all(r.finished for r in reqs):
            eng.step()
        return [r.output_ids for r in reqs]

    def test_all_rows_mode_matches_bucket_mode(self, params):
        rng = np.random.default_rng(3)
        # mixed pending lengths across buckets, > slots (queue waves)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (5, 30, 12, 21, 7, 26)]
        want = self._run_all(Engine(params, CFG, ECFG), prompts)
        ecfg = EngineConfig(**{**ECFG.__dict__, "prefill_round_mode": "all"})
        got = self._run_all(Engine(params, CFG, ecfg), prompts)
        assert got == want

    def test_all_rows_mode_fewer_rounds(self, params):
        """Same mixed-bucket wave: 'all' mode advances every row per
        round, so it needs no more (usually fewer) prefill dispatches."""
        rng = np.random.default_rng(4)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (30, 5, 26, 7)]

        def rounds(ecfg):
            eng = Engine(params, CFG, ecfg)
            reqs = [eng.submit(p, SamplingParams(max_new_tokens=2))
                    for p in prompts]
            n = 0
            while not all(r.finished for r in reqs):
                before = eng.stats["prefill_tokens"]
                eng.step()
                n += eng.stats["prefill_tokens"] > before
            return n

        n_bucket = rounds(ECFG)
        n_all = rounds(
            EngineConfig(**{**ECFG.__dict__, "prefill_round_mode": "all"})
        )
        assert n_all <= n_bucket

    def test_max_prefill_slots_reserves_decode(self, params):
        """With a cap of 1, a decoding request keeps its slot while a
        wave of new prompts is admitted one at a time; outputs still
        match the uncapped engine."""
        rng = np.random.default_rng(5)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (4, 18, 25, 9, 14)]
        want = self._run_all(Engine(params, CFG, ECFG), prompts)
        ecfg = EngineConfig(**{**ECFG.__dict__, "max_prefill_slots": 1})
        eng = Engine(params, CFG, ecfg)
        reqs = [eng.submit(p, SamplingParams(max_new_tokens=6))
                for p in prompts]
        max_prefilling = 0
        while not all(r.finished for r in reqs):
            eng.step()
            max_prefilling = max(
                max_prefilling,
                sum(1 for r in eng.slots if r is not None and r.pending),
            )
        assert max_prefilling <= 1
        assert [r.output_ids for r in reqs] == want


class TestStaggerPrefill:
    """Depth-first chunked prefill (prefill_round_mode="stagger", the
    default): the oldest rows take the biggest fitting bucket and only
    budget/bucket rows advance per round, so early requests finish
    prefill and start decoding while later rows still prefill — instead
    of every slot finishing together (13.1 s TTFT p50 lockstep on
    8x3968, VERDICT r3 item 2). Token-identical to the other modes."""

    def _run_all(self, eng, prompts, max_new=6):
        reqs = [eng.submit(p, SamplingParams(max_new_tokens=max_new))
                for p in prompts]
        while not all(r.finished for r in reqs):
            eng.step()
        return [r.output_ids for r in reqs]

    def test_stagger_matches_bucket_mode(self, params):
        rng = np.random.default_rng(6)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (5, 30, 12, 21, 7, 26)]
        ecfg_b = EngineConfig(**{**ECFG.__dict__,
                                 "prefill_round_mode": "bucket"})
        want = self._run_all(Engine(params, CFG, ecfg_b), prompts)
        assert ECFG.prefill_round_mode == "stagger"  # the default
        got = self._run_all(Engine(params, CFG, ECFG), prompts)
        assert got == want

    def test_stagger_budget_matches_lockstep_budget(self, params):
        # binding round budget: stagger runs 1 deep row/round, bucket
        # mode runs all rows at a shrunken bucket — outputs identical
        rng = np.random.default_rng(7)
        prompts = [rng.integers(1, CFG.vocab_size, size=(30,)).tolist()
                   for _ in range(4)]
        mk = lambda mode: EngineConfig(**{
            **ECFG.__dict__, "prefill_round_mode": mode,
            "max_prefill_tokens_per_round": 32,
        })
        want = self._run_all(Engine(params, CFG, mk("bucket")), prompts)
        got = self._run_all(Engine(params, CFG, mk("stagger")), prompts)
        assert got == want

    def test_same_wave_prefix_sharing(self, params):
        """Same-prefix rows admitted in ONE wave collapse to ~1 full
        prefill + N-1 suffixes: followers defer a round and adopt the
        leader's eagerly-inserted pages (radix scenario fix)."""
        rng = np.random.default_rng(9)
        shared = rng.integers(1, CFG.vocab_size, size=(24,)).tolist()
        prompts = [shared + rng.integers(1, CFG.vocab_size, size=(6,)).tolist()
                   for _ in range(4)]
        eng = Engine(params, CFG, ECFG)
        got = self._run_all(eng, prompts)
        # naive cost = 4 x 30; with sharing the 3 followers adopt the
        # 24-token (3-page) prefix: 30 + 3 x 6 = 48... allow page
        # rounding slop but require well under 2 fulls
        assert eng.stats["prefill_tokens"] < 2 * 30, eng.stats
        assert eng.stats["radix_hit_tokens"] >= 3 * 24
        ecfg_nr = EngineConfig(**{**ECFG.__dict__,
                                  "enable_radix_cache": False})
        want = self._run_all(Engine(params, CFG, ecfg_nr), prompts)
        assert got == want

    def test_same_wave_sharing_diverging_prefixes(self, params):
        """Two prefix groups + a diverger: each group leads its own
        round; rows whose suffix diverges after the shared pages still
        produce identical tokens."""
        rng = np.random.default_rng(10)
        g1 = rng.integers(1, CFG.vocab_size, size=(16,)).tolist()
        g2 = rng.integers(1, CFG.vocab_size, size=(16,)).tolist()
        prompts = [g1 + [7], g1 + [9, 11], g2 + [3], g2 + [5, 13],
                   rng.integers(1, CFG.vocab_size, size=(11,)).tolist()]
        eng = Engine(params, CFG, ECFG)
        got = self._run_all(eng, prompts)
        ecfg_nr = EngineConfig(**{**ECFG.__dict__,
                                  "enable_radix_cache": False})
        want = self._run_all(Engine(params, CFG, ecfg_nr), prompts)
        assert got == want
        assert eng.stats["radix_hit_tokens"] > 0

    def test_stagger_finishes_oldest_first(self, params):
        """Under a binding budget the first-submitted request completes
        its WHOLE prefill in round 1 (depth-first) while later rows have
        not advanced; lockstep advances everyone a shallow chunk."""
        rng = np.random.default_rng(8)
        prompts = [rng.integers(1, CFG.vocab_size, size=(30,)).tolist()
                   for _ in range(4)]

        def first_round_pending(mode):
            ecfg = EngineConfig(**{
                **ECFG.__dict__, "prefill_round_mode": mode,
                "max_prefill_tokens_per_round": 32,
            })
            eng = Engine(params, CFG, ecfg)
            reqs = [eng.submit(p, SamplingParams(max_new_tokens=2))
                    for p in prompts]
            eng.step()  # admit + ONE prefill round (+ decode burst)
            return [len(r.pending or []) for r in reqs]

        stag = first_round_pending("stagger")
        assert stag[0] == 0, stag  # oldest row fully prefilled
        assert all(p == 30 for p in stag[1:]), stag  # others untouched
        lock = first_round_pending("bucket")
        assert all(0 < p < 30 for p in lock), lock  # everyone shallow


class TestPrefillLinearSwitch:
    """EngineConfig.prefill_linear='xla': prefill programs run the
    stacked XLA linear path while decode keeps its own — outputs must be
    token-identical (both paths match the jnp oracle bit-for-bit)."""

    def _run_all(self, eng, prompts, max_new=6):
        reqs = [eng.submit(p, SamplingParams(max_new_tokens=max_new))
                for p in prompts]
        while not all(r.finished for r in reqs):
            eng.step()
        return [r.output_ids for r in reqs]

    def test_xla_prefill_matches_default(self, params):
        from wrinklefree_tpu.ops.ternary_pallas import (
            make_pallas_linear_stacked,
        )

        rng = np.random.default_rng(9)
        prompts = [rng.integers(1, CFG.vocab_size, size=(n,)).tolist()
                   for n in (5, 30, 12, 21)]
        lf = make_pallas_linear_stacked(interpret=True)
        want = self._run_all(
            Engine(params, CFG, ECFG, linear_fn=lf), prompts)
        ecfg = EngineConfig(**{**ECFG.__dict__, "prefill_linear": "xla"})
        eng = Engine(params, CFG, ecfg, linear_fn=lf)
        assert eng._prefill_linear_fn is not lf  # switch engaged
        got = self._run_all(eng, prompts)
        assert got == want


class TestAdaptiveBurst:
    """Adaptive decode-burst length: when every active row's remaining
    budget fits a shorter compiled burst, the dispatcher uses it (the
    decode step is weight-bound and batch-invariant, so tail steps past
    the last active row's finish are whole-batch waste). Must stay
    token-identical to full-K bursts."""

    def test_short_burst_engaged_and_identical(self, params):
        import dataclasses

        ecfg = dataclasses.replace(ECFG, decode_burst=16, max_context=64)
        ref = Engine(params, CFG, dataclasses.replace(ecfg, decode_burst=8))
        eng = Engine(params, CFG, ecfg)
        prompts = [[1, 5, 9, 2, 7], [3, 3, 4], [8, 1]]
        outs, want = [], []
        for p in prompts:
            want.append(ref.generate(p, SamplingParams(max_new_tokens=6)).output_ids)
            outs.append(eng.generate(p, SamplingParams(max_new_tokens=6)).output_ids)
        assert outs == want
        # remaining budget 6 < 16 -> the K=8 variant must have engaged
        assert 8 in eng._decode_jits_k, list(eng._decode_jits_k)

    def test_full_burst_for_long_budgets(self, params):
        import dataclasses

        ecfg = dataclasses.replace(ECFG, decode_burst=16, max_context=64)
        eng = Engine(params, CFG, ecfg)
        r = eng.generate([1, 2, 3], SamplingParams(max_new_tokens=40))
        assert len(r.output_ids) == 40
        # first bursts had remaining 40 > 16: full-K path used (shorter
        # variants may appear only for the tail)
        assert r.output_ids == Engine(
            params, CFG, dataclasses.replace(ecfg, decode_burst=8)
        ).generate([1, 2, 3], SamplingParams(max_new_tokens=40)).output_ids

    def test_stop_tokens_still_respected(self, params):
        import dataclasses

        ecfg = dataclasses.replace(ECFG, decode_burst=16, max_context=64)
        eng = Engine(params, CFG, ecfg)
        base = eng.generate([4, 4, 4], SamplingParams(max_new_tokens=12))
        stop = base.output_ids[2]
        first = base.output_ids.index(stop)  # stream may repeat tokens
        r = eng.generate([4, 4, 4], SamplingParams(
            max_new_tokens=12, stop_token_ids=[stop]))
        assert r.output_ids[-1] == stop and len(r.output_ids) == first + 1
        assert r.finish_reason == "stop"


class TestInFlightPrefixSharing:
    """Eager radix insert (at prefill completion) + in-queue re-match:
    a same-wave shared-prefix admission no longer prefills the prefix
    once per slot — row 0 publishes it, untouched rows adopt it before
    their first chunk (works WITH staggered prefill, which keeps later
    rows untouched while row 0 finishes)."""

    def test_wave_shares_prefix_and_outputs_identical(self, params):
        import dataclasses

        rng = np.random.default_rng(11)
        shared = rng.integers(1, CFG.vocab_size, size=(24,)).tolist()
        prompts = [shared + rng.integers(1, CFG.vocab_size, size=(4,)).tolist()
                   for _ in range(4)]
        ecfg = dataclasses.replace(
            ECFG, max_prefill_tokens_per_round=32)  # binding: depth-first
        plain = Engine(params, CFG,
                       dataclasses.replace(ecfg, enable_radix_cache=False))
        eng = Engine(params, CFG, ecfg)

        def run(e, ps):
            rs = [e.submit(p, SamplingParams(max_new_tokens=5)) for p in ps]
            while not all(r.finished for r in rs):
                e.step()
            return [r.output_ids for r in rs]

        want = run(plain, prompts)
        got = run(eng, prompts)
        assert got == want
        # rows 1-3 adopted the 24-token shared prefix (16 tokens = one
        # full 2-page-aligned chunk at page_size 8 -> >= 16 each)
        assert eng.stats["radix_hit_tokens"] >= 3 * 16, eng.stats
        # and the engine prefilled FAR fewer tokens than 4 full prompts
        assert eng.stats["prefill_tokens"] < plain.stats["prefill_tokens"]

    def test_page_accounting_clean_after_sharing(self, params):
        import dataclasses

        rng = np.random.default_rng(12)
        shared = rng.integers(1, CFG.vocab_size, size=(24,)).tolist()
        prompts = [shared + rng.integers(1, CFG.vocab_size, size=(4,)).tolist()
                   for _ in range(4)]
        ecfg = dataclasses.replace(ECFG, max_prefill_tokens_per_round=32)
        eng = Engine(params, CFG, ecfg)
        rs = [eng.submit(p, SamplingParams(max_new_tokens=5)) for p in prompts]
        while not all(r.finished for r in rs):
            eng.step()
        free0 = eng.allocator.num_free
        # all remaining held pages belong to the radix tree; dropping it
        # must return the pool to full
        eng.radix.reset()
        assert eng.allocator.num_free == eng.ecfg.num_pages - 1  # page 0 trash
