"""Native C++ runtime vs Python oracle.

The reference validates its C++ KV cache against a pure-Python reference
implementation (tests/test_kv_cache_cpp.py:21-146, TestCppVsPython
:280-373); here the pure-Python PageAllocator/RadixCache ARE the oracles
and the ctypes-wrapped wf_runtime must agree operation-for-operation.
"""

import numpy as np
import pytest

from wrinklefree_tpu.engine.page_allocator import PageAllocator
from wrinklefree_tpu.engine.radix_cache import RadixCache
from wrinklefree_tpu.native import native_available

if not native_available():
    pytest.skip("C++ toolchain unavailable", allow_module_level=True)

from wrinklefree_tpu.native import NativePageAllocator, NativeRadixCache


class TestNativeAllocator:
    def test_alloc_order_matches_python(self):
        py, cc = PageAllocator(16), NativePageAllocator(16)
        assert py.alloc(5) == cc.alloc(5)
        assert py.num_free == cc.num_free

    def test_lifo_reuse(self):
        cc = NativePageAllocator(8)
        pages = cc.alloc(3)
        cc.release(pages[1])
        assert cc.alloc(1) == [pages[1]]

    def test_refcounts(self):
        cc = NativePageAllocator(8)
        (p,) = cc.alloc(1)
        cc.retain(p)
        assert cc.refcount(p) == 2
        cc.release(p)
        assert cc.refcount(p) == 1
        free_before = cc.num_free
        cc.release(p)
        assert cc.num_free == free_before + 1

    def test_oom_raises(self):
        cc = NativePageAllocator(4)  # 3 usable
        cc.alloc(3)
        with pytest.raises(MemoryError):
            cc.alloc(1)

    def test_double_free_raises(self):
        cc = NativePageAllocator(4)
        (p,) = cc.alloc(1)
        cc.release(p)
        with pytest.raises(AssertionError):
            cc.release(p)

    def test_trash_page_release_noop(self):
        cc = NativePageAllocator(4)
        cc.release(0)  # must not raise
        assert cc.num_free == 3


class TestNativeRadix:
    def _pair(self, num_pages=64, ps=4):
        py_a, cc_a = PageAllocator(num_pages), NativePageAllocator(num_pages)
        return (py_a, RadixCache(py_a, ps)), (cc_a, NativeRadixCache(cc_a, ps))

    def test_insert_match_roundtrip(self):
        (py_a, py_r), (cc_a, cc_r) = self._pair()
        toks = list(range(12))
        py_pages, cc_pages = py_a.alloc(3), cc_a.alloc(3)
        assert py_pages == cc_pages
        assert py_r.insert(toks, py_pages) == cc_r.insert(toks, cc_pages) == 3

        m_py, p_py, n_py = py_r.match(toks + [99])
        m_cc, p_cc, n_cc = cc_r.match(toks + [99])
        assert (m_py, p_py) == (m_cc, p_cc) == (12, py_pages)
        assert len(n_cc) == 3

    def test_partial_match(self):
        (py_a, py_r), (cc_a, cc_r) = self._pair()
        toks = list(range(8))
        py_r.insert(toks, py_a.alloc(2))
        cc_r.insert(toks, cc_a.alloc(2))
        q = toks[:4] + [7, 7, 7, 7]
        m_py, p_py, _ = py_r.match(q)
        m_cc, p_cc, _ = cc_r.match(q)
        assert (m_py, p_py) == (m_cc, p_cc)
        assert m_cc == 4

    def test_lock_prevents_eviction(self):
        (_, _), (cc_a, cc_r) = self._pair()
        toks = list(range(8))
        pages = cc_a.alloc(2)
        cc_r.insert(toks, pages)
        cc_a.release_all(pages)  # only the tree's refs remain
        _, _, nodes = cc_r.match(toks)
        cc_r.lock(nodes)
        assert cc_r.evict(10) == 0  # everything locked
        cc_r.unlock(nodes)
        assert cc_r.evict(10) == 2
        assert cc_r.num_cached_pages == 0
        assert cc_a.num_free == cc_a.num_pages - 1

    def test_evict_lru_order_matches_python(self):
        (py_a, py_r), (cc_a, cc_r) = self._pair(ps=2)
        a, b = [1, 2], [3, 4]
        for (alloc, radix) in ((py_a, py_r), (cc_a, cc_r)):
            pa, pb = alloc.alloc(1), alloc.alloc(1)
            radix.insert(a, pa)
            radix.insert(b, pb)
            alloc.release_all(pa + pb)
            radix.match(a)  # touch a -> b is LRU
        py_r.evict(1)
        cc_r.evict(1)
        # b evicted in both: match(b) misses, match(a) hits
        assert py_r.match(b)[0] == cc_r.match(b)[0] == 0
        assert py_r.match(a)[0] == cc_r.match(a)[0] == 2

    def test_insert_existing_chunks_not_adopted(self):
        (_, _), (cc_a, cc_r) = self._pair()
        toks = list(range(8))
        p1 = cc_a.alloc(2)
        assert cc_r.insert(toks, p1) == 2
        p2 = cc_a.alloc(2)
        assert cc_r.insert(toks, p2) == 0  # duplicates not adopted
        assert cc_a.refcount(p2[0]) == 1  # caller still owns

    def test_reset_releases_everything(self):
        (_, _), (cc_a, cc_r) = self._pair()
        toks = list(range(16))
        pages = cc_a.alloc(4)
        cc_r.insert(toks, pages)
        cc_a.release_all(pages)
        cc_r.reset()
        assert cc_r.num_cached_pages == 0
        assert cc_a.num_free == cc_a.num_pages - 1

    def test_randomized_equivalence(self):
        """Fuzz: identical op sequence on both implementations, identical
        observable state throughout."""
        rng = np.random.default_rng(0)
        (py_a, py_r), (cc_a, cc_r) = self._pair(num_pages=128, ps=2)
        live_py, live_cc = [], []  # (tokens, pages) owned by caller
        for step in range(300):
            op = rng.integers(0, 3)
            if op == 0:  # insert a random 2-3 page sequence
                n = int(rng.integers(2, 4))
                toks = [int(t) for t in rng.integers(0, 5, n * 2)]
                if py_a.num_free < n:
                    continue
                pp, cp = py_a.alloc(n), cc_a.alloc(n)
                assert pp == cp
                assert py_r.insert(toks, pp) == cc_r.insert(toks, cp)
                py_a.release_all(pp)
                cc_a.release_all(cp)
            elif op == 1:  # match a random query
                n = int(rng.integers(1, 8))
                toks = [int(t) for t in rng.integers(0, 5, n)]
                m1, p1, _ = py_r.match(toks)
                m2, p2, _ = cc_r.match(toks)
                assert (m1, p1) == (m2, p2)
            else:  # evict
                k = int(rng.integers(1, 4))
                assert py_r.evict(k) == cc_r.evict(k)
            assert py_a.num_free == cc_a.num_free
            assert py_r.num_cached_pages == cc_r.num_cached_pages


class TestEngineWithNativeRuntime:
    def test_engine_uses_native_and_generates(self):
        import jax.numpy  # noqa: F401  (jax configured by conftest)

        from wrinklefree_tpu.config import BitNetConfig, EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams
        from wrinklefree_tpu.models.bitnet import init_params

        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        eng = Engine(
            params, cfg,
            EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                         max_context=64, prefill_buckets=(8, 16, 32)),
        )
        assert eng.native_runtime, "native runtime should build here"
        r1 = eng.generate([1, 5, 9, 2, 7, 3, 4, 8], SamplingParams(max_new_tokens=8))
        assert len(r1.output_ids) == 8
        # radix reuse on a shared prefix
        r2 = eng.generate([1, 5, 9, 2, 7, 3, 4, 8, 6], SamplingParams(max_new_tokens=4))
        assert eng.stats["radix_hit_tokens"] >= 8
        # same prompt again -> identical greedy output
        r3 = eng.generate([1, 5, 9, 2, 7, 3, 4, 8], SamplingParams(max_new_tokens=8))
        assert r3.output_ids == r1.output_ids

    def test_native_and_python_engines_agree(self):
        from wrinklefree_tpu.config import BitNetConfig, EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams
        from wrinklefree_tpu.models.bitnet import init_params

        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        kw = dict(max_batch_slots=2, page_size=8, num_pages=64,
                  max_context=64, prefill_buckets=(8, 16, 32))
        e_cc = Engine(params, cfg, EngineConfig(**kw))
        e_py = Engine(params, cfg, EngineConfig(use_native_runtime=False, **kw))
        assert e_cc.native_runtime and not e_py.native_runtime
        prompt = [2, 4, 6, 8, 10]
        sp = SamplingParams(max_new_tokens=6)
        assert e_cc.generate(prompt, sp).output_ids == e_py.generate(prompt, sp).output_ids
