"""Dual (layer-major + staging) KV layout vs the token-major oracle.

The dual layout (kv/paged.py) keeps a layer-major main pool for
page-contiguous reads plus a token-major staging page per slot; pages
are transposed into the main pool when they fill. These tests pin the
invariant that the layout is OBSERVATIONALLY IDENTICAL to the
token-major layout: same greedy tokens, same logits, across chunk
boundaries, page flushes, radix reuse, and slot reuse.

(Analog of the reference's paged-cache semantics tests,
reference tests/test_kv_cache_cpp.py:21-146.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig, EngineConfig
from wrinklefree_tpu.engine import Engine, SamplingParams
from wrinklefree_tpu.kv.paged import PagedKV, paged_forward
from wrinklefree_tpu.models.bitnet import init_params


@pytest.fixture(scope="module")
def tiny():
    cfg = BitNetConfig.tiny()
    return cfg, init_params(cfg, seed=0)


def _engine(cfg, params, layout, **kw):
    base = dict(
        max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
        prefill_buckets=(8, 16, 32), kv_layout=layout,
    )
    base.update(kw)
    return Engine(params, cfg, EngineConfig(**base))


def test_dual_matches_token_greedy(tiny):
    cfg, params = tiny
    prompts = [
        list(range(1, 6)),        # mid-page prompt end
        list(range(2, 15)),       # crosses a page in prefill
        list(range(3, 12)),
        [7, 7, 7],                # tiny
        list(range(1, 25)),       # multi-bucket chunked prefill
    ]
    outs = {}
    for layout in ("token", "layer"):
        eng = _engine(cfg, params, layout)
        rs = [
            eng.generate(p, SamplingParams(max_new_tokens=20, temperature=0.0))
            for p in prompts
        ]
        outs[layout] = [(r.output_ids, r.finish_reason) for r in rs]
    assert outs["token"] == outs["layer"]


def test_dual_radix_reuse_matches(tiny):
    cfg, params = tiny
    shared = list(range(1, 17))  # two full pages
    outs = {}
    for layout in ("token", "layer"):
        eng = _engine(cfg, params, layout)
        a = eng.generate(shared + [20], SamplingParams(max_new_tokens=8, temperature=0.0))
        hits0 = eng.stats["radix_hit_tokens"]
        b = eng.generate(shared + [21], SamplingParams(max_new_tokens=8, temperature=0.0))
        assert eng.stats["radix_hit_tokens"] > hits0, "radix should hit"
        outs[layout] = (a.output_ids, b.output_ids)
    assert outs["token"] == outs["layer"]


def test_dual_slot_reuse_and_concurrency(tiny):
    cfg, params = tiny
    outs = {}
    for layout in ("token", "layer"):
        eng = _engine(cfg, params, layout)
        reqs = [
            eng.submit(list(range(i + 1, i + 7)), SamplingParams(max_new_tokens=10, temperature=0.0))
            for i in range(8)  # 8 requests over 4 slots -> slot reuse
        ]
        while any(not r.finished for r in reqs):
            eng.step()
        outs[layout] = [r.output_ids for r in reqs]
    assert outs["token"] == outs["layer"]


def test_dual_bucket_rounding(tiny):
    cfg, params = tiny
    eng = _engine(cfg, params, "layer", prefill_buckets=(5, 12, 30))
    assert all(b % eng.page_size == 0 for b in eng.ecfg.prefill_buckets)
    r = eng.generate(list(range(1, 14)), SamplingParams(max_new_tokens=4, temperature=0.0))
    assert len(r.output_ids) == 4


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8_e4m3"])
def test_dual_quantized_matches_token_quantized(tiny, kv_dtype):
    """Quantized KV on the dual layout is a LAYOUT-ONLY change vs the
    token-major quantized pool (same per-token/head scales, same dequant
    math) — greedy outputs must be identical across page flushes, chunked
    prefill and slot reuse (VERDICT r1 item 5; reference
    kv_cache/kv_cache.py:159-228's 50%-memory KV on the production path)."""
    cfg, params = tiny
    prompts = [
        list(range(1, 6)),
        list(range(2, 15)),   # crosses a page in prefill
        [7, 7, 7],
        list(range(1, 25)),   # multi-bucket chunked prefill
    ]
    outs = {}
    for layout in ("token", "layer"):
        eng = _engine(cfg, params, layout, kv_dtype=kv_dtype)
        rs = [
            eng.generate(p, SamplingParams(max_new_tokens=16, temperature=0.0))
            for p in prompts
        ]
        outs[layout] = [(r.output_ids, r.finish_reason) for r in rs]
    assert outs["token"] == outs["layer"]


def test_dual_int8_close_to_bf16(tiny):
    """int8 KV quality tripwire on the dual layout: greedy streams may
    diverge eventually, but the first logits must be close."""
    cfg, params = tiny
    P, ps = 16, 8
    pt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    toks = jnp.asarray([list(range(1, 9))], jnp.int32)
    lo = {}
    for dt in ("bf16", "int8"):
        pools = PagedKV.zeros_dual(cfg, P, ps, num_slots=2, kv_dtype=dt)
        l0, pools = paged_forward(
            params, cfg, toks, pools, pt, jnp.asarray([0]), jnp.asarray([8]),
            slot_ids=jnp.asarray([0], jnp.int32))
        # one decode step so the int8 history actually gets read
        l1, _ = paged_forward(
            params, cfg, jnp.asarray([[9]], jnp.int32), pools, pt,
            jnp.asarray([8]), jnp.asarray([1]),
            slot_ids=jnp.asarray([0], jnp.int32))
        lo[dt] = np.asarray(l1, np.float32)
    a, b = lo["bf16"].ravel(), lo["int8"].ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos


def test_paged_forward_dual_logits_match(tiny):
    """Direct paged_forward parity: one prefill chunk + two decode steps,
    token vs dual pools, logits allclose at every step."""
    cfg, params = tiny
    ps, MP, P = 8, 4, 16
    tok_pools = PagedKV.zeros(cfg, P, ps)
    dual_pools = PagedKV.zeros_dual(cfg, P, ps, num_slots=2)
    pt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    toks = jnp.asarray([list(range(1, 9))], jnp.int32)  # full bucket of 8

    lo_t, tok_pools = paged_forward(
        params, cfg, toks, tok_pools, pt, jnp.asarray([0]), jnp.asarray([8]))
    lo_d, dual_pools = paged_forward(
        params, cfg, toks, dual_pools, pt, jnp.asarray([0]), jnp.asarray([8]),
        slot_ids=jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(np.asarray(lo_t), np.asarray(lo_d), rtol=2e-2, atol=2e-2)

    sl = 8
    tok = jnp.asarray([[9]], jnp.int32)
    for step in range(10):  # crosses a page boundary at sl=16
        lo_t, tok_pools = paged_forward(
            params, cfg, tok, tok_pools, pt, jnp.asarray([sl]), jnp.asarray([1]))
        lo_d, dual_pools = paged_forward(
            params, cfg, tok, dual_pools, pt, jnp.asarray([sl]), jnp.asarray([1]),
            slot_ids=jnp.asarray([0], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(lo_t), np.asarray(lo_d), rtol=2e-2, atol=2e-2,
            err_msg=f"decode step {step} (sl={sl})")
        nxt = int(np.asarray(jnp.argmax(lo_t, -1))[0])
        assert nxt == int(np.asarray(jnp.argmax(lo_d, -1))[0])
        tok = jnp.asarray([[nxt]], jnp.int32)
        sl += 1


def test_prologue_paged_forward_logits_close(tiny):
    """The prologue-fused pallas path must track the plain paged forward
    to bf16 rounding (token-exact asserts are wrong here: on a
    random-weight model the top-2 logits tie to ~2e-4 and the in-kernel
    rounding order legitimately flips such ties)."""
    from wrinklefree_tpu.models.bitnet import fuse_projections
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused

    cfg, params = tiny
    fp = fuse_projections(params, cfg)
    lf = make_pallas_linear_fused(interpret=True)
    toks = jnp.zeros((1, 8), jnp.int32).at[0, :7].set(jnp.arange(1, 8))
    pt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)

    pool_a = PagedKV.zeros(cfg, 16, 8)
    pool_b = PagedKV.zeros(cfg, 16, 8)
    lo_a, pool_a = paged_forward(
        params, cfg, toks, pool_a, pt, jnp.asarray([0]), jnp.asarray([7]))
    lo_b, pool_b = paged_forward(
        fp, cfg, toks, pool_b, pt, jnp.asarray([0]), jnp.asarray([7]),
        linear_fn=lf)
    np.testing.assert_allclose(np.asarray(lo_a), np.asarray(lo_b),
                               rtol=6e-2, atol=6e-2)
    sl = 7
    tok = jnp.asarray([[7]], jnp.int32)
    for _ in range(6):  # mid-page + page-crossing decode steps
        lo_a, pool_a = paged_forward(
            params, cfg, tok, pool_a, pt, jnp.asarray([sl]), jnp.asarray([1]))
        lo_b, pool_b = paged_forward(
            fp, cfg, tok, pool_b, pt, jnp.asarray([sl]), jnp.asarray([1]),
            linear_fn=lf)
        np.testing.assert_allclose(np.asarray(lo_a), np.asarray(lo_b),
                                   rtol=6e-2, atol=6e-2)
        # drive BOTH with the reference's token so states stay comparable
        tok = jnp.argmax(lo_a, -1).astype(jnp.int32)[:, None]
        sl += 1


class TestFlashPagedDecode:
    """In-kernel page-gather decode attention (interpret mode) vs the
    XLA-gather dual oracle, across history edge cases."""

    def _setup(self, seq_lens, ps=8, mp=4, kv=2, g=2, d=32, lp=4, dtype=np.float32):
        rng = np.random.default_rng(0)
        b = len(seq_lens)
        p = b * mp + 2
        kvd = kv * d
        nh = kv * g
        main = jnp.asarray(rng.standard_normal((p, 2 * lp, ps, kvd)), dtype)
        staging = jnp.asarray(rng.standard_normal((b, ps, 2 * lp, kvd)), dtype)
        # distinct pages per slot (1-based; 0 = trash)
        pt = jnp.asarray(
            np.arange(1, b * mp + 1, dtype=np.int32).reshape(b, mp))
        q = jnp.asarray(rng.standard_normal((b, 1, nh, d)), dtype)
        k_cur = jnp.asarray(rng.standard_normal((b, 1, kv, d)), dtype)
        v_cur = jnp.asarray(rng.standard_normal((b, 1, kv, d)), dtype)
        sl = jnp.asarray(seq_lens, jnp.int32)
        return q, k_cur, v_cur, main, staging, pt, sl

    @pytest.mark.parametrize("layer", [0, 1])
    @pytest.mark.parametrize(
        "seq_lens",
        [
            [0, 5, 27],      # empty / staging-only / pages+staging
            [8, 16, 32],     # exact page boundaries (staging empty)
            [31, 1, 7],      # near-full table / single token
        ],
    )
    def test_matches_dual_oracle(self, seq_lens, layer):
        from wrinklefree_tpu.config import BitNetConfig
        from wrinklefree_tpu.kv.paged import _paged_attention_dual
        from wrinklefree_tpu.ops.flash_attention import flash_paged_decode

        q, k_cur, v_cur, main, staging, pt, sl = self._setup(seq_lens)
        cfg = BitNetConfig.tiny()
        ones = jnp.ones_like(sl)
        ref = _paged_attention_dual(
            q, k_cur, v_cur, main, staging, layer, pt, sl, ones, cfg)
        out = flash_paged_decode(
            q[:, 0], k_cur[:, 0], v_cur[:, 0], main, staging,
            jnp.int32(layer), pt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5)

    def test_pages_per_step_variants(self):
        from wrinklefree_tpu.config import BitNetConfig
        from wrinklefree_tpu.kv.paged import _paged_attention_dual
        from wrinklefree_tpu.ops.flash_attention import flash_paged_decode

        q, k_cur, v_cur, main, staging, pt, sl = self._setup([13, 29, 24])
        cfg = BitNetConfig.tiny()
        ones = jnp.ones_like(sl)
        ref = _paged_attention_dual(
            q, k_cur, v_cur, main, staging, 1, pt, sl, ones, cfg)
        for pp in (1, 2, 4):
            out = flash_paged_decode(
                q[:, 0], k_cur[:, 0], v_cur[:, 0], main, staging,
                jnp.int32(1), pt, sl, pages_per_step=pp, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5,
                err_msg=f"pages_per_step={pp}")

    def test_bf16_close(self):
        from wrinklefree_tpu.config import BitNetConfig
        from wrinklefree_tpu.kv.paged import _paged_attention_dual
        from wrinklefree_tpu.ops.flash_attention import flash_paged_decode

        q, k_cur, v_cur, main, staging, pt, sl = self._setup(
            [0, 5, 27], dtype=jnp.bfloat16)
        cfg = BitNetConfig.tiny()
        ones = jnp.ones_like(sl)
        ref = _paged_attention_dual(
            q, k_cur, v_cur, main, staging, 0, pt, sl, ones, cfg)
        out = flash_paged_decode(
            q[:, 0], k_cur[:, 0], v_cur[:, 0], main, staging,
            jnp.int32(0), pt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
            rtol=5e-2, atol=5e-2)


def test_stacksplit_forms_token_identical(tiny):
    """The lane-slice-stack and minor-split-reshape forms of the
    gathered-history view are semantically identical (the round-5
    size gate picks between them purely on measured perf)."""
    import wrinklefree_tpu.kv.paged as pg

    cfg, params = tiny
    prompts = [list(range(1, 20)), [5, 9, 2], list(range(4, 30))]
    outs = {}
    orig = pg._PAGED_STACKSPLIT
    try:
        for ss in (False, True):
            pg._PAGED_STACKSPLIT = ss
            eng = _engine(cfg, params, "layer")
            rs = [
                eng.generate(p, SamplingParams(max_new_tokens=16,
                                               temperature=0.0))
                for p in prompts
            ]
            outs[ss] = [r.output_ids for r in rs]
    finally:
        pg._PAGED_STACKSPLIT = orig
    assert outs[False] == outs[True]
