"""Pallas kernels vs their pure-jnp oracles (interpret mode on CPU).

Analog of the reference's kernel-vs-reference battery
(tests/test_bitnet_model.py, test_bitnet_weight_loading.py:270): every
fused kernel must match the exact jnp math — integer paths bit-for-bit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wrinklefree_tpu.ops import ternary as T
from wrinklefree_tpu.ops.ternary_pallas import ternary_matmul_pallas, ternary_linear_pallas
from wrinklefree_tpu.ops.attention import gqa_attention_reference
from wrinklefree_tpu.ops.flash_attention import flash_prefill

INTERPRET = jax.devices()[0].platform == "cpu"


def rand_packed(k, n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    return jnp.asarray(T.pack_ternary_np(w)), w


class TestTernaryMatmulPallas:
    @pytest.mark.parametrize("b,k,n", [(1, 512, 256), (8, 512, 256), (33, 1024, 512)])
    def test_int_exact_vs_oracle(self, b, k, n):
        q, w = rand_packed(k, n, seed=b)
        rng = np.random.default_rng(b)
        x_q = jnp.asarray(rng.integers(-128, 128, size=(b, k)), dtype=jnp.int8)
        got = ternary_matmul_pallas(x_q, q, interpret=INTERPRET)
        want = T.ternary_matmul_reference(x_q, q)
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_fused_rescale_matches_linear(self):
        k, n = 1024, 512
        q, _ = rand_packed(k, n, seed=3)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(4, k)), jnp.float32)
        got = np.asarray(
            ternary_linear_pallas(x, q, jnp.float32(1.7), out_dtype=jnp.float32,
                                  interpret=INTERPRET)
        )
        want = np.asarray(
            T.ternary_linear(x, q, jnp.float32(1.7), out_dtype=jnp.float32)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_3d_input(self):
        k, n = 512, 256
        q, _ = rand_packed(k, n, seed=4)
        x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, k)), jnp.float32)
        got = ternary_linear_pallas(x, q, jnp.float32(1.0), interpret=INTERPRET)
        assert got.shape == (2, 3, n)
        want = T.ternary_linear(x, q, jnp.float32(1.0))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=1e-2
        )


class TestFlashPrefill:
    @pytest.mark.parametrize("b,s,t,nh,kv,off", [
        (1, 256, 256, 4, 2, 0),
        (2, 256, 512, 8, 8, 0),     # MHA
        (1, 256, 1024, 4, 1, 128),  # MQA + chunked-prefill offset
    ])
    def test_vs_reference(self, b, s, t, nh, kv, off):
        d = 64
        rng = np.random.default_rng(s + t)
        q = jnp.asarray(rng.normal(size=(b, s, nh, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, t, kv, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, t, kv, d)), jnp.float32)
        got = np.asarray(flash_prefill(q, k, v, off, block_q=128, block_k=128,
                                       interpret=INTERPRET))
        want = np.asarray(gqa_attention_reference(q, k, v, off))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_bf16(self):
        b, s, nh, kv, d = 1, 256, 4, 2, 128
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, s, nh, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, kv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, kv, d)), jnp.bfloat16)
        got = np.asarray(flash_prefill(q, k, v, 0, block_q=128, block_k=128,
                                       interpret=INTERPRET).astype(jnp.float32))
        want = np.asarray(gqa_attention_reference(q, k, v, 0).astype(jnp.float32))
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


class TestFlashPagedPrefill:
    def test_matches_paged_oracle(self):
        """flash_paged_prefill == _paged_attention_jnp on a gathered
        history + chunk, incl. garbage history slots beyond seq_len and
        bucket padding beyond new_len."""
        import jax
        from wrinklefree_tpu.config import BitNetConfig
        from wrinklefree_tpu.kv.paged import _paged_attention_jnp
        from wrinklefree_tpu.ops.flash_attention import flash_paged_prefill

        cfg = BitNetConfig.tiny()
        KV, D, NH = cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
        B, S, T = 1, 128, 128  # chunk 128 over a 128-slot history
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(0, 1, (B, S, NH, D)), jnp.float32)
        k_cur = jnp.asarray(rng.normal(0, 1, (B, S, KV, D)), jnp.float32)
        v_cur = jnp.asarray(rng.normal(0, 1, (B, S, KV, D)), jnp.float32)
        # history rows: valid below seq_len, GARBAGE above (must be masked)
        hist = jnp.asarray(rng.normal(0, 1, (B, T, 2, KV, D)), jnp.float32)
        seq_lens = jnp.asarray([50], jnp.int32)
        new_lens = jnp.asarray([100], jnp.int32)  # 28 padded positions

        # oracle via kv_rows layout [rows, 2*Lp, KV*D], layer 0, Lp=1
        kv_rows = hist.transpose(1, 2, 0, 3, 4).reshape(T, 2, KV * D)
        token_rows = jnp.arange(T)[None, :]
        ref = _paged_attention_jnp(
            q, k_cur, v_cur, kv_rows, None, 0, token_rows,
            seq_lens[:, None] + jnp.arange(S)[None, :], seq_lens, new_lens, cfg,
        )

        k_full = jnp.concatenate([hist[:, :, 0], k_cur], axis=1)
        v_full = jnp.concatenate([hist[:, :, 1], v_cur], axis=1)
        got = flash_paged_prefill(
            q, k_full, v_full, seq_lens[0], new_lens[0],
            hist_len=T, block_q=128, block_k=128, interpret=True,
        )
        # padded queries (>= new_len) produce garbage in both paths;
        # compare only real rows
        np.testing.assert_allclose(
            np.asarray(got)[:, :100], np.asarray(ref)[:, :100],
            rtol=2e-5, atol=2e-5,
        )


# ---------------------------------------------------------------------------
# Stacked-weights kernel (layer selected by scalar prefetch, no slice copy)
# ---------------------------------------------------------------------------


def test_stacked_matmul_matches_oracle_per_layer():
    from wrinklefree_tpu.ops.ternary_pallas import ternary_matmul_pallas_stacked

    rng = np.random.default_rng(3)
    L, K, N = 3, 128, 256
    ws = rng.integers(-1, 2, size=(L, K, N)).astype(np.int8)
    qw = jnp.stack([T.pack_ternary(jnp.asarray(ws[i])) for i in range(L)])
    scales = jnp.asarray(rng.uniform(0.5, 2.0, (L,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.float32)
    x_q, sx = T.quantize_activations(x)
    for layer in range(L):
        got = ternary_matmul_pallas_stacked(
            x_q, qw, layer, sx, scales, out_dtype=jnp.float32, interpret=True
        )
        ref = (
            x_q.astype(jnp.int32) @ jnp.asarray(ws[layer], jnp.int32)
        ).astype(jnp.float32) / (sx * scales[layer])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_stacked_linear_fn_model_equivalence():
    """Full model forward with the stacked linear_fn == default XLA path."""
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import KVCache, forward, init_params
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_stacked

    cfg = BitNetConfig.tiny()
    params = init_params(cfg, seed=0)
    cache0 = KVCache.zeros(cfg, 1, 16)
    toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)
    ref, _ = forward(params, cfg, toks, cache0, start)
    cache1 = KVCache.zeros(cfg, 1, 16)
    got, _ = forward(
        params, cfg, toks, cache1, start,
        linear_fn=make_pallas_linear_stacked(interpret=True),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-2, atol=5e-2
    )
    assert np.array_equal(
        np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1))
    )


def test_fused_projections_model_equivalence():
    """fuse_projections (qkv + gate/up concat, per-column scale rows)
    preserves the forward exactly (same ternary ints, same scales)."""
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import (
        KVCache, forward, fuse_projections, init_params,
    )
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_stacked

    cfg = BitNetConfig.tiny()
    params = init_params(cfg, seed=1)
    toks = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)
    ref, _ = forward(params, cfg, toks, KVCache.zeros(cfg, 1, 16), start)
    fparams = fuse_projections(params, cfg)
    assert "qkv_qw" in fparams["layers"] and "q_qw" not in fparams["layers"]
    got, _ = forward(
        fparams, cfg, toks, KVCache.zeros(cfg, 1, 16), start,
        linear_fn=make_pallas_linear_stacked(interpret=True),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-2, atol=5e-2
    )
    assert np.array_equal(
        np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1))
    )


def test_fused_projections_engine_equivalence():
    """Engine with fused+stacked interpret path == plain engine (greedy)."""
    from wrinklefree_tpu.config import BitNetConfig, EngineConfig
    from wrinklefree_tpu.engine import Engine, SamplingParams
    from wrinklefree_tpu.models.bitnet import fuse_projections, init_params
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_stacked

    cfg = BitNetConfig.tiny()
    params = init_params(cfg, seed=0)
    base = dict(max_batch_slots=2, page_size=8, num_pages=32, max_context=64,
                prefill_buckets=(8, 16))
    ref_eng = Engine(params, cfg, EngineConfig(**base))
    fused_eng = Engine(
        fuse_projections(params, cfg), cfg, EngineConfig(**base),
        linear_fn=make_pallas_linear_stacked(interpret=True),
    )
    prompts = [list(range(1, 7)), list(range(2, 12))]
    for p in prompts:
        a = ref_eng.generate(p, SamplingParams(max_new_tokens=10, temperature=0.0))
        b = fused_eng.generate(p, SamplingParams(max_new_tokens=10, temperature=0.0))
        assert a.output_ids == b.output_ids


def test_prologue_fused_model_equivalence():
    """Prologue-fused path (norm+quant+activation inside the kernel)
    must match the default forward (both BitNet relu2 and Llama silu
    flavors)."""
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import (
        KVCache, forward, fuse_projections, init_params,
    )
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused

    for kw in ({}, {"sub_norms": False, "mlp_act": "silu"}):
        cfg = BitNetConfig.tiny()
        if kw:
            import dataclasses
            cfg = dataclasses.replace(cfg, **kw)
        params = init_params(cfg, seed=2)
        toks = jnp.asarray([[3, 1, 4, 1, 5, 9]], jnp.int32)
        start = jnp.zeros((1,), jnp.int32)
        ref, _ = forward(params, cfg, toks, KVCache.zeros(cfg, 1, 16), start)
        got, _ = forward(
            fuse_projections(params, cfg), cfg, toks,
            KVCache.zeros(cfg, 1, 16), start,
            linear_fn=make_pallas_linear_fused(interpret=True),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=6e-2, atol=6e-2
        )
        assert np.array_equal(
            np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1))
        ), f"argmax mismatch for cfg overrides {kw}"


def test_mlp_megakernel_exact_vs_two_kernel_composition():
    """The whole-MLP megakernel must be BIT-EXACT with the composition of
    two prologue-fused kernels + bf16 residual add (it rounds the
    intermediate gu to bf16 in scratch exactly like the two-kernel path
    materializes it)."""
    from wrinklefree_tpu.ops.ternary_pallas import (
        mlp_block_megakernel, ternary_matmul_stacked_fused,
    )

    rng = np.random.default_rng(7)
    L, H, I, B = 3, 256, 384, 5
    layer = 1
    gw = jnp.asarray(rng.integers(0, 256, (L, H // 4, 2 * I)), jnp.uint8)
    dw = jnp.asarray(rng.integers(0, 256, (L, I // 4, H)), jnp.uint8)
    gsc = jnp.asarray(
        np.broadcast_to(rng.uniform(10, 90, (L, 1, 2 * I)), (L, 8, 2 * I)),
        jnp.float32)
    dsc = jnp.asarray(
        np.broadcast_to(rng.uniform(10, 90, (L, 1, H)), (L, 8, H)), jnp.float32)
    pln = jnp.asarray(
        np.broadcast_to(rng.normal(1, 0.1, (L, 1, H)), (L, 8, H)), jnp.float32)
    fsn = jnp.asarray(
        np.broadcast_to(rng.normal(1, 0.1, (L, 1, I)), (L, 8, I)), jnp.float32)
    h = jnp.asarray(rng.normal(0, 1, (B, H)), jnp.bfloat16)

    for act, norm2 in (("relu2", True), ("silu", False)):
        gu = ternary_matmul_stacked_fused(
            h, gw, layer, gsc, pln, act="none", norm=True, interpret=True)
        d = ternary_matmul_stacked_fused(
            gu, dw, layer, dsc, fsn if norm2 else None,
            act=act, norm=norm2, interpret=True)
        want = h + d
        got = mlp_block_megakernel(
            h, gw, dw, layer, gsc, dsc, pln, fsn if norm2 else None,
            act=act, norm2=norm2, interpret=True)
        assert np.array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        ), f"megakernel mismatch act={act} norm2={norm2}"


def test_mlp_megakernel_model_equivalence():
    """forward() with the mega-enabled fused linear_fn == default forward."""
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import (
        KVCache, forward, fuse_projections, init_params,
    )
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused

    cfg = BitNetConfig.tiny()
    params = init_params(cfg, seed=3)
    toks = jnp.asarray([[3, 1, 4, 1, 5, 9]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)
    ref, _ = forward(params, cfg, toks, KVCache.zeros(cfg, 1, 16), start)
    lf = make_pallas_linear_fused(interpret=True, mega=True)
    assert hasattr(lf, "mlp_mega")
    got, _ = forward(
        fuse_projections(params, cfg), cfg, toks,
        KVCache.zeros(cfg, 1, 16), start, linear_fn=lf,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=6e-2, atol=6e-2
    )
    assert np.array_equal(
        np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1))
    )


def test_attn_megakernel_decode_equivalence():
    """Fully-fused batch-1 decode (attention megakernel with in-place
    aliased cache + MLP megakernel) must reproduce the default forward's
    greedy tokens over a multi-step decode, for both model flavors."""
    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import (
        KVCache, forward, fuse_projections, init_params,
    )
    from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused

    import os
    for kw in ({}, {"sub_norms": False, "mlp_act": "silu"},
               {"_layer_mega": True}):
        layer_mega = kw.pop("_layer_mega", False)
        cfg = BitNetConfig.tiny()
        if kw:
            import dataclasses
            cfg = dataclasses.replace(cfg, **kw)
        params = init_params(cfg, seed=2)
        fp = fuse_projections(params, cfg)
        if layer_mega:
            os.environ["WF_LAYER_MEGA"] = "1"
        try:
            lf = make_pallas_linear_fused(interpret=True, mega=True)
        finally:
            os.environ.pop("WF_LAYER_MEGA", None)
        assert hasattr(lf, "attn_mega") and hasattr(lf, "mlp_mega")
        assert hasattr(lf, "layer_mega") == layer_mega
        T = 16
        toks = jnp.asarray([[3, 1, 4, 1, 5, 9]], jnp.int32)
        start = jnp.zeros((1,), jnp.int32)
        ref_logits, ref_cache = forward(
            params, cfg, toks, KVCache.zeros(cfg, 1, T), start)
        got_cache = KVCache.zeros(cfg, 1, T)
        _, got_cache = forward(params, cfg, toks, got_cache, start)
        tok = jnp.argmax(ref_logits[:, -1], -1)[:, None].astype(jnp.int32)
        gtok = tok
        pos = 6
        for _ in range(4):
            ref_logits, ref_cache = forward(
                params, cfg, tok, ref_cache,
                jnp.full((1,), pos, jnp.int32), logits_all=False)
            got_logits, got_cache = forward(
                fp, cfg, gtok, got_cache,
                jnp.full((1,), pos, jnp.int32), logits_all=False,
                linear_fn=lf)
            tok = jnp.argmax(ref_logits, -1)[:, None].astype(jnp.int32)
            gtok = jnp.argmax(got_logits, -1)[:, None].astype(jnp.int32)
            assert np.array_equal(np.asarray(tok), np.asarray(gtok)), kw
            r = np.asarray(ref_logits, np.float32)
            g = np.asarray(got_logits, np.float32)
            cs = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
            assert cs > 0.999, (kw, cs)
            # the in-place cache row written by the kernel must match
            ck_r = np.asarray(ref_cache.k[:, :, pos], np.float32)
            ck_g = np.asarray(got_cache.k[:, :, pos], np.float32)
            assert np.allclose(ck_r, ck_g, atol=0.05), kw
            pos += 1
