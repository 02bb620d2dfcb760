"""Manual-DMA attention megakernel (batch-1 decode, kernel_lab15).

CPU-runnable parts: the tile-pick gate and the flat-cache protocol
(forward accepts a flat [L*T*KV, D] cache and returns the format it
was given — on CPU the manual kernel never engages, so this exercises
the 5D fallback relayout path).

Real-chip parts (WF_TPU_TESTS=1, marked tpu): unit bit-exactness of
the stacked manual kernel vs both the per-layer manual and the auto
kernel, and the model-level <=1-ulp/layer equivalence bound. The
kernels are NOT bit-identical on arbitrary inputs — the joint
[KV*8, T*KV] reduction tree differs from the auto kernel's per-head
[8, T] one — but interleaved exact zeros keep the drift to the last
bf16 bit per layer (measured: max 0.125 on hidden of magnitude ~16-32
after one layer). Greedy argmax on RANDOM weights can flip on such
near-ties; that is a property of any kernel whose reduction order
differs, not an error (same reason the exact-greedy head exists).

The authoritative exactness contract (which gate applies to which
comparison) lives in ROOFLINE.md "Exactness contract" — lab-chain
bit-exactness claims are per-input regression gates, never a
cross-kernel (manual-vs-auto) equivalence claim.
"""

import os

import numpy as np
import pytest

from wrinklefree_tpu.ops.ternary_pallas import attn_manual_tile

TPU = "WF_TPU_TESTS" in os.environ


def test_tile_gate_geometry():
    # below the in-window crossover: auto kernel wins, manual gated off
    assert attn_manual_tile(328, 5, 128) is None
    assert attn_manual_tile(504, 5, 128) is None
    # single tile up to 640
    assert attn_manual_tile(512, 5, 128) == 512
    assert attn_manual_tile(520, 5, 128) == 520
    # multiple of 8 required (aligned RMW groups)
    assert attn_manual_tile(1027, 5, 128) is None
    # smallest tile count with an 8-multiple tile <= 640 — never a
    # tiny-tile explosion (T=1288 used to fall to tt=8 / 161 tiles)
    assert attn_manual_tile(1288, 5, 128) == 184
    assert attn_manual_tile(1024, 5, 128) == 512
    assert attn_manual_tile(2048, 5, 128) == 512
    # ring policy (attn_manual_plan, VERDICT r4 item 2): resident only
    # for few-large-tile plans (nt <= 2); many-tile plans stream
    from wrinklefree_tpu.ops.ternary_pallas import (
        attn_manual_plan, attn_manual_ring)

    assert attn_manual_ring(1024, 5, 128) == 0  # nt=2: resident
    assert attn_manual_ring(2048, 5, 128) > 0  # nt=4: streamed
    assert attn_manual_tile(4096, 5, 128) == 512
    assert attn_manual_ring(4096, 5, 128) > 0  # streamed
    # awkward mid-T (the ctx-2048 cliff, VERDICT r4 item 2): the bench
    # allocates T=2312=8*17^2 whose only 8-multiple tiling is nt=17;
    # round 4 returned None here and decode fell off the megakernel
    # path entirely (480 -> 262 tok/s)
    assert attn_manual_plan(2312, 5, 128) == (136, 3)
    # far past any budget (scores alone overflow): still gated off
    assert attn_manual_tile(16384, 5, 128) is None


def test_flat_cache_roundtrip_cpu():
    """forward accepts a flat cache on any platform and returns flat;
    values match the 5D run exactly (CPU: manual kernel gated off, so
    this is the fallback-relayout path)."""
    import jax.numpy as jnp

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.models.bitnet import (
        KVCache, flatten_cache_for_decode, forward, init_params)

    cfg = BitNetConfig.tiny()
    params = init_params(cfg, seed=0)
    T = 64
    prompt = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    cache = KVCache.zeros(cfg, 1, T)
    lg0, cache = forward(params, cfg, prompt, cache, jnp.zeros((1,), jnp.int32),
                         logits_all=False)
    tok = jnp.asarray([[3]], jnp.int32)
    pos = jnp.full((1,), 4, jnp.int32)

    lg5, c5 = forward(params, cfg, tok, cache, pos, logits_all=False)
    flat = flatten_cache_for_decode(
        KVCache(cache.k + 0, cache.v + 0))
    lgf, cf = forward(params, cfg, tok, flat, pos, logits_all=False)
    assert cf.k.ndim == 2, "flat in -> flat out"
    np.testing.assert_array_equal(np.asarray(lg5), np.asarray(lgf))
    np.testing.assert_array_equal(
        np.asarray(c5.k).reshape(cf.k.shape), np.asarray(cf.k))


@pytest.mark.tpu
@pytest.mark.skipif(not TPU, reason="real-chip kernel test (WF_TPU_TESTS=1)")
def test_stacked_manual_bitexact_unit():
    """Stacked manual == per-layer manual == auto kernel on the lab
    input distribution, including the written cache row (real chip)."""
    import jax.numpy as jnp

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.ops import ternary_pallas as tp

    cfg = BitNetConfig.bitnet_2b()
    H, Q, KV, D = (cfg.hidden_size, cfg.q_dim, cfg.num_kv_heads,
                   cfg.head_dim)
    n_q = Q + 2 * KV * D
    L, T = 2, 520
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(0, 255, (L, H // 4, n_q), np.uint8))
    ow = jnp.asarray(rng.integers(0, 255, (L, Q // 4, H), np.uint8))
    sq = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, n_q)), jnp.float32)
    so = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, H)), jnp.float32)
    nw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, H)), jnp.float32)
    subw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, Q)), jnp.float32)
    cos8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
        * jnp.ones((8, 1), jnp.float32)
    sin8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
        * jnp.ones((8, 1), jnp.float32)
    h1 = jnp.asarray(rng.standard_normal((1, H)) * 0.05, jnp.bfloat16)
    ckf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                      jnp.bfloat16)
    cvf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                      jnp.bfloat16)
    ck5 = ckf.reshape(L, 1, T, KV, D)
    cv5 = cvf.reshape(L, 1, T, KV, D)
    kw = dict(q_dim=Q, n_kv=KV, n_heads=cfg.num_heads, head_dim=D,
              eps=cfg.rms_norm_eps, norm2=True)

    for l in (0, 1):
        for pos in (0, 48, 515):
            hs, cks, _ = tp.attn_block_megakernel_manual_stacked(
                h1, ckf, cvf, qw, ow, l, pos, sq, so, nw, subw, cos8,
                sin8, T=T, tt=520, **kw)
            ha, cka, _ = tp.attn_block_megakernel(
                h1, ck5, cv5, qw, ow, l, pos, sq, so, nw, subw, cos8,
                sin8, **kw)
            np.testing.assert_array_equal(
                np.asarray(hs, np.float32), np.asarray(ha, np.float32))
            rs = np.asarray(
                cks[l * T * KV + pos * KV : l * T * KV + pos * KV + KV],
                np.float32)
            np.testing.assert_array_equal(
                rs, np.asarray(cka[l, 0, pos], np.float32))


@pytest.mark.tpu
@pytest.mark.skipif(not TPU, reason="real-chip kernel test (WF_TPU_TESTS=1)")
def test_ring_streamed_matches_resident():
    """Ring-streamed cache mode (attn_manual_ring > 0, VERDICT r3 item
    10) must be BIT-exact vs the fully-resident kernel at a T where
    both run (per-input bitwise gate — ROOFLINE.md exactness contract),
    and must run at T=4096 where resident mode cannot."""
    import jax.numpy as jnp

    from wrinklefree_tpu.config import BitNetConfig
    from wrinklefree_tpu.ops import ternary_pallas as tp

    cfg = BitNetConfig.bitnet_2b()
    H, Q, KV, D = (cfg.hidden_size, cfg.q_dim, cfg.num_kv_heads,
                   cfg.head_dim)
    n_q = Q + 2 * KV * D
    rng = np.random.default_rng(1)
    L = 2

    def mk(T):
        qw = jnp.asarray(rng.integers(0, 255, (L, H // 4, n_q), np.uint8))
        ow = jnp.asarray(rng.integers(0, 255, (L, Q // 4, H), np.uint8))
        sq = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, n_q)), jnp.float32)
        so = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, H)), jnp.float32)
        nw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, H)), jnp.float32)
        subw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, Q)), jnp.float32)
        cos8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        sin8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        h1 = jnp.asarray(rng.standard_normal((1, H)) * 0.05, jnp.bfloat16)
        ckf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        cvf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        return qw, ow, sq, so, nw, subw, cos8, sin8, h1, ckf, cvf

    kw = dict(q_dim=Q, n_kv=KV, n_heads=cfg.num_heads, head_dim=D,
              eps=cfg.rms_norm_eps, norm2=True)

    # A/B at T=1288 (tt=184, nt=7): ring=3 genuinely refills slots
    T, tt = 1288, attn_manual_tile(1288, 5, 128)
    qw, ow, sq, so, nw, subw, cos8, sin8, h1, ckf, cvf = mk(T)
    for pos in (0, 700, 1283):
        h_res, ck_res, cv_res = tp.attn_block_megakernel_manual_stacked(
            h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8, sin8,
            T=T, tt=tt, ring=0, **kw)
        h_ring, ck_ring, cv_ring = tp.attn_block_megakernel_manual_stacked(
            h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8, sin8,
            T=T, tt=tt, ring=3, **kw)
        np.testing.assert_array_equal(
            np.asarray(h_res, np.float32), np.asarray(h_ring, np.float32))
        np.testing.assert_array_equal(
            np.asarray(ck_res, np.float32), np.asarray(ck_ring, np.float32))
        np.testing.assert_array_equal(
            np.asarray(cv_res, np.float32), np.asarray(cv_ring, np.float32))

    # T=4096: streamed mode must run, output finite, cache row written
    T4 = 4096
    tt4 = attn_manual_tile(T4, 5, 128)
    assert tt4 is not None
    qw, ow, sq, so, nw, subw, cos8, sin8, h1, ckf, cvf = mk(T4)
    pos = 4000
    h4, ck4, cv4 = tp.attn_block_megakernel_manual_stacked(
        h1, ckf, cvf, qw, ow, 0, pos, sq, so, nw, subw, cos8, sin8,
        T=T4, tt=tt4, **kw)
    out = np.asarray(h4, np.float32)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    wrote = np.asarray(ck4[pos * KV:(pos + 1) * KV], np.float32)
    before = np.asarray(ckf[pos * KV:(pos + 1) * KV], np.float32)
    assert not np.array_equal(wrote, before)  # new-token rows landed


def test_ring_streamed_semantics_interpret():
    """Ring-streamed mode is bitwise-identical to resident mode in
    Pallas interpret mode, with genuine slot refills (nt=4 > ring=3).
    CPU-runnable half of the ring gate; the Mosaic/DMA half is the
    WF_TPU_TESTS test above. Uses a D=128 reduced geometry (the manual
    kernel is lane-width-128 specific)."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    from wrinklefree_tpu.ops import ternary_pallas as tp

    orig = tp.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    tp.pl.pallas_call = patched
    try:
        H, KV, D, NH = 256, 2, 128, 4
        Q = NH * D
        n_q = Q + 2 * KV * D
        L, T, tt = 2, 64, 16  # nt=4
        rng = np.random.default_rng(0)
        qw = jnp.asarray(rng.integers(0, 255, (L, H // 4, n_q), np.uint8))
        ow = jnp.asarray(rng.integers(0, 255, (L, Q // 4, H), np.uint8))
        sq = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, n_q)), jnp.float32)
        so = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, H)), jnp.float32)
        nw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, H)), jnp.float32)
        subw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, Q)), jnp.float32)
        cos8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        sin8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        h1 = jnp.asarray(rng.standard_normal((1, H)) * 0.05, jnp.bfloat16)
        ckf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        cvf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        kw = dict(q_dim=Q, n_kv=KV, n_heads=NH, head_dim=D, eps=1e-5,
                  norm2=True)
        for pos in (0, 17, 63):
            h0, ck0, cv0 = tp.attn_block_megakernel_manual_stacked(
                h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8,
                sin8, T=T, tt=tt, ring=0, **kw)
            h3, ck3, cv3 = tp.attn_block_megakernel_manual_stacked(
                h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8,
                sin8, T=T, tt=tt, ring=3, **kw)
            np.testing.assert_array_equal(
                np.asarray(h0, np.float32), np.asarray(h3, np.float32))
            np.testing.assert_array_equal(
                np.asarray(ck0, np.float32), np.asarray(ck3, np.float32))
            np.testing.assert_array_equal(
                np.asarray(cv0, np.float32), np.asarray(cv3, np.float32))
    finally:
        tp.pl.pallas_call = orig


def test_value_softmax_matches_scratch_interpret(monkeypatch):
    """WF_ATTN_VSM=1 (single-tile value-form softmax, chip-day
    experiment) must be bitwise-identical to the scratch-buffer path in
    interpret mode, including pos=0 (empty history: garbage k/v must be
    masked/guarded out)."""
    import jax.numpy as jnp

    from wrinklefree_tpu.ops import ternary_pallas as tp

    orig = tp.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    tp.pl.pallas_call = patched
    try:
        H, KV, D, NH = 256, 2, 128, 4
        Q = NH * D
        n_q = Q + 2 * KV * D
        L, T = 2, 64  # single tile (tt = T)
        rng = np.random.default_rng(3)
        qw = jnp.asarray(rng.integers(0, 255, (L, H // 4, n_q), np.uint8))
        ow = jnp.asarray(rng.integers(0, 255, (L, Q // 4, H), np.uint8))
        sq = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, n_q)), jnp.float32)
        so = jnp.asarray(rng.uniform(0.01, 0.02, (L, 8, H)), jnp.float32)
        nw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, H)), jnp.float32)
        subw = jnp.asarray(rng.uniform(0.9, 1.1, (L, 8, Q)), jnp.float32)
        cos8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        sin8 = jnp.asarray(rng.uniform(-1, 1, (1, D)), jnp.float32) \
            * jnp.ones((8, 1), jnp.float32)
        h1 = jnp.asarray(rng.standard_normal((1, H)) * 0.05, jnp.bfloat16)
        ckf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        cvf = jnp.asarray(rng.standard_normal((L * T * KV, D)) * 0.1,
                          jnp.bfloat16)
        kw = dict(q_dim=Q, n_kv=KV, n_heads=NH, head_dim=D, eps=1e-5,
                  norm2=True)
        import jax

        for pos in (0, 17, 63):
            monkeypatch.delenv("WF_ATTN_VSM", raising=False)
            jax.clear_caches()
            h0, ck0, cv0 = tp.attn_block_megakernel_manual_stacked(
                h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8,
                sin8, T=T, tt=T, ring=0, **kw)
            monkeypatch.setenv("WF_ATTN_VSM", "1")
            jax.clear_caches()
            h2, ck2, cv2 = tp.attn_block_megakernel_manual_stacked(
                h1, ckf, cvf, qw, ow, 1, pos, sq, so, nw, subw, cos8,
                sin8, T=T, tt=T, ring=0, **kw)
            np.testing.assert_array_equal(
                np.asarray(h0, np.float32), np.asarray(h2, np.float32))
            np.testing.assert_array_equal(
                np.asarray(ck0, np.float32), np.asarray(ck2, np.float32))
            np.testing.assert_array_equal(
                np.asarray(cv0, np.float32), np.asarray(cv2, np.float32))
    finally:
        tp.pl.pallas_call = orig
