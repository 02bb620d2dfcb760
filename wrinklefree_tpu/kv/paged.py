"""Paged KV cache in HBM + the paged model forward.

Page-table spec follows the reference's C++ paged cache (reference
tests/test_kv_cache_cpp.py:21-146: storage [pages, ...], free-list
allocation, gather by page/slot indices) re-laid-out for TPU with a
TOKEN-MAJOR pool:

    kv pool    : [P, page_size, 2*Lp, KV*D]  (k-layers then v-layers)
    page_table : [num_slots, max_pages]  int32 (page ids; 0 = trash)
    seq_lens   : [num_slots]             int32

Why token-major (vs the reference's layer-major [L, P, ...]): one decode
token's ENTIRE cache contribution — k and v for every layer — is a single
contiguous [2*Lp, KV*D] row, so the in-place Pallas writer
(ops/kv_update_pallas.py) commits a token with ONE aligned DMA per slot
instead of 2*L scattered ones, and the XLA-scatter fallback touches one
row per token. The row factorization (2*Lp sublanes x KV*D lanes, L
padded to Lp so 2*Lp % 8 == 0) satisfies Mosaic's (8,128) DMA alignment
at ~7% padding instead of the 60% that padding KV heads would cost.

Page 0 is a reserved TRASH page: inactive slots and bucket padding write
into it, so the jitted step never branches on slot liveness. One
`paged_forward` covers chunked prefill (S = chunk) and batched decode
(S = 1); everything is static-shaped for XLA.

Hard-won performance rules encoded here (measured on v5e-class hardware):
- NEVER scan-carry or xs-slice the pool: XLA materializes full-pool
  copies per step (~8x decode latency).
- NEVER scatter into the pool with `.at[].set` on the hot path: XLA
  lowers it to a full-pool copy (~112 ms/step on a 2.5 GB pool). The
  Pallas aliased-DMA writer is the hot path; the scatter remains as the
  CPU/test oracle and the quantized-mode fallback.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig
from ..models.bitnet import LinearFn, default_linear
from ..ops.norms import rms_norm

import os as _os_mod

# joint block-diagonal decode attention (see _gqa_core). Default OFF:
# the chip A/B at 16 slots measured 2,039.7 vs 2,274 decode tok/s —
# at serving batch XLA already batches the per-(b, kv) dots well and
# the joint form's KV-fold cross-head FLOPs cost real time (unlike the
# batch-1 Pallas kernel, where dot-issue overhead dominated and the
# same trick won 471 -> 505). Import-time read, process-launch-only.
_PAGED_JOINT = _os_mod.environ.get("WF_PAGED_JOINT", "0") == "1"
# lane-slice-stack instead of minor-dim-split reshape for the gathered
# history pages (see _paged_attention_dual). DEFAULT ON since round 5:
# the [.., KVD]->[.., KV, D] minor split retiles (KV=5 pads to 8;
# profiled 302 us/step x2 on the 16-slot step) — the stacked lane
# slices measured 2,354.6 vs 2,274 decode tok/s on the main scenario.
# Import-time read, process-launch-only.
_PAGED_STACKSPLIT = _os_mod.environ.get("WF_PAGED_STACKSPLIT", "1") == "1"
from ..ops.rope import apply_rope, rope_cos_sin
from .quantized import KV_DTYPES, dequantize_kv, needs_scale, quantize_kv


def _lpad(num_layers: int) -> int:
    """Layers padded so 2*Lp is a multiple of 8 (DMA sublane tile)."""
    return -(-num_layers // 4) * 4


class PagedKV(NamedTuple):
    """Paged KV pools. Two layouts:

    token-major (default): kv [P, ps, 2*Lp, KV*D], staging is None.
      One token's whole cache contribution is a contiguous row — O(1)
      aligned DMAs per written token — but a per-layer history READ
      gathers [KV*D]-sized strided slices (1.3 KB each), which caps
      decode-attention bandwidth.

    dual / layer-major: kv [P, 2*Lp, ps, KV*D] (read-optimized: layer
      l's keys for a page are ONE contiguous [ps, KV*D] block, k at row
      l, v at row Lp+l) plus a token-major ``staging`` pool
      [NS+1, ps, 2*Lp, KV*D] holding each slot's current partial page
      (written with the O(1) row DMA; slot NS is trash). When a page
      completes it is transposed in XLA-land and committed to the main
      pool with the in-place page writer. Combines O(1)-DMA writes with
      page-granular (20 KB+) contiguous reads.

    Quantized dtypes (int8/fp8) carry per-(token, layer, head) scales in
    ``scale`` mirroring the kv layout minus the D axis — token-major
    [P, ps, 2Lp, KV], dual main [P, 2Lp, ps, KV] — plus
    ``staging_scale`` [NS+1, ps, 2Lp, KV] for the dual staging pool
    (reference kv_cache/kv_cache.py:159-228's 50%-memory claim, on the
    production layer-major path).
    """

    kv: jax.Array
    scale: Optional[jax.Array] = None  # quantized only; layout mirrors kv
    staging: Optional[jax.Array] = None  # dual layout only
    staging_scale: Optional[jax.Array] = None  # dual + quantized only

    @classmethod
    def zeros(
        cls,
        cfg: BitNetConfig,
        num_pages: int,
        page_size: int,
        kv_dtype: str = "bf16",
    ) -> "PagedKV":
        lp = _lpad(cfg.num_layers)
        shape = (num_pages, page_size, 2 * lp, cfg.num_kv_heads * cfg.head_dim)
        dt = KV_DTYPES[kv_dtype]
        kv = jnp.zeros(shape, dt)
        if needs_scale(kv_dtype):
            return cls(
                kv, jnp.ones(shape[:-1] + (cfg.num_kv_heads,), jnp.float32)
            )
        return cls(kv, None)

    @classmethod
    def zeros_dual(
        cls,
        cfg: BitNetConfig,
        num_pages: int,
        page_size: int,
        num_slots: int,
        kv_dtype: str = "bf16",
    ) -> "PagedKV":
        if page_size % 8:
            raise ValueError("dual KV layout needs page_size % 8 == 0")
        lp = _lpad(cfg.num_layers)
        kvd = cfg.num_kv_heads * cfg.head_dim
        dt = KV_DTYPES[kv_dtype]
        kv = jnp.zeros((num_pages, 2 * lp, page_size, kvd), dt)
        staging = jnp.zeros((num_slots + 1, page_size, 2 * lp, kvd), dt)
        if needs_scale(kv_dtype):
            return cls(
                kv,
                jnp.ones((num_pages, 2 * lp, page_size, cfg.num_kv_heads), jnp.float32),
                staging,
                jnp.ones((num_slots + 1, page_size, 2 * lp, cfg.num_kv_heads), jnp.float32),
            )
        return cls(kv, None, staging)

    @property
    def dual(self) -> bool:
        return self.staging is not None

    @property
    def page_size(self) -> int:
        return self.kv.shape[2] if self.dual else self.kv.shape[1]

    @property
    def kv_dtype_name(self) -> str:
        for name, dt in KV_DTYPES.items():
            if dt == self.kv.dtype:
                return name
        raise ValueError(self.kv.dtype)


def _paged_attention_jnp(
    q, k_cur, v_cur, kv_rows, scale_rows, layer, token_rows, positions,
    seq_lens, new_lens, cfg: BitNetConfig
):
    """Gather-based paged GQA attention (oracle path).

    q/k_cur/v_cur [B,S,*,D] are the CURRENT chunk (not yet in the pool);
    kv_rows is the row-flattened pool [P*ps, 2*Lp, KV*D] captured
    READ-ONLY, token_rows [B, T] the flat row index of every visible
    history slot. The gather pulls exactly layer `layer`'s k and v rows.
    """
    B, S, NH, D = q.shape
    T = token_rows.shape[1]
    KV = k_cur.shape[2]  # LOCAL kv heads (may be a TP shard)
    G = NH // KV
    lp = kv_rows.shape[1] // 2

    k_raw = kv_rows[token_rows, layer]  # [B, T, KV*D]
    v_raw = kv_rows[token_rows, lp + layer]
    if scale_rows is not None:
        sk = scale_rows[token_rows, layer][..., :, None]  # [B,T,KV,1]
        sv = scale_rows[token_rows, lp + layer][..., :, None]
        k_hist = dequantize_kv(k_raw.reshape(B, T, KV, D), sk, out_dtype=q.dtype)
        v_hist = dequantize_kv(v_raw.reshape(B, T, KV, D), sv, out_dtype=q.dtype)
    else:
        # compute in query precision (identity for bf16 pools)
        k_hist = k_raw.reshape(B, T, KV, D).astype(q.dtype)
        v_hist = v_raw.reshape(B, T, KV, D).astype(q.dtype)

    hist_ok = jnp.arange(T)[None, :] < seq_lens[:, None]  # [B,T]
    return _gqa_core(q, k_cur, v_cur, k_hist, v_hist, hist_ok, new_lens)


def _gqa_core(q, k_cur, v_cur, k_hist, v_hist, hist_ok, new_lens):
    """Shared masked-softmax GQA over [history ++ current chunk].

    q [B,S,NH,D]; k/v_cur [B,S,KV,D]; k/v_hist [B,T,KV,D];
    hist_ok [B,T] marks valid history slots; current keys are causal
    within the chunk and limited to new_lens real tokens."""
    B, S, NH, D = q.shape
    KV = k_cur.shape[2]
    G = NH // KV
    T = k_hist.shape[1]
    k = jnp.concatenate([k_hist, k_cur.astype(k_hist.dtype)], axis=1)
    v = jnp.concatenate([v_hist, v_cur.astype(v_hist.dtype)], axis=1)

    scale = 1.0 / np.sqrt(D)
    if S == 1 and _PAGED_JOINT:
        # joint block-diagonal decode attention (round 5): ONE batched
        # [B, NH, (T+1)*KV] scores dot + ONE PV dot instead of B*KV
        # tiny per-(batch, kv-head) dots — the same MXU-issue-cost fix
        # that took the batch-1 auto kernel 471 -> 505 tok/s. Masked
        # cross-head entries are exact -1e30 -> exp underflows to +0.0;
        # adding/multiplying exact zeros never changes the per-head
        # partials, so outputs are bitwise-equal to the einsum form.
        TK = (T + 1) * KV
        k_flat = k.reshape(B, TK, D)  # row t*KV + kv (leading merge)
        v_flat = v.reshape(B, TK, D)
        q_rows = q.reshape(B, NH, D)  # row kv*G + g
        s_j = jnp.einsum(
            "brd,btd->brt", q_rows, k_flat,
            preferred_element_type=jnp.float32,
        ) * scale  # [B, NH, TK]
        col = jnp.arange(TK)
        row_kv = (jnp.arange(NH) // G)[:, None]  # [NH, 1]
        same_head = (col[None, :] % KV) == row_kv  # [NH, TK]
        col_t = col // KV  # [TK]
        ok_t = jnp.concatenate(
            [hist_ok, (new_lens > 0)[:, None]], axis=1
        )  # [B, T+1]
        mj = same_head[None] & ok_t[:, col_t][:, None, :]  # [B, NH, TK]
        s_j = jnp.where(mj, s_j, -1e30)
        p_j = jax.nn.softmax(s_j, axis=-1).astype(v_flat.dtype)
        out = jnp.einsum("brt,btd->brd", p_j, v_flat)
        return out.reshape(B, S, NH, D)
    qg = q.reshape(B, S, KV, G, D)
    scores = (
        jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
        * scale
    )
    # current keys: causal within the chunk and within new_lens
    cur_idx = jnp.arange(S)
    cur_ok = (cur_idx[None, None, :] <= cur_idx[None, :, None]) & (
        cur_idx[None, None, :] < new_lens[:, None, None]
    )  # [B,S_q,S_k]
    mask = jnp.concatenate(
        [jnp.broadcast_to(hist_ok[:, None, :], (B, S, T)), cur_ok], axis=-1
    )  # [B, S, T+S]
    # finite mask value: a FULLY-masked row (batch padding with
    # new_lens == 0) must produce garbage-but-finite output — softmax
    # over all -inf yields NaN, which would poison the shared trash page
    # and then every other row via 0 * NaN in the value einsum
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(B, S, NH, D)


def _paged_attention_dual(
    q, k_cur, v_cur, main, staging_b, layer, page_table, seq_lens, new_lens,
    cfg: BitNetConfig, main_scale=None, staging_scale_b=None,
):
    """History attention over the layer-major main pool + staging page.

    main [P, 2Lp, ps, KVD]: layer `layer`'s keys for one page are ONE
    contiguous [ps, KVD] block (k at row `layer`, v at `Lp+layer`), so
    the XLA gather below moves 20 KB+ contiguous chunks instead of the
    token-major layout's 1.3 KB strided slices (~6x decode-attention
    bandwidth measured at serving batch sizes).
    staging_b [B, ps, 2Lp, KVD]: this batch's partial pages, token-major.
    Valid history = (seq_lens // ps) full pages + (seq_lens % ps)
    staging tokens.

    Quantized pools pass main_scale [P, 2Lp, ps, KV] and
    staging_scale_b [B, ps, 2Lp, KV]; history is dequantized after the
    page gather (the gather itself moves the int8/fp8 bytes — that IS
    the bandwidth/memory win).
    """
    B, S, NH, D = q.shape
    KV = k_cur.shape[2]
    lp = main.shape[1] // 2
    ps = main.shape[2]
    MP = page_table.shape[1]

    k_pages = main[page_table, layer]  # [B, MP, ps, KVD] page-contiguous
    v_pages = main[page_table, lp + layer]
    if _PAGED_STACKSPLIT and MP * ps <= 512:
        # the [.., KVD] -> [.., KV, D] MINOR-dim split retiles (KV=5
        # pads to 8 sublane tiles; profiled 302 us/step each on the
        # 16-slot decode step). Lane slices stacked on a LEADING axis
        # avoid the retile — but only up to moderate history widths:
        # same-session decode A/Bs measured +3.5% at MP*ps=512 (main,
        # 2,354.6 vs 2,274) and -10% at MP*ps=1024 (radix, 649.6 vs
        # 723.4), so the stack form is gated to <=512 history tokens.
        # (The flash PREFILL path keeps it unconditionally: +7% total
        # at MP*ps=4096 — different reuse regime.)
        def _split(p):
            f = p.reshape(B, MP * ps, KV * D)  # leading merge, cheap
            return jnp.stack(
                [f[..., i * D:(i + 1) * D] for i in range(KV)], axis=2
            )
        k_main = _split(k_pages)
        v_main = _split(v_pages)
    else:
        k_main = k_pages.reshape(B, MP * ps, KV, D)
        v_main = v_pages.reshape(B, MP * ps, KV, D)
    k_stage = staging_b[:, :, layer].reshape(B, ps, KV, D)
    v_stage = staging_b[:, :, lp + layer].reshape(B, ps, KV, D)
    if main_scale is not None:
        sk = main_scale[page_table, layer].reshape(B, MP * ps, KV)[..., None]
        sv = main_scale[page_table, lp + layer].reshape(B, MP * ps, KV)[..., None]
        k_main = dequantize_kv(k_main, sk, out_dtype=q.dtype)
        v_main = dequantize_kv(v_main, sv, out_dtype=q.dtype)
        ssk = staging_scale_b[:, :, layer][..., None]  # [B, ps, KV, 1]
        ssv = staging_scale_b[:, :, lp + layer][..., None]
        k_stage = dequantize_kv(k_stage, ssk, out_dtype=q.dtype)
        v_stage = dequantize_kv(v_stage, ssv, out_dtype=q.dtype)

    full_tokens = (seq_lens // ps) * ps  # tokens committed to main
    off = seq_lens - full_tokens  # tokens in staging
    main_ok = jnp.arange(MP * ps)[None, :] < full_tokens[:, None]
    stage_ok = jnp.arange(ps)[None, :] < off[:, None]

    k_hist = jnp.concatenate([k_main, k_stage], axis=1).astype(q.dtype)
    v_hist = jnp.concatenate([v_main, v_stage], axis=1).astype(q.dtype)
    hist_ok = jnp.concatenate([main_ok, stage_ok], axis=1)
    return _gqa_core(q, k_cur, v_cur, k_hist, v_hist, hist_ok, new_lens)


def _gqa_core_windowed(
    q, k_cur, v_cur, k_hist, v_hist, hist_pos, hist_valid,
    seq_lens, new_lens, window: int, global_tokens: int,
):
    """Masked-softmax GQA over [gathered history ++ current chunk] with
    sliding-window + global-prefix key selection.

    hist_pos [B, Th] carries each gathered history token's GLOBAL
    sequence position; hist_valid [B, Th] its storage validity. A key at
    position kp is visible to the query at position qp iff
    ``qp-window <= kp <= qp`` (the window) or ``kp < global_tokens`` and
    strictly before the window (the Longformer-style global prefix —
    exclusive, so no key is double-counted across the two gathers)."""
    B, S, NH, D = q.shape
    KV = k_cur.shape[2]
    G = NH // KV
    Th = k_hist.shape[1]
    k = jnp.concatenate([k_hist, k_cur.astype(k_hist.dtype)], axis=1)
    v = jnp.concatenate([v_hist, v_cur.astype(v_hist.dtype)], axis=1)

    qp = seq_lens[:, None] + jnp.arange(S)[None, :]  # [B, S] query pos

    def win_ok(kp):  # kp [B, S, T'] -> visibility under window+globals
        in_win = (kp >= qp[:, :, None] - window) & (kp <= qp[:, :, None])
        is_glob = (kp < global_tokens) & (kp < qp[:, :, None] - window)
        return in_win | is_glob

    hist_ok = (
        jnp.broadcast_to(hist_valid[:, None, :], (B, S, Th))
        & win_ok(jnp.broadcast_to(hist_pos[:, None, :], (B, S, Th)))
    )
    cur_idx = jnp.arange(S)
    cur_pos = seq_lens[:, None] + cur_idx[None, :]  # [B, S_k]
    cur_ok = (
        (cur_idx[None, None, :] <= cur_idx[None, :, None])
        & (cur_idx[None, None, :] < new_lens[:, None, None])
        & win_ok(jnp.broadcast_to(cur_pos[:, None, :], (B, S, S)))
    )
    mask = jnp.concatenate([hist_ok, cur_ok], axis=-1)  # [B, S, Th+S]

    scale = 1.0 / np.sqrt(D)
    qg = q.reshape(B, S, KV, G, D)
    scores = (
        jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
        * scale
    )
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(B, S, NH, D)


def make_dual_window_attention(window: int, global_tokens: int = 0):
    """Sliding-window attention that actually changes the serving cost
    shape (VERDICT r2 item 6): pages wholly outside [qp-window, qp] and
    the global prefix are never gathered — the page-table indirection
    lets the read skip them, so per-step attention bytes scale with
    window/context instead of context (the TPU realization of the
    reference's O(n*w) claim, reference
    sglang_backend/sparse_attention.py:83-119 and research notes
    docs/research/notebook.md:856-863 — there it only post-masks
    already-computed scores, saving nothing).

    Exact-equivalence property: whenever window >= seq_len the visible
    set equals full causal attention, so outputs are identical to
    `_paged_attention_dual` (tests/test_window_paged.py). KV writes are
    unchanged — the full cache is retained, only READ bytes shrink.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    if window % 1:
        raise ValueError("window must be an int")

    def attn(q, k_cur, v_cur, main, staging_b, layer, page_table,
             seq_lens, new_lens, cfg, main_scale=None, staging_scale_b=None):
        B, S, NH, D = q.shape
        KV = k_cur.shape[2]
        lp = main.shape[1] // 2
        ps = main.shape[2]
        MP = page_table.shape[1]
        # pages that can intersect any query's window this call
        wp = min(MP, (window + S) // ps + 2)
        gp = min(MP, -(-global_tokens // ps)) if global_tokens > 0 else 0

        full_tokens = (seq_lens // ps) * ps  # committed to main pages
        off = seq_lens - full_tokens

        first = jnp.maximum(seq_lens - window, 0) // ps  # [B]
        idx = jnp.minimum(first[:, None] + jnp.arange(wp)[None, :], MP - 1)
        wpt = jnp.take_along_axis(page_table, idx, axis=1)  # [B, wp]

        def gather(pt, n):
            kk = main[pt, layer].reshape(B, n * ps, KV, D)
            vv = main[pt, lp + layer].reshape(B, n * ps, KV, D)
            if main_scale is not None:
                sk = main_scale[pt, layer].reshape(B, n * ps, KV)[..., None]
                sv = main_scale[pt, lp + layer].reshape(B, n * ps, KV)[..., None]
                kk = dequantize_kv(kk, sk, out_dtype=q.dtype)
                vv = dequantize_kv(vv, sv, out_dtype=q.dtype)
            return kk.astype(q.dtype), vv.astype(q.dtype)

        k_w, v_w = gather(wpt, wp)
        wpos = first[:, None] * ps + jnp.arange(wp * ps)[None, :]  # [B, wp*ps]
        w_valid = wpos < full_tokens[:, None]

        segs_k, segs_v, segs_pos, segs_ok = [k_w], [v_w], [wpos], [w_valid]
        if gp:
            k_g, v_g = gather(page_table[:, :gp], gp)
            gpos = jnp.broadcast_to(
                jnp.arange(gp * ps)[None, :], (B, gp * ps)
            )
            # a position covered by the window gather (pos >= first*ps)
            # must not be visible through this copy too — without this
            # the early-generation overlap (first == 0) would double-
            # count keys in the softmax
            g_valid = (gpos < full_tokens[:, None]) & (
                gpos < first[:, None] * ps
            )
            segs_k.append(k_g)
            segs_v.append(v_g)
            segs_pos.append(gpos)
            segs_ok.append(g_valid)

        k_stage = staging_b[:, :, layer].reshape(B, ps, KV, D)
        v_stage = staging_b[:, :, lp + layer].reshape(B, ps, KV, D)
        if main_scale is not None:
            ssk = staging_scale_b[:, :, layer][..., None]
            ssv = staging_scale_b[:, :, lp + layer][..., None]
            k_stage = dequantize_kv(k_stage, ssk, out_dtype=q.dtype)
            v_stage = dequantize_kv(v_stage, ssv, out_dtype=q.dtype)
        spos = full_tokens[:, None] + jnp.arange(ps)[None, :]
        s_valid = jnp.arange(ps)[None, :] < off[:, None]
        segs_k.append(k_stage.astype(q.dtype))
        segs_v.append(v_stage.astype(q.dtype))
        segs_pos.append(spos)
        segs_ok.append(s_valid)

        return _gqa_core_windowed(
            q, k_cur, v_cur,
            jnp.concatenate(segs_k, axis=1),
            jnp.concatenate(segs_v, axis=1),
            jnp.concatenate(segs_pos, axis=1),
            jnp.concatenate(segs_ok, axis=1),
            seq_lens, new_lens, window, global_tokens,
        )

    attn.window = window
    attn.global_tokens = global_tokens
    return attn


def _paged_attention_flash(
    q, k_cur, v_cur, kv_rows, scale_rows, layer, token_rows, positions,
    seq_lens, new_lens, cfg: BitNetConfig
):
    """Flash (online-softmax) paged prefill attention — same contract as
    `_paged_attention_jnp` but never materializes the [S, T] scores.
    Selected for single-request prefill chunks on TPU (B=1, S>=128,
    unquantized pools)."""
    from ..ops.flash_attention import flash_paged_prefill

    B, S, NH, D = q.shape
    T = token_rows.shape[1]
    KV = k_cur.shape[2]  # LOCAL kv heads (may be a TP shard)
    lp = kv_rows.shape[1] // 2
    k_hist = kv_rows[token_rows, layer].reshape(B, T, KV, D)
    v_hist = kv_rows[token_rows, lp + layer].reshape(B, T, KV, D)
    k_full = jnp.concatenate([k_hist, k_cur.astype(k_hist.dtype)], axis=1)
    v_full = jnp.concatenate([v_hist, v_cur.astype(v_hist.dtype)], axis=1)
    out = flash_paged_prefill(
        q.astype(k_full.dtype), k_full, v_full,
        seq_lens, new_lens, hist_len=T,
    )
    return out.astype(q.dtype)


def _paged_attention_dual_flash_decode(
    q, k_cur, v_cur, main, staging_b, layer, page_table, seq_lens, new_lens,
    cfg: BitNetConfig, main_scale=None, staging_scale_b=None,
):
    """Decode-step (S == 1) attention with the page gather INSIDE the
    Pallas kernel (ops/flash_attention.flash_paged_decode): each page
    moves HBM->VMEM once, vs the XLA gather writing a [B, MP, ps, KVD]
    copy back to HBM and re-reading it in the attention einsum."""
    from ..ops.flash_attention import flash_paged_decode

    out = flash_paged_decode(
        q[:, 0], k_cur[:, 0], v_cur[:, 0], main, staging_b, layer,
        page_table, seq_lens,
    )
    return out[:, None]


def _paged_attention_dual_flash(
    q, k_cur, v_cur, main, staging_b, layer, page_table, seq_lens, new_lens,
    cfg: BitNetConfig, main_scale=None, staging_scale_b=None,
):
    """Flash (online-softmax) prefill over the dual layout. Prefill
    chunks always start page-aligned (engine guarantees buckets are
    multiples of page_size), so staging is empty and valid history is
    exactly the seq_lens-token prefix of the gathered main pages."""
    from ..ops.flash_attention import flash_paged_prefill

    B, S, NH, D = q.shape
    KV = k_cur.shape[2]
    lp = main.shape[1] // 2
    ps = main.shape[2]
    MP = page_table.shape[1]
    T = MP * ps
    if _PAGED_STACKSPLIT:
        # lane-slice stack: avoids the KVD -> (KV, D) minor-split
        # retile (KV=5 pads to 8) — same fix as the decode path
        def _split(p):
            f = p.reshape(B, T, KV * D)
            return jnp.stack(
                [f[..., i * D:(i + 1) * D] for i in range(KV)], axis=2
            )
        k_hist = _split(main[page_table, layer])
        v_hist = _split(main[page_table, lp + layer])
    else:
        k_hist = main[page_table, layer].reshape(B, T, KV, D)
        v_hist = main[page_table, lp + layer].reshape(B, T, KV, D)
    k_full = jnp.concatenate([k_hist, k_cur.astype(k_hist.dtype)], axis=1)
    v_full = jnp.concatenate([v_hist, v_cur.astype(v_hist.dtype)], axis=1)
    out = flash_paged_prefill(
        q.astype(k_full.dtype), k_full, v_full,
        seq_lens, new_lens, hist_len=T,
    )
    return out.astype(q.dtype)


def _dual_write(
    pools: PagedKV,
    vals: jax.Array,  # [B, S, 2Lp, KVD] token rows (k-layers then v-layers)
    page_table: jax.Array,  # [B, MP]
    seq_lens: jax.Array,  # [B] tokens already cached (page-aligned if S > 1)
    new_lens: jax.Array,  # [B] real tokens in this chunk
    slot_ids: Optional[jax.Array],
    use_pallas: bool,
    svals: Optional[jax.Array] = None,  # [B, S, 2Lp, KV] quantized scales
) -> PagedKV:
    """Commit S new tokens to the dual-layout pools.

    Decode (S == 1): the token row goes to the slot's staging page; when
    that fills, the whole page is transposed into the layer-major main
    pool (one contiguous multi-MB DMA amortized over page_size steps).
    Prefill (S % ps == 0, page-aligned start): pages fully covered by
    real tokens are transposed in-register and written page-at-a-time;
    the partial remainder goes to staging. Padding/incomplete targets
    resolve to the trash page (main page 0 / staging slot NS).
    """
    main, staging = pools.kv, pools.staging
    main_s, staging_s = pools.scale, pools.staging_scale
    if use_pallas and svals is not None:
        raise ValueError("pallas KV writer requires unquantized pools")
    B, S, two_lp, kvd = vals.shape
    P, _, ps, _ = main.shape
    MP = page_table.shape[1]
    NS = staging.shape[0] - 1  # last staging slot is trash
    slots = (
        jnp.arange(B, dtype=jnp.int32)
        if slot_ids is None
        else slot_ids.astype(jnp.int32)
    )

    if S <= ps:
        # decode (S == 1) or a speculative verify window (S == k+1):
        # every token's row goes to its slot's staging page at offset
        # (pos % ps); the slot's current page flushes iff this window
        # covers its last offset. Windows that include REJECTED drafts
        # are self-healing: a page flushed with garbage in its tail gets
        # re-flushed with real content when the sequence actually
        # crosses the boundary (the flush is position-triggered), and
        # attention masks main-pool tokens beyond seq_len meanwhile.
        off0 = (seq_lens % ps).astype(jnp.int32)
        ar = jnp.arange(S, dtype=jnp.int32)[None, :]
        pos_off = (off0[:, None] + ar) % ps
        real = ar < new_lens[:, None]
        in_cur = off0[:, None] + ar < ps  # token lands in the CURRENT page
        # WRITE ORDER MATTERS: current-page rows first, then the flush
        # (which snapshots the staging page), and only then the wrapped
        # next-page rows — otherwise a window that crosses the boundary
        # would overwrite staging rows 0.. before the flush reads them.
        srow1 = jnp.where(real & in_cur, slots[:, None], NS).astype(jnp.int32)
        srow2 = jnp.where(real & ~in_cur, slots[:, None], NS).astype(jnp.int32)
        completed = off0 + new_lens >= ps  # at most one page per window
        lpg = jnp.clip(seq_lens // ps, 0, MP - 1)
        pid_b = jnp.where(
            completed,
            jnp.take_along_axis(page_table, lpg[:, None], axis=1)[:, 0],
            0,
        ).astype(jnp.int32)
        if use_pallas:
            from ..ops.kv_update_pallas import kv_write_pallas

            staging = kv_write_pallas(
                staging,
                vals.reshape(B * S, two_lp, kvd),
                srow1.reshape(-1),
                pos_off.reshape(-1),
            )
            # flush completed pages: XLA transpose of this batch's staging
            # pages (~MBs — the in-kernel Mosaic transpose does not
            # legalize for these shapes), then the in-place page writer.
            # pid 0 for non-completed slots: garbage lands in the trash
            # page, so the write needs no conditional. Page rows are
            # viewed as [2Lp*ps, KVD] — merging LEADING dims only, which
            # is layout-preserving on TPU (merging the minor dims would
            # relayout-copy the whole multi-GB pool every step).
            flushed = jnp.swapaxes(staging[slots], 1, 2)  # [B, 2Lp, ps, KVD]
            main = kv_write_pallas(
                main.reshape(P, 1, two_lp * ps, kvd),
                flushed.reshape(B, two_lp * ps, kvd),
                pid_b,
                jnp.zeros((B,), jnp.int32),
            ).reshape(P, two_lp, ps, kvd)
            if S > 1:
                staging = kv_write_pallas(
                    staging,
                    vals.reshape(B * S, two_lp, kvd),
                    srow2.reshape(-1),
                    pos_off.reshape(-1),
                )
        else:
            staging = staging.at[srow1, pos_off].set(vals)
            # pid 0 for non-completed slots: garbage lands in the trash page
            flushed = jnp.swapaxes(staging[slots], 1, 2)  # [B, 2Lp, ps, KVD]
            main = main.at[pid_b].set(flushed)
            if S > 1:
                staging = staging.at[srow2, pos_off].set(vals)
            if svals is not None:
                # scales mirror the kv writes (same rows, minus the D axis)
                staging_s = staging_s.at[srow1, pos_off].set(svals)
                flushed_s = jnp.swapaxes(staging_s[slots], 1, 2)
                main_s = main_s.at[pid_b].set(flushed_s)
                if S > 1:
                    staging_s = staging_s.at[srow2, pos_off].set(svals)
        return PagedKV(main, main_s, staging, staging_s)

    if S % ps:
        raise ValueError(
            f"dual KV layout requires prefill chunks that are multiples of "
            f"page_size ({ps}); got S={S}"
        )
    npg = S // ps
    pages = vals.reshape(B, npg, ps, two_lp, kvd).transpose(0, 1, 3, 2, 4)
    j = jnp.arange(npg, dtype=jnp.int32)[None, :]
    logical = seq_lens[:, None] // ps + j
    full = ((j + 1) * ps <= new_lens[:, None]) & (logical < MP)
    pid = jnp.where(
        full,
        jnp.take_along_axis(page_table, jnp.clip(logical, 0, MP - 1), axis=1),
        0,
    ).astype(jnp.int32)  # [B, npg]

    # staging remainder: the (new_lens % ps) tokens of the first non-full page
    nfull = new_lens // ps
    idx = nfull[:, None] * ps + jnp.arange(ps)[None, :]  # [B, ps] chunk-relative
    valid = idx < new_lens[:, None]
    vals_stage = jnp.take_along_axis(
        vals, jnp.clip(idx, 0, S - 1)[:, :, None, None], axis=1
    )  # [B, ps, 2Lp, KVD]
    srow_slot = jnp.where(valid, slots[:, None], NS).astype(jnp.int32)
    soff = jnp.broadcast_to(jnp.arange(ps, dtype=jnp.int32)[None, :], (B, ps))

    if use_pallas:
        from ..ops.kv_update_pallas import kv_write_pallas

        # leading-dims-only reshapes: layout-preserving (see decode path)
        main = kv_write_pallas(
            main.reshape(P, 1, two_lp * ps, kvd),
            pages.reshape(B * npg, two_lp * ps, kvd),
            pid.reshape(-1),
            jnp.zeros((B * npg,), jnp.int32),
        ).reshape(P, two_lp, ps, kvd)
        staging = kv_write_pallas(
            staging,
            vals_stage.reshape(B * ps, two_lp, kvd),
            srow_slot.reshape(-1),
            soff.reshape(-1),
        )
    else:
        main = main.at[pid.reshape(-1)].set(pages.reshape(B * npg, two_lp, ps, kvd))
        staging = staging.at[srow_slot.reshape(-1), soff.reshape(-1)].set(
            vals_stage.reshape(B * ps, two_lp, kvd)
        )
        if svals is not None:
            kvh = svals.shape[-1]
            pages_s = svals.reshape(B, npg, ps, two_lp, kvh).transpose(0, 1, 3, 2, 4)
            main_s = main_s.at[pid.reshape(-1)].set(
                pages_s.reshape(B * npg, two_lp, ps, kvh)
            )
            svals_stage = jnp.take_along_axis(
                svals, jnp.clip(idx, 0, S - 1)[:, :, None, None], axis=1
            )
            staging_s = staging_s.at[srow_slot.reshape(-1), soff.reshape(-1)].set(
                svals_stage.reshape(B * ps, two_lp, kvh)
            )
    return PagedKV(main, main_s, staging, staging_s)


def paged_forward(
    params,
    cfg: BitNetConfig,
    tokens: jax.Array,  # [B, S] int32 (padded; padding positions >= seq_len+real_S)
    pools: PagedKV,
    page_table: jax.Array,  # [B, MP] int32
    seq_lens: jax.Array,  # [B] int32 tokens already cached (before this call)
    new_lens: jax.Array,  # [B] int32 how many of the S tokens are real
    *,
    linear_fn: Optional[LinearFn] = None,
    attention_fn=None,
    kv_write: str = "xla",  # "pallas" = in-place DMA kernel (TPU, unquantized)
    tp_axis: Optional[str] = None,
    tp_kv_replicated: bool = False,  # KV replicated over tp_axis (e.g.
    # the flagship 20q/5kv geometry on tp=2/4): pools/k/v are full per
    # device, local Q heads scatter into the full layout for attention
    # and slice back out (parallel/sharding.tp_kv_replicated).
    slot_ids: Optional[jax.Array] = None,  # [B] staging slots (dual layout)
    logits_all: bool = False,  # True: [B, S, V] logits (speculative verify)
    flash_decode: Optional[bool] = None,  # in-kernel page-gather decode
    # attention (dual layout, S=1). None = WF_PAGED_FLASH_DECODE env gate.
    head_fn=None,  # Optional[(hidden [B,H], params) -> anything]; replaces
    # compute_logits (single-device only). Used by the engine's exact-
    # greedy head and for hidden-state extraction.
) -> Tuple[jax.Array, PagedKV]:
    """Run S new tokens per slot against the paged cache.

    Returns (last-real-token logits [B, V] float32, updated pools).
    Covers batched decode (S=1, new_lens=1) and chunked prefill
    (B=1..n, S=bucket, new_lens=true chunk length).

    With ``tp_axis`` set this is the PER-DEVICE program of a shard_map
    tensor-parallel engine (parallel/sharding.py layout): q/k/v/gate/up
    column-sharded, o/down row-sharded (f32 psum over ICI), tied embedding
    vocab-sharded, KV pools sharded on the kv-head lane axis.
    """
    lf = linear_fn or default_linear
    B, S = tokens.shape
    ps = pools.page_size
    kv_dtype = pools.kv_dtype_name
    dtype = cfg.dtype

    embed = params["embed"]
    if tp_axis is None:
        hidden = embed[tokens].astype(dtype)
    else:
        v_local = embed.shape[0]
        v_start = jax.lax.axis_index(tp_axis) * v_local
        local = tokens - v_start
        ok = (local >= 0) & (local < v_local)
        rows_e = embed[jnp.clip(local, 0, v_local - 1)].astype(dtype)
        hidden = jax.lax.psum(jnp.where(ok[..., None], rows_e, 0), tp_axis)

    positions = seq_lens[:, None] + jnp.arange(S)[None, :]  # [B,S]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, dtype)

    dual = pools.dual
    if attention_fn is not None:
        attn_impl = attention_fn
    else:
        hist_tokens = page_table.shape[1] * ps
        use_flash = (
            kv_write == "pallas"  # TPU + unquantized pools proxy
            and S >= 128
            and (hist_tokens + S) % 128 == 0
        )
        import os as _os

        want_flash_decode = (
            _os.environ.get("WF_PAGED_FLASH_DECODE", "0") == "1"
            if flash_decode is None
            else flash_decode
        )
        use_flash_decode = (
            kv_write == "pallas"  # TPU + unquantized pools proxy
            and S == 1
            and dual
            and want_flash_decode
        )
        if dual:
            attn_impl = (
                _paged_attention_dual_flash_decode
                if use_flash_decode
                else _paged_attention_dual_flash
                if use_flash
                else _paged_attention_dual
            )
        else:
            attn_impl = _paged_attention_flash if use_flash else _paged_attention_jnp

    if not dual:
        # page/offset for each new token; padding beyond the allocated range
        # must land in the trash page (page_table stores 0 there already).
        page_slot = positions // ps  # [B,S] logical page index
        in_range = page_slot < page_table.shape[1]
        page_ids = jnp.where(
            in_range,
            jnp.take_along_axis(
                page_table, jnp.clip(page_slot, 0, page_table.shape[1] - 1), axis=1
            ),
            0,
        )
        offsets = positions % ps

    L = jax.tree.leaves(params["layers"])[0].shape[0]
    P = pools.kv.shape[0]
    if dual:
        # this batch's staging pages, sliced once for all layers
        if slot_ids is None:
            staging_b = pools.staging[:B]  # decode: slot b == batch row b
            staging_sb = (
                pools.staging_scale[:B] if pools.staging_scale is not None else None
            )
        else:
            staging_b = pools.staging[slot_ids]
            staging_sb = (
                pools.staging_scale[slot_ids]
                if pools.staging_scale is not None
                else None
            )
        hist_args = (pools.kv, staging_b)
    else:
        kv_rows = pools.kv.reshape((P * ps,) + pools.kv.shape[2:])
        scale_rows = (
            pools.scale.reshape((P * ps,) + pools.scale.shape[2:])
            if pools.scale is not None
            else None
        )
        # flat row index of every history slot: [B, MP*ps]
        token_rows = (
            page_table[:, :, None] * ps + jnp.arange(ps)[None, None, :]
        ).reshape(B, -1)

    # stacked linear_fns read the whole [L, K4, N] weight stack with a
    # layer index (no per-layer slice copy before the Pallas call — see
    # models/bitnet.forward)
    stacked = getattr(lf, "stacked", False)
    stack = params["layers"]
    fused = "qkv_qw" in stack  # models.bitnet.fuse_projections applied
    if fused and not stacked:
        raise ValueError("fused projections require a stacked linear_fn")
    # prologue-fused path (see models.bitnet.forward): norm + act-quant
    # (+ MLP activation) inside the stacked Pallas kernel
    prologue = (
        fused
        and "gateup_qw" in stack
        and getattr(lf, "prologue", False)
        and tp_axis is None
    )
    if prologue:
        nL = jax.tree.leaves(stack)[0].shape[0]

        def _rows(a, n):
            return jnp.broadcast_to(
                a.astype(jnp.float32).reshape(nL, 1, -1)[:, :, :n], (nL, 8, n)
            )

        def plf(x, name, l, norm_name=None, act="none"):
            qw = stack[name + "_qw"]
            sw = stack[name + "_scale"]
            if sw.ndim == 1:
                sw = _rows(sw[:, None] * jnp.ones((1, qw.shape[-1])), qw.shape[-1])
            nw = None
            if norm_name is not None:
                w = stack[norm_name]
                nw = _rows(w, w.shape[-1])
            return lf(x, qw, sw, l, nw, act=act,
                      norm=norm_name is not None, eps=cfg.rms_norm_eps)

    def wlin(x, lp, l, name, **kw):
        if stacked:
            return lf(x, stack[name + "_qw"], stack[name + "_scale"], l, **kw)
        return lf(x, lp[name + "_qw"], lp[name + "_scale"], **kw)

    def layer_step(h, xs):
        lp, l = xs
        if prologue:
            qkv = plf(h, "qkv", l, "input_ln")
            kvd = cfg.num_kv_heads * cfg.head_dim
            qd = qkv.shape[-1] - 2 * kvd
            q = qkv[..., :qd].reshape(B, S, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(B, S, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(B, S, -1, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            if dual:
                attn = attn_impl(
                    q, k, v, hist_args[0], hist_args[1], l, page_table,
                    seq_lens, new_lens, cfg,
                    **(
                        dict(main_scale=pools.scale, staging_scale_b=staging_sb)
                        if pools.scale is not None
                        else {}
                    ),
                )
            else:
                attn = attn_impl(
                    q, k, v, kv_rows, scale_rows, l, token_rows, positions,
                    seq_lens, new_lens, cfg,
                )
            attn = attn.reshape(B, S, -1)
            h = h + plf(attn, "o", l, "attn_sub" if cfg.sub_norms else None)
            # the two-stage mega MLP wins at batch-1 (one launch) but
            # loses at serving batch (its serialized grid blocks the
            # overlap two separate kernels get): gate by row count
            mega = getattr(lf, "mlp_mega", None) if B * S <= 8 else None
            mlp_act = "silu" if cfg.mlp_act == "silu" else "relu2"
            if mega is not None:
                inter = stack["down_qw"].shape[1] * 4
                h = mega(
                    h, stack["gateup_qw"], stack["down_qw"], l,
                    stack["gateup_scale"],
                    _rows(stack["down_scale"][:, None]
                          * jnp.ones((1, stack["down_qw"].shape[-1])),
                          stack["down_qw"].shape[-1]),
                    _rows(stack["post_ln"], stack["post_ln"].shape[-1]),
                    _rows(stack["ffn_sub"], inter) if cfg.sub_norms else None,
                    eps=cfg.rms_norm_eps, act=mlp_act, norm2=cfg.sub_norms,
                )
            else:
                gu = plf(h, "gateup", l, "post_ln")
                h = h + plf(
                    gu, "down", l, "ffn_sub" if cfg.sub_norms else None,
                    act=mlp_act,
                )
            return h, (k, v)
        normed = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)

        if fused:
            qkv = wlin(normed, lp, l, "qkv")
            kvd = cfg.num_kv_heads * cfg.head_dim
            qd = qkv.shape[-1] - 2 * kvd
            q = qkv[..., :qd].reshape(B, S, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(B, S, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(B, S, -1, cfg.head_dim)
        else:
            q = wlin(normed, lp, l, "q").reshape(B, S, -1, cfg.head_dim)
            k = wlin(normed, lp, l, "k").reshape(B, S, -1, cfg.head_dim)
            v = wlin(normed, lp, l, "v").reshape(B, S, -1, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)

        if tp_axis is not None and tp_kv_replicated:
            # KV replicated, Q head-sharded (flagship 20q/5kv on tp=2/4):
            # scatter local Q heads into the full [NH] layout so the
            # grouped GQA mapping stays correct, slice local heads back
            # out afterwards (see models/bitnet.forward).
            nh_local = q.shape[2]
            off = jax.lax.axis_index(tp_axis) * nh_local
            qf = jnp.zeros((B, S, cfg.num_heads, cfg.head_dim), q.dtype)
            q = jax.lax.dynamic_update_slice(qf, q, (0, 0, off, 0))
        else:
            nh_local = off = None
        if dual:
            attn = attn_impl(
                q, k, v, hist_args[0], hist_args[1], l, page_table,
                seq_lens, new_lens, cfg,
                **(
                    dict(main_scale=pools.scale, staging_scale_b=staging_sb)
                    if pools.scale is not None
                    else {}
                ),
            )
        else:
            attn = attn_impl(
                q, k, v, kv_rows, scale_rows, l, token_rows, positions,
                seq_lens, new_lens, cfg,
            )
        if off is not None:
            attn = jax.lax.dynamic_slice(
                attn.reshape(B, S, cfg.num_heads, cfg.head_dim),
                (0, 0, off, 0), (B, S, nh_local, cfg.head_dim),
            )
        attn = attn.reshape(B, S, -1)
        if tp_axis is None:
            attn = rms_norm(attn, lp["attn_sub"], cfg.rms_norm_eps)
            h = h + wlin(attn, lp, l, "o")
        else:
            # sub-norm over the FULL q_dim: psum the mean-square
            af = attn.astype(jnp.float32)
            ms = jax.lax.psum(jnp.sum(af * af, axis=-1, keepdims=True), tp_axis)
            var = ms / cfg.q_dim
            attn = (af * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(attn.dtype) * lp["attn_sub"]
            h = h + jax.lax.psum(
                wlin(attn, lp, l, "o", quant_axis=tp_axis,
                     out_dtype=jnp.float32),
                tp_axis,
            ).astype(dtype)

        normed = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        if cfg.num_experts > 0:
            from ..models.moe import moe_ffn

            experts = {
                f"{n}_{t}": lp[f"moe_{n}_{t}"]
                for n in ("gate", "up", "down") for t in ("qw", "scale")
            }
            # the TP mesh's model axis doubles as the EP axis: local
            # expert shard + psum combine (models/moe.py ep_axis path)
            y, _aux = moe_ffn(
                normed.reshape(B * S, -1), experts, lp["ffn_sub"], lp["router"],
                top_k=cfg.num_experts_per_tok, eps=cfg.rms_norm_eps,
                ep_axis=tp_axis,
            )
            h = h + y.reshape(B, S, -1).astype(dtype)
            return h, (k, v)
        if fused and "gateup_qw" in stack:
            gu = wlin(normed, lp, l, "gateup")
            inter = gu.shape[-1] // 2
            gate, up = gu[..., :inter], gu[..., inter:]
        else:
            gate = wlin(normed, lp, l, "gate")
            up = wlin(normed, lp, l, "up")
        if cfg.mlp_act == "silu":
            act = jax.nn.silu(gate) * up
        else:
            act = jnp.square(jax.nn.relu(gate)) * up
        if not cfg.sub_norms:
            pass
        elif tp_axis is None:
            act = rms_norm(act, lp["ffn_sub"], cfg.rms_norm_eps)
        else:
            af = act.astype(jnp.float32)
            ms = jax.lax.psum(jnp.sum(af * af, axis=-1, keepdims=True), tp_axis)
            var = ms / cfg.intermediate_size
            act = (af * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(act.dtype) * lp["ffn_sub"]
        if tp_axis is None:
            h = h + wlin(act, lp, l, "down")
        else:
            h = h + jax.lax.psum(
                wlin(act, lp, l, "down", quant_axis=tp_axis,
                     out_dtype=jnp.float32),
                tp_axis,
            ).astype(dtype)
        return h, (k, v)

    xs = (params["layers"], jnp.arange(L))
    hidden, (k_new, v_new) = jax.lax.scan(layer_step, hidden, xs)

    # Pack each token's full contribution as one row [2*Lp, KV*D]
    # (k-layers then v-layers; quantization per [D] head-vector first).
    two_lp = pools.kv.shape[1] if dual else pools.kv.shape[2]
    lp_pad = two_lp // 2 - L
    KV = k_new.shape[-2]  # LOCAL kv heads under TP
    kv_new = jnp.stack([k_new, v_new], axis=0)  # [2, L, B, S, KV, D]
    q_kv, s_kv = quantize_kv(kv_new, kv_dtype)  # scales [2,L,B,S,KV,1]|None
    q_kv = jnp.pad(q_kv, ((0, 0), (0, lp_pad)) + ((0, 0),) * 4)
    vals = q_kv.transpose(2, 3, 0, 1, 4, 5).reshape(
        B, S, two_lp, KV * cfg.head_dim
    )

    if dual:
        svals = None
        if s_kv is not None:
            s_pad = jnp.pad(s_kv, ((0, 0), (0, lp_pad)) + ((0, 0),) * 4)
            svals = s_pad.transpose(2, 3, 0, 1, 4, 5).reshape(B, S, two_lp, KV)
        new_pools = _dual_write(
            pools, vals, page_table, seq_lens, new_lens, slot_ids,
            kv_write == "pallas" and s_kv is None, svals=svals,
        )
    elif kv_write == "pallas" and s_kv is None:
        from ..ops.kv_update_pallas import kv_write_pallas

        out = kv_write_pallas(
            pools.kv,
            vals.reshape(B * S, two_lp, KV * cfg.head_dim),
            page_ids.reshape(-1).astype(jnp.int32),
            offsets.reshape(-1).astype(jnp.int32),
        )
        new_pools = PagedKV(out, None)
    else:
        nkv = pools.kv.at[page_ids, offsets].set(vals)
        nscale = pools.scale
        if nscale is not None:
            s_pad = jnp.pad(s_kv, ((0, 0), (0, lp_pad)) + ((0, 0),) * 4)
            s_vals = s_pad.transpose(2, 3, 0, 1, 4, 5).reshape(B, S, two_lp, KV)
            nscale = nscale.at[page_ids, offsets].set(s_vals)
        new_pools = PagedKV(nkv, nscale)

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if not logits_all:
        # last REAL token per slot
        last_idx = jnp.clip(new_lens - 1, 0, S - 1)
        hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]

    if head_fn is not None:
        # under TP `hidden` is already replicated across the model axis
        # (the row-parallel psum ran inside the last layer), so a
        # replicated head_fn — e.g. the engine's identity for the exact
        # head — sees the same values on every shard
        return head_fn(hidden, params), new_pools

    from ..models.bitnet import compute_logits

    logits = compute_logits(hidden, params, cfg)
    if tp_axis is not None:
        # head is vocab-sharded: gather the local [., V/tp] logits
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1, tiled=True)
    return logits, new_pools
