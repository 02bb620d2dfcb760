"""Fused ternary dequant-matmul Pallas kernels (TPU).

The TPU analog of the reference's AVX512 fused dequant+GEMV
(reference legacy/src/native/bitnet_kernel.cpp:178-267 and the sgl-kernel
`bitnet_gemv_cpu`/`bitnet_gemm_cpu` ops): ternary weights stay 2-bit
packed in HBM and are expanded in-register, so the kernel streams
~0.25 byte/weight — at batch 1 this is HBM-bandwidth bound and the packed
format is exactly what makes it fast.

Thanks to the wf-tpu plane-major layout (see ops/ternary.py) the unpack is
4 shift-mask ops and 4 MXU dots with NO cross-lane interleave:

    acc = sum_j  x[:, j*K4:(j+1)*K4] @ (((qw >> 2j) & 3) - 1)

Integer math is exact: every kernel here must agree bit-for-bit with
`ternary_matmul_reference` (enforced in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ternary import quantize_activations


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


_PACKED_UNPACK = os.environ.get("WF_PACKED_UNPACK", "1") == "1"


def _planes_dot(x, w_bytes, dot_dtype):
    """``sum_j x[:, j*K4:(j+1)*K4] @ (((w >> 2j) & 3) - 1)`` as ONE MXU
    dot: the four unpacked planes are stacked along K, which is exactly
    how the plane-major packing slices x. Integer-exact vs the
    per-plane loop (int32 adds commute); 4x fewer MXU ops — at batch-1
    decode the fixed cost per (tiny) MXU op dominates the arithmetic.

    Accepts the RAW uint8 bytes. Default unpack is packed-SIMD: bitcast
    the bytes to uint32 (4 bytes/lane), shift+mask all 4 at once, bitcast
    back — ~8x fewer VPU lane-ops than upcasting every byte to its own
    int32 lane, which made the GEMV unpack-compute-bound at ~25% of HBM
    bandwidth (scripts/roofline_gemv.py). The per-byte shift+mask is
    correct under ANY self-consistent bitcast byte<->sublane order, and
    the encoded {0,1,2} dot is fixed up with an exact row-sum-of-x
    correction (same algebra the reference's kernel uses,
    reference scripts/direct_inference_full.py:186-208)."""
    k4 = w_bytes.shape[0]
    if (
        _PACKED_UNPACK
        and dot_dtype == jnp.int8
        and w_bytes.dtype == jnp.uint8
        and k4 % 4 == 0
    ):
        w32 = pltpu.bitcast(w_bytes, jnp.uint32)  # [K4/4, N] 4 bytes/lane
        m = jnp.uint32(0x03030303)
        enc = [
            pltpu.bitcast((w32 >> jnp.uint32(2 * j)) & m, jnp.uint8)
            for j in range(4)
        ]  # each [K4, N], encoded 0..3
        w_full = jnp.concatenate(enc, axis=0).astype(jnp.int8)
        xs = x[:, : 4 * k4].astype(jnp.int8)
        acc = jax.lax.dot_general(
            xs, w_full,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        corr = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
        return acc - corr
    w_i32 = w_bytes.astype(jnp.int32)
    planes = [
        (((w_i32 >> (2 * j)) & 3) - 1).astype(dot_dtype) for j in range(4)
    ]
    w_full = jnp.concatenate(planes, axis=0)  # [4*K4, N]
    return jax.lax.dot_general(
        x[:, : 4 * k4].astype(dot_dtype),
        w_full,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if dot_dtype == jnp.int8 else jnp.float32,
    ).astype(jnp.int32)


def _matmul_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, *, dot_dtype):
    """x [TB,K] int8, w [K4,TN] uint8, sx [TB,1] f32, sw [1,1] f32 ->
    o [TB,TN] out_dtype."""
    k4 = w_ref.shape[0]
    w_bytes = w_ref[:]
    acc = _planes_dot(x_ref, w_bytes, dot_dtype)
    inv = 1.0 / (sx_ref[:] * sw_ref[0, 0])
    o_ref[:] = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)


def _matmul_int_kernel(x_ref, w_ref, o_ref, *, dot_dtype):
    """Exact-integer variant (no rescale): o [TB,TN] int32."""
    k4 = w_ref.shape[0]
    w_bytes = w_ref[:]
    acc = _planes_dot(x_ref, w_bytes, dot_dtype)
    o_ref[:] = acc


def _pick_tiles(b: int, k: int, n: int):
    """Block sizes: favor streaming the full K per tile (weights visited
    once), modest N tiles for VMEM, B padded to the int8 sublane tile.
    WF_PALLAS_TN overrides the N tile for tuning."""
    import os

    tb = min(_round_up(b, 32), 256)
    want = int(os.environ.get("WF_PALLAS_TN", "256"))
    tn = n
    for cand in (want, 512, 256, 128):
        if n % cand == 0:
            tn = cand
            break
    return tb, tn


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "dot_dtype", "interpret")
)
def ternary_matmul_pallas(
    x_q: jax.Array,  # [..., K] int8
    qweight: jax.Array,  # [K//4, N] uint8
    act_scale: jax.Array | None = None,  # [..., 1] f32
    weight_scale: jax.Array | None = None,  # scalar f32
    *,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    """Fused packed-ternary matmul.

    With scales: returns ``(x_q @ W) / (act_scale * weight_scale)`` in
    ``out_dtype``. Without: exact int32 accumulator.
    """
    k4, n = qweight.shape
    k = 4 * k4
    lead = x_q.shape[:-1]
    x2 = x_q.reshape(-1, k)
    b = x2.shape[0]
    tb, tn = _pick_tiles(b, k, n)
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))

    grid = (b_pad // tb, n // tn)
    x_spec = pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k4, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tb, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b_pad * k * n,
        bytes_accessed=b_pad * k + k4 * n + b_pad * n * 4,
        transcendentals=0,
    )

    if act_scale is None:
        out = pl.pallas_call(
            functools.partial(_matmul_int_kernel, dot_dtype=dot_dtype),
            grid=grid,
            in_specs=[x_spec, w_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.int32),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, qweight)
        return out[:b].reshape(*lead, n)

    sx = jnp.broadcast_to(act_scale.reshape(-1, 1).astype(jnp.float32), (b, 1))
    if b_pad != b:
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    sw = jnp.asarray(weight_scale, jnp.float32).reshape(1, 1)
    sx_spec = pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    sw_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, dot_dtype=dot_dtype),
        grid=grid,
        in_specs=[x_spec, w_spec, sx_spec, sw_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x2, qweight, sx, sw)
    return out[:b].reshape(*lead, n)


def _matmul_kernel_stacked(l_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref, *, dot_dtype):
    """Like _matmul_kernel but w_ref is a [1, K4, TN] block of the
    stacked [L, K4, N] weights, selected by the prefetched layer index
    in the BlockSpec index map (so the layer's weights are DMA'd straight
    from the stacked HBM array — no per-layer slice copy)."""
    del l_ref
    k4 = w_ref.shape[1]
    w_bytes = w_ref[0]
    acc = _planes_dot(x_ref, w_bytes, dot_dtype)
    inv = 1.0 / (sx_ref[:] * sw_ref[0, 0])
    o_ref[:] = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)


def _matmul_kernel_stacked_rowscale(
    l_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref, *, dot_dtype
):
    """Stacked kernel with PER-COLUMN weight scales (sw block [1, 8, TN]
    from a stacked [L, 8, N] row, 8 broadcast sublanes for tiling) — lets
    fused projections (qkv / gate+up) carry each segment's own
    per-tensor scale in one kernel call."""
    del l_ref
    k4 = w_ref.shape[1]
    w_bytes = w_ref[0]
    acc = _planes_dot(x_ref, w_bytes, dot_dtype)
    inv = 1.0 / (sx_ref[:] * sw_ref[0, 0:1, :])  # [TB,1] * [1,TN]
    o_ref[:] = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "dot_dtype", "interpret")
)
def ternary_matmul_pallas_stacked(
    x_q: jax.Array,  # [..., K] int8
    qweight: jax.Array,  # [L, K//4, N] uint8 (stacked layers)
    layer,  # int32 scalar — which layer's weights to use
    act_scale: jax.Array,  # [..., 1] f32
    weight_scale: jax.Array,  # [L] f32 scalars OR [L, N] f32 column rows
    *,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    """Fused packed-ternary matmul against STACKED per-layer weights.

    Inside a `lax.scan` over layers, passing the scan-sliced weight to a
    Pallas call forces XLA to materialize a per-layer copy (a custom
    call cannot fuse a dynamic-slice) — ~17 MB x L x token of pure copy
    traffic for BitNet-2B. Here the whole stacked array is the kernel
    operand and the layer index is a prefetched scalar used by the
    BlockSpec index map, so blocks stream straight from the right layer.
    """
    L, k4, n = qweight.shape
    k = 4 * k4
    lead = x_q.shape[:-1]
    x2 = x_q.reshape(-1, k)
    b = x2.shape[0]
    tb, tn = _pick_tiles(b, k, n)
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))

    sx = jnp.broadcast_to(act_scale.reshape(-1, 1).astype(jnp.float32), (b, 1))
    if b_pad != b:
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    if weight_scale.ndim == 3:  # [L, 8, N] per-column scales (fused projections)
        sw = weight_scale.astype(jnp.float32)
        sw_spec = pl.BlockSpec((1, 8, tn), lambda i, j, l: (l[0], 0, j))
        kernel = _matmul_kernel_stacked_rowscale
    else:
        sw = weight_scale.astype(jnp.float32)[lidx[0]].reshape(1, 1)
        sw_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        kernel = _matmul_kernel_stacked

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb, n // tn),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k4, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((tb, 1), lambda i, j, l: (i, 0)),
            sw_spec,
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(kernel, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n,
            bytes_accessed=b_pad * k + k4 * n + b_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, x2, qweight, sx, sw)
    return out[:b].reshape(*lead, n)


def _matmul_kernel_stacked_fused(
    l_ref, h_ref, w_ref, nw_ref, sw_ref, o_ref, xq_ref, sx_ref,
    *, dot_dtype, eps, act, norm
):
    """Stacked kernel with a fused PROLOGUE: (optional MLP activation) →
    (optional RMS norm) → per-token int8 activation quant → 4-plane
    packed-ternary dot → per-column rescale. Folding the prologue in
    removes ~9 XLA fusion launches per layer at batch-1 decode, where
    per-launch fixed cost rivals the arithmetic.

    h [TB, KIN] raw bf16 input (KIN = 2K for act modes, K otherwise);
    nw [1, 8, K] norm-weight row (8 broadcast sublanes); sw [1, 8, TN]
    per-column scale row. Numerics mirror ops.norms.rms_norm (f32 var,
    bf16 weight multiply) and ops.ternary.quantize_activations (f32,
    scale = 127/clamp(absmax, 1e-5)).
    """
    del l_ref
    k4 = w_ref.shape[1]

    # the prologue depends only on the batch-row block: run it ONCE per
    # i (at the first N tile) and stash xq/sx in VMEM scratch — grid
    # order is (i outer, j inner), so the scratch is valid for all j
    @pl.when(pl.program_id(1) == 0)
    def _prologue():
        h = h_ref[:]
        if act == "relu2":
            half = h.shape[1] // 2
            g, u = h[:, :half], h[:, half:]
            x = jnp.square(jnp.maximum(g, jnp.zeros_like(g))) * u
        elif act == "silu":
            half = h.shape[1] // 2
            g, u = h[:, :half], h[:, half:]
            x = _silu_mul(g, u)
        else:
            x = h
        if norm:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(h.dtype) * nw_ref[0, 0:1, :].astype(h.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax  # [TB, 1] f32
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    xq = xq_ref[:]
    sx = sx_ref[:]
    w_bytes = w_ref[0]
    acc = _planes_dot(xq, w_bytes, dot_dtype)
    inv = 1.0 / (sx * sw_ref[0, 0:1, :])
    o_ref[:] = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "act", "norm"),
)
def ternary_matmul_stacked_fused(
    h: jax.Array,  # [..., KIN] bf16 raw input
    qweight: jax.Array,  # [L, K//4, N] uint8
    layer,
    weight_scale_rows: jax.Array,  # [L, 8, N] f32 per-column scales
    norm_w: jax.Array | None = None,  # [L, 8, K] norm weight rows
    *,
    eps: float = 1e-5,
    act: str = "none",  # none | relu2 | silu (input is [gate ++ up])
    norm: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    L, k4, n = qweight.shape
    k = 4 * k4
    kin = 2 * k if act in ("relu2", "silu") else k
    lead = h.shape[:-1]
    h2 = h.reshape(-1, kin)
    b = h2.shape[0]
    tb, tn = _pick_tiles(b, k, n)
    # VMEM budget: the raw-input block is double-buffered ([tb, kin] bf16
    # x2) next to the int8 scratch and weight/out blocks; large prefill
    # rows at kin=13824 blow the 16 MB scoped limit at tb=256
    while tb > 32 and (
        tb * kin * 2 * 2 + tb * k + 2 * (k // 4) * tn + tb * tn * 4
        > 10 * 1024 * 1024
    ):
        tb //= 2
    b_pad = _round_up(b, tb)
    if b_pad != b:
        h2 = jnp.pad(h2, ((0, b_pad - b), (0, 0)))
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    if norm_w is None:
        norm_w = jnp.ones((L, 8, k), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb, n // tn),
        in_specs=[
            pl.BlockSpec((tb, kin), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k4, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 8, k), lambda i, j, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda i, j, l: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _matmul_kernel_stacked_fused,
            dot_dtype=dot_dtype, eps=eps, act=act, norm=norm,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n,
            bytes_accessed=b_pad * kin * 2 + k4 * n + b_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, h2, qweight, norm_w.astype(jnp.float32),
      weight_scale_rows.astype(jnp.float32))
    return out[:b].reshape(*lead, n)


def _layer_megakernel(
    s_ref, h_ref, hres_ref, qw_ref, ow_ref, gw_ref, dw_ref,
    nw1_ref, subw_ref, nw2_ref, ffnw_ref,
    sq_ref, so_ref, sg_ref, sd_ref, cos_ref, sin_ref, ck_ref, cv_ref,
    o_ref, ck_out, cv_out,
    qkv_s, qh_s, h2_s, gu_s, xq_ref, sx_ref, xq2_ref, sx2_ref,
    xq3_ref, sx3_ref, xq4_ref, sx4_ref,
    *, dot_dtype, eps, act, norm2, nq, no, ngu, nd,
    tn_q, tn_o, tn_gu, tn_d, q_dim, n_kv, n_heads, head_dim, inter
):
    """An ENTIRE decode layer in one pallas_call (batch-1):
    norm->quant->qkv->RoPE->cache write(in-place)->GQA attention->
    sub-norm->quant->o(+residual)->norm->quant->gateup->activation->
    sub-norm->quant->down(+residual). Stages share one sequential grid;
    VMEM scratch carries the intermediates. One ~10us kernel launch per
    layer instead of two (plus everything the fused stages remove)."""
    g = pl.program_id(1)
    pos = s_ref[1]
    k4 = qw_ref.shape[1]
    q4 = ow_ref.shape[1]
    i4 = dw_ref.shape[1]
    D = head_dim
    G = n_heads // n_kv
    kvd = n_kv * D
    s_mlp = nq + no  # first gateup tile / MLP prologue
    s_down = s_mlp + ngu  # first down tile / activation prologue

    @pl.when(g == 0)
    def _prologue_qkv():
        x = h_ref[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw1_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g < nq)
    def _qkv_tile():
        acc = _planes_dot(xq_ref[:], qw_ref[0], dot_dtype)
        inv = 1.0 / (sx_ref[:] * sq_ref[0, 0:1, :])
        qkv_s[:, pl.ds(g * tn_q, tn_q)] = (
            acc.astype(jnp.float32) * inv
        ).astype(qkv_s.dtype)

    @pl.when(g == nq)
    def _attention():
        qkv = qkv_s[:]
        T = ck_ref.shape[2]
        cos = cos_ref[0:1, :].astype(qkv.dtype)
        sin = sin_ref[0:1, :].astype(qkv.dtype)
        scale = 1.0 / float(np.sqrt(D))
        ck_out[:] = ck_ref[:]
        cv_out[:] = cv_ref[:]
        for kvh in range(n_kv):
            k_h = qkv[:, q_dim + kvh * D : q_dim + (kvh + 1) * D]
            k_roped = k_h * cos + _rotate_half_lanes(k_h) * sin
            ck_out[0, 0, pl.ds(pos, 1), kvh, :] = k_roped[0:1, :]
            v_h = qkv[:, q_dim + kvd + kvh * D : q_dim + kvd + (kvh + 1) * D]
            cv_out[0, 0, pl.ds(pos, 1), kvh, :] = v_h[0:1, :]
        for kvh in range(n_kv):
            for gg in range(G):
                off = (kvh * G + gg) * D
                qh_s[kvh * 8 + gg : kvh * 8 + gg + 1, :] = qkv[0:1, off : off + D]
        qall = qh_s[:]
        q_roped = qall * cos + _rotate_half_lanes(qall) * sin
        key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        mask = key_idx <= pos
        for kvh in range(n_kv):
            k_all = ck_out[0, 0, :, kvh, :]
            v_all = cv_out[0, 0, :, kvh, :]
            scores = jax.lax.dot_general(
                q_roped[kvh * 8 : (kvh + 1) * 8, :], k_all,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            scores = jnp.where(mask, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_all.dtype)
            outv = jax.lax.dot_general(
                probs, v_all,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype)
            for gg in range(G):
                off = (kvh * G + gg) * D
                qkv_s[0:1, pl.ds(off, D)] = outv[gg : gg + 1, :]
        x = qkv_s[:, :q_dim]
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * subw_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx2_ref[:] = sx
        xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when((g >= nq) & (g < s_mlp))
    def _o_tile():
        jo = g - nq
        acc = _planes_dot(xq2_ref[:], ow_ref[0], dot_dtype)
        inv = 1.0 / (sx2_ref[:] * so_ref[0, 0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(h2_s.dtype)
        h2_s[:, pl.ds(jo * tn_o, tn_o)] = hres_ref[:] + d

    @pl.when(g == s_mlp)
    def _prologue_mlp():
        x = h2_s[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw2_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx3_ref[:] = sx
        xq3_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when((g >= s_mlp) & (g < s_down))
    def _gateup_tile():
        jg = g - s_mlp
        acc = _planes_dot(xq3_ref[:], gw_ref[0], dot_dtype)
        inv = 1.0 / (sx3_ref[:] * sg_ref[0, 0:1, :])
        gu_s[:, pl.ds(jg * tn_gu, tn_gu)] = (
            acc.astype(jnp.float32) * inv
        ).astype(gu_s.dtype)

    @pl.when(g == s_down)
    def _prologue_down():
        gu = gu_s[:]
        gate, up = gu[:, :inter], gu[:, inter:]
        if act == "silu":
            x = _silu_mul(gate, up)
        else:
            x = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * ffnw_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx4_ref[:] = sx
        xq4_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g >= s_down)
    def _down_tile():
        jd = g - s_down
        acc = _planes_dot(xq4_ref[:], dw_ref[0], dot_dtype)
        inv = 1.0 / (sx4_ref[:] * sd_ref[0, 0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:] = h2_s[:, pl.ds(jd * tn_d, tn_d)] + d


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "act",
                     "norm2", "q_dim", "n_kv", "n_heads", "head_dim"),
)
def layer_block_megakernel(
    h: jax.Array,  # [1, H] bf16
    ck: jax.Array,  # [L, 1, T, KV, D] (updated in place)
    cv: jax.Array,
    qkv_qw: jax.Array,  # [L, H//4, Nq]
    o_qw: jax.Array,  # [L, Q//4, H]
    gateup_qw: jax.Array,  # [L, H//4, 2I]
    down_qw: jax.Array,  # [L, I//4, H]
    layer,
    pos,
    qkv_scale_rows: jax.Array,  # [L, 8, Nq]
    o_scale_rows: jax.Array,  # [L, 8, H]
    gateup_scale_rows: jax.Array,  # [L, 8, 2I]
    down_scale_rows: jax.Array,  # [L, 8, H]
    input_ln_rows: jax.Array,  # [L, 8, H]
    attn_sub_rows: jax.Array | None,  # [L, 8, Q]
    post_ln_rows: jax.Array,  # [L, 8, H]
    ffn_sub_rows: jax.Array | None,  # [L, 8, I]
    cos_row: jax.Array,  # [8, D]
    sin_row: jax.Array,
    *,
    q_dim: int,
    n_kv: int,
    n_heads: int,
    head_dim: int,
    eps: float = 1e-5,
    act: str = "relu2",
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
):
    """One pallas_call per decode LAYER. Returns (h', ck, cv); caches
    aliased in place — thread them as a scan carry."""
    L, k4, n_q = qkv_qw.shape
    _, q4, n_h = o_qw.shape
    _, _, n_gu = gateup_qw.shape
    _, i4, _ = down_qw.shape
    k = 4 * k4
    inter = 4 * i4
    b = h.shape[0]
    assert b == 1, "layer megakernel is specialized for batch-1 decode"
    tb = 8
    h2 = jnp.pad(h.reshape(b, k), ((0, tb - b), (0, 0)))

    tn_q = _pick_tile_n(n_q)
    tn_o = _pick_tile_n(n_h)
    tn_gu = _pick_tile_n(n_gu)
    tn_d = _pick_tile_n(n_h)
    # VMEM budget: 4 double-buffered weight streams + 2x2 cache blocks
    T = ck.shape[2]
    cache_bytes = 4 * T * n_kv * head_dim * ck.dtype.itemsize

    def _wbytes():
        return 2 * (k4 * tn_q + q4 * tn_o + k4 * tn_gu + i4 * tn_d)

    while cache_bytes + _wbytes() > 11 * 1024 * 1024:
        # shrink the largest weight tile to the next candidate down
        sizes = {"q": k4 * tn_q, "o": q4 * tn_o, "g": k4 * tn_gu, "d": i4 * tn_d}
        big = max(sizes, key=sizes.get)
        cur = {"q": tn_q, "o": tn_o, "g": tn_gu, "d": tn_d}[big]
        if cur <= 128:
            break
        smaller = _pick_tile_n_below(
            {"q": n_q, "o": n_h, "g": n_gu, "d": n_h}[big], cur
        )
        if big == "q":
            tn_q = smaller
        elif big == "o":
            tn_o = smaller
        elif big == "g":
            tn_gu = smaller
        else:
            tn_d = smaller
    nq, no = n_q // tn_q, n_h // tn_o
    ngu, nd = n_gu // tn_gu, n_h // tn_d

    scalars = jnp.stack([
        jnp.asarray(layer, jnp.int32).reshape(()),
        jnp.asarray(pos, jnp.int32).reshape(()),
    ])
    if attn_sub_rows is None:
        attn_sub_rows = jnp.ones((L, 8, q_dim), jnp.float32)
    if ffn_sub_rows is None:
        ffn_sub_rows = jnp.ones((L, 8, inter), jnp.float32)

    s_mlp = nq + no
    s_down = s_mlp + ngu

    def _c(g, start, n):
        return jnp.clip(g - start, 0, n - 1)

    cache_spec = pl.BlockSpec(
        (1, 1, T, n_kv, head_dim), lambda i, g, s: (s[0], 0, 0, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, s_down + nd),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, g, s: (i, 0)),  # h
            pl.BlockSpec((tb, tn_o), lambda i, g, s: (i, _c(g, nq, no))),  # res
            pl.BlockSpec(
                (1, k4, tn_q), lambda i, g, s: (s[0], 0, jnp.minimum(g, nq - 1))
            ),
            pl.BlockSpec((1, q4, tn_o), lambda i, g, s: (s[0], 0, _c(g, nq, no))),
            pl.BlockSpec(
                (1, k4, tn_gu), lambda i, g, s: (s[0], 0, _c(g, s_mlp, ngu))
            ),
            pl.BlockSpec(
                (1, i4, tn_d), lambda i, g, s: (s[0], 0, _c(g, s_down, nd))
            ),
            pl.BlockSpec((1, 8, k), lambda i, g, s: (s[0], 0, 0)),  # input_ln
            pl.BlockSpec((1, 8, q_dim), lambda i, g, s: (s[0], 0, 0)),  # attn_sub
            pl.BlockSpec((1, 8, k), lambda i, g, s: (s[0], 0, 0)),  # post_ln
            pl.BlockSpec((1, 8, inter), lambda i, g, s: (s[0], 0, 0)),  # ffn_sub
            pl.BlockSpec(
                (1, 8, tn_q), lambda i, g, s: (s[0], 0, jnp.minimum(g, nq - 1))
            ),
            pl.BlockSpec((1, 8, tn_o), lambda i, g, s: (s[0], 0, _c(g, nq, no))),
            pl.BlockSpec(
                (1, 8, tn_gu), lambda i, g, s: (s[0], 0, _c(g, s_mlp, ngu))
            ),
            pl.BlockSpec(
                (1, 8, tn_d), lambda i, g, s: (s[0], 0, _c(g, s_down, nd))
            ),
            pl.BlockSpec((8, head_dim), lambda i, g, s: (0, 0)),  # cos
            pl.BlockSpec((8, head_dim), lambda i, g, s: (0, 0)),  # sin
            cache_spec,
            cache_spec,
        ],
        out_specs=[
            pl.BlockSpec((tb, tn_d), lambda i, g, s: (i, _c(g, s_down, nd))),
            cache_spec,
            cache_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, n_q), jnp.bfloat16),  # qkv / attn out
            pltpu.VMEM((n_kv * 8, head_dim), jnp.bfloat16),  # packed q heads
            pltpu.VMEM((tb, k), jnp.bfloat16),  # h after attention
            pltpu.VMEM((tb, n_gu), jnp.bfloat16),  # gu
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, q_dim), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, inter), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
    )
    out, ck2, cv2 = pl.pallas_call(
        functools.partial(
            _layer_megakernel,
            dot_dtype=dot_dtype, eps=eps, act=act, norm2=norm2,
            nq=nq, no=no, ngu=ngu, nd=nd,
            tn_q=tn_q, tn_o=tn_o, tn_gu=tn_gu, tn_d=tn_d,
            q_dim=q_dim, n_kv=n_kv, n_heads=n_heads, head_dim=head_dim,
            inter=inter,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tb, n_h), out_dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        input_output_aliases={17: 1, 18: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * tb * k * (n_q + n_gu) + 2 * tb * (q_dim + inter) * n_h
            + 4 * n_heads * head_dim * T,
            bytes_accessed=(k4 * n_q + q4 * n_h + k4 * n_gu + i4 * n_h)
            + 4 * T * n_kv * head_dim,
            transcendentals=n_heads * T,
        ),
        interpret=interpret,
    )(scalars, h2, h2, qkv_qw, o_qw, gateup_qw, down_qw,
      input_ln_rows.astype(jnp.float32), attn_sub_rows.astype(jnp.float32),
      post_ln_rows.astype(jnp.float32), ffn_sub_rows.astype(jnp.float32),
      qkv_scale_rows.astype(jnp.float32), o_scale_rows.astype(jnp.float32),
      gateup_scale_rows.astype(jnp.float32),
      down_scale_rows.astype(jnp.float32),
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32), ck, cv)
    return out[:b], ck2, cv2


def _pick_tile_n_below(n: int, cur: int) -> int:
    for cand in (1792, 1536, 1280, 1024, 768, 512, 384, 256, 128):
        if cand < cur and n % cand == 0:
            return cand
    return 128


def _mlp_megakernel(
    l_ref, h_ref, hres_ref, gw_ref, dw_ref, nw1_ref, nw2_ref, sw1_ref,
    sw2_ref, o_ref, gu_ref, xq_ref, sx_ref, xq2_ref, sx2_ref,
    *, dot_dtype, eps, act, norm2, ngu, nd, tn_gu, tn_d, inter
):
    """Whole MLP block in ONE pallas_call: norm+quant -> gateup dot ->
    activation -> (ffn sub-norm) -> quant -> down dot -> +residual.

    Grid is (row blocks, ngu + nd): stages share VMEM scratch that
    persists across grid steps (grid iterates g innermost, sequentially
    on TPU). Bit-exact with the composition of two
    `ternary_matmul_stacked_fused` calls + a bf16 residual add — the
    intermediate gu is rounded to bf16 in scratch exactly like the
    two-kernel path materializes it.
    """
    del l_ref
    g = pl.program_id(1)
    k4 = gw_ref.shape[1]  # K/4 (hidden)
    i4 = dw_ref.shape[1]  # inter/4

    # stage-A prologue (once per row block): rms_norm + int8 act quant
    @pl.when(g == 0)
    def _prologue_a():
        x = h_ref[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw1_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    # stage A: gateup tile g -> bf16 scratch
    @pl.when(g < ngu)
    def _gateup_tile():
        xq = xq_ref[:]
        w_bytes = gw_ref[0]
        acc = _planes_dot(xq, w_bytes, dot_dtype)
        inv = 1.0 / (sx_ref[:] * sw1_ref[0, 0:1, :])
        gu_ref[:, pl.ds(g * tn_gu, tn_gu)] = (
            acc.astype(jnp.float32) * inv
        ).astype(gu_ref.dtype)

    # stage-B prologue: activation over the full gu row + optional
    # sub-norm + int8 quant (mirrors the down kernel's fused prologue)
    @pl.when(g == ngu)
    def _prologue_b():
        gu = gu_ref[:]
        gate, up = gu[:, :inter], gu[:, inter:]
        if act == "silu":
            x = _silu_mul(gate, up)
        else:
            x = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw2_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx2_ref[:] = sx
        xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    # stage B: down tile (g - ngu) + residual
    @pl.when(g >= ngu)
    def _down_tile():
        xq = xq2_ref[:]
        w_bytes = dw_ref[0]
        acc = _planes_dot(xq, w_bytes, dot_dtype)
        inv = 1.0 / (sx2_ref[:] * sw2_ref[0, 0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:] = hres_ref[:] + d


def _silu_mul(gate, up):
    """silu(gate) * up with the sigmoid computed explicitly in f32 —
    jax.nn.silu on bf16 vectors trips a Mosaic verification bug
    (f32 scalar broadcast into a bf16 vector) on large tiles."""
    gf = gate.astype(jnp.float32)
    return ((gf * jax.lax.logistic(gf)).astype(gate.dtype)) * up


def _rotate_half_lanes(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)


def _attn_megakernel(
    s_ref, h_ref, hres_ref, qw_ref, ow_ref, nw_ref, subw_ref, sq_ref,
    so_ref, cos_ref, sin_ref, ck_ref, cv_ref,
    o_ref, ck_out, cv_out,
    qkv_s, qh_s, xq_ref, sx_ref, xq2_ref, sx2_ref,
    *, dot_dtype, eps, norm2, nq, no, tn_q, tn_o, q_dim, n_kv, n_heads,
    head_dim, ablate=""
):
    """Whole attention block in ONE pallas_call (batch-1 decode):
    norm+quant -> qkv dot -> RoPE -> in-place KV cache row write ->
    GQA attention over the full (static-T) cache -> attn sub-norm ->
    quant -> o dot -> +residual.

    The cache [L,1,T,KV,D] is an ALIASED operand selected by the
    prefetched layer index — the layer scan neither slices nor stacks
    it (the per-layer dynamic-slice/update-slice copies disappear along
    with ~8 XLA launches per layer).
    """
    g = pl.program_id(1)
    pos = s_ref[1]
    k4 = qw_ref.shape[1]
    q4 = ow_ref.shape[1]
    D = head_dim
    G = n_heads // n_kv
    kvd = n_kv * D

    @pl.when(g == 0)
    def _prologue():
        x = h_ref[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g < nq)
    def _qkv_tile():
        xq = xq_ref[:]
        w_bytes = qw_ref[0]
        acc = _planes_dot(xq, w_bytes, dot_dtype)
        inv = 1.0 / (sx_ref[:] * sq_ref[0, 0:1, :])
        qkv_s[:, pl.ds(g * tn_q, tn_q)] = (
            acc.astype(jnp.float32) * inv
        ).astype(qkv_s.dtype)

    @pl.when(g == nq)
    def _attention():
        qkv = qkv_s[:]  # [tb, Nq] bf16
        tb = qkv.shape[0]
        T = ck_ref.shape[2]
        cos = cos_ref[0:1, :].astype(qkv.dtype)  # [1, D]
        sin = sin_ref[0:1, :].astype(qkv.dtype)
        scale = 1.0 / float(np.sqrt(D))

        # the aliased out block is VMEM-pipelined: fill it with the input
        # cache content first, else the end-of-call DMA would clobber
        # history with uninitialized VMEM
        if ablate != "nocache":  # timing ladder: see _ATTN_ABLATE
            ck_out[:] = ck_ref[:]
            cv_out[:] = cv_ref[:]

            # write roped-k and v rows for the new token (row 0 is the
            # real batch row), in place
            for kvh in range(n_kv):
                k_h = qkv[:, q_dim + kvh * D : q_dim + (kvh + 1) * D]
                k_roped = k_h * cos + _rotate_half_lanes(k_h) * sin
                ck_out[0, 0, pl.ds(pos, 1), kvh, :] = k_roped[0:1, :]
                v_h = qkv[:, q_dim + kvd + kvh * D : q_dim + kvd + (kvh + 1) * D]
                cv_out[0, 0, pl.ds(pos, 1), kvh, :] = v_h[0:1, :]

        # pack the G query heads of each KV head into sublanes of one
        # [KV*8, D] scratch: attention then needs KV score-dots + KV
        # out-dots + ONE rope instead of per-head ops (the fixed cost
        # per tiny MXU/VPU op dominates at batch 1)
        for kvh in range(n_kv):
            for gg in range(G):
                off = (kvh * G + gg) * D
                qh_s[kvh * 8 + gg : kvh * 8 + gg + 1, :] = qkv[0:1, off : off + D]
        qall = qh_s[:]
        q_roped = qall * cos + _rotate_half_lanes(qall) * sin

        key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        mask = key_idx <= pos  # [1, T]
        if _ATTN_JOINT and ablate == "":
            R = n_kv * 8
            k_flat = ck_out[0, 0].reshape(T * n_kv, D)  # row t*KV+kvh
            v_flat = cv_out[0, 0].reshape(T * n_kv, D)
            s_j = jax.lax.dot_general(
                q_roped, k_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [R, T*KV]
            col = jax.lax.broadcasted_iota(jnp.int32, (R, T * n_kv), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (R, T * n_kv), 0)
            mj = ((col % n_kv) == (row // 8)) & ((col // n_kv) <= pos)
            s_j = jnp.where(mj, s_j, -1e30)
            m_j = jnp.max(s_j, axis=-1, keepdims=True)
            e_j = jnp.exp(s_j - m_j)
            p_j = (e_j / jnp.sum(e_j, axis=-1, keepdims=True)).astype(
                v_flat.dtype)
            out_j = jax.lax.dot_general(
                p_j, v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype)  # [R, D]
            for kvh in range(n_kv):
                for gg in range(G):
                    off = (kvh * G + gg) * D
                    qkv_s[0:1, pl.ds(off, D)] = out_j[
                        kvh * 8 + gg : kvh * 8 + gg + 1, :]
        else:
          for kvh in range(n_kv):
            if ablate in ("noattn", "nocache"):
                # ladder rung: no scores/PV dots; finite garbage out
                out = q_roped[kvh * 8 : (kvh + 1) * 8, :].astype(qkv.dtype)
            else:
                k_all = ck_out[0, 0, :, kvh, :]  # [T, D] (incl. new token)
                v_all = cv_out[0, 0, :, kvh, :]
                scores = jax.lax.dot_general(
                    q_roped[kvh * 8 : (kvh + 1) * 8, :], k_all,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [8, T] (rows 0..G-1 real)
                scores = jnp.where(mask, scores, -1e30)
                if ablate == "skipsm":
                    # ladder rung: reductions (max/exp/sum) replaced by
                    # a bounded elementwise op; dots kept
                    probs = jnp.clip(scores, -1.0, 1.0).astype(v_all.dtype)
                else:
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    e = jnp.exp(scores - m)
                    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_all.dtype)
                out = jax.lax.dot_general(
                    probs, v_all,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(qkv.dtype)  # [8, D]
            for gg in range(G):
                off = (kvh * G + gg) * D
                qkv_s[0:1, pl.ds(off, D)] = out[gg : gg + 1, :]

        x = qkv_s[:, :q_dim]
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * subw_ref[0, 0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx2_ref[:] = sx
        xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g >= nq)
    def _o_tile():
        xq = xq2_ref[:]
        w_bytes = ow_ref[0]
        acc = _planes_dot(xq, w_bytes, dot_dtype)
        inv = 1.0 / (sx2_ref[:] * so_ref[0, 0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:] = hres_ref[:] + d


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "norm2",
                     "q_dim", "n_kv", "n_heads", "head_dim"),
)
def attn_block_megakernel(
    h: jax.Array,  # [1, H] bf16
    ck: jax.Array,  # [L, 1, T, KV, D] bf16 (updated IN PLACE via aliasing)
    cv: jax.Array,  # [L, 1, T, KV, D]
    qkv_qw: jax.Array,  # [L, H//4, Nq] uint8 (fused q++k++v)
    o_qw: jax.Array,  # [L, Q//4, H] uint8
    layer,
    pos,  # int32 scalar — write/mask position
    qkv_scale_rows: jax.Array,  # [L, 8, Nq] f32
    o_scale_rows: jax.Array,  # [L, 8, H] f32
    input_ln_rows: jax.Array,  # [L, 8, H]
    attn_sub_rows: jax.Array | None,  # [L, 8, Q]
    cos_row: jax.Array,  # [8, D] f32 (current position)
    sin_row: jax.Array,
    *,
    q_dim: int,
    n_kv: int,
    n_heads: int,
    head_dim: int,
    eps: float = 1e-5,
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
):
    """Residual attention block as ONE kernel (batch-1 decode step).

    Returns (h', ck, cv) with the caches updated in place (donated/
    aliased) — the caller must thread them as a scan carry and not use
    the originals again.
    """
    L, k4, n_q = qkv_qw.shape
    _, q4, n_h = o_qw.shape
    k = 4 * k4
    assert n_q == q_dim + 2 * n_kv * head_dim and n_h == k
    b = h.shape[0]
    assert b == 1, "attn megakernel is specialized for batch-1 decode"
    tb = 8
    h2 = jnp.pad(h.reshape(b, k), ((0, tb - b), (0, 0)))

    tn_q = _pick_tile_n(n_q)
    tn_o = _pick_tile_n(n_h)
    nq = n_q // tn_q
    no = n_h // tn_o
    T = ck.shape[2]

    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32).reshape(()), jnp.asarray(pos, jnp.int32).reshape(())]
    )
    if attn_sub_rows is None:
        attn_sub_rows = jnp.ones((L, 8, q_dim), jnp.float32)

    def _clip_o(g):
        return jnp.clip(g - nq, 0, no - 1)

    ablate = _ATTN_ABLATE  # import-time timing knob; "" in production
    cache_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if ablate == "nocache"
        else pl.BlockSpec(
            (1, 1, T, n_kv, head_dim), lambda i, g, s: (s[0], 0, 0, 0, 0)
        )
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nq + no),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, g, s: (i, 0)),  # h
            pl.BlockSpec((tb, tn_o), lambda i, g, s: (i, _clip_o(g))),  # residual
            pl.BlockSpec(
                (1, k4, tn_q), lambda i, g, s: (s[0], 0, jnp.minimum(g, nq - 1))
            ),
            pl.BlockSpec((1, q4, tn_o), lambda i, g, s: (s[0], 0, _clip_o(g))),
            pl.BlockSpec((1, 8, k), lambda i, g, s: (s[0], 0, 0)),  # input_ln
            pl.BlockSpec((1, 8, q_dim), lambda i, g, s: (s[0], 0, 0)),  # attn_sub
            pl.BlockSpec(
                (1, 8, tn_q), lambda i, g, s: (s[0], 0, jnp.minimum(g, nq - 1))
            ),
            pl.BlockSpec((1, 8, tn_o), lambda i, g, s: (s[0], 0, _clip_o(g))),
            pl.BlockSpec((8, head_dim), lambda i, g, s: (0, 0)),  # cos
            pl.BlockSpec((8, head_dim), lambda i, g, s: (0, 0)),  # sin
            cache_spec,  # ck
            cache_spec,  # cv
        ],
        out_specs=[
            pl.BlockSpec((tb, tn_o), lambda i, g, s: (i, _clip_o(g))),
            cache_spec,
            cache_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, n_q), jnp.bfloat16),  # qkv row (attn out reuses cols)
            pltpu.VMEM((n_kv * 8, head_dim), jnp.bfloat16),  # packed q heads
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, q_dim), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
    )
    out, ck2, cv2 = pl.pallas_call(
        functools.partial(
            _attn_megakernel,
            dot_dtype=dot_dtype, eps=eps, norm2=norm2, nq=nq, no=no,
            tn_q=tn_q, tn_o=tn_o, q_dim=q_dim, n_kv=n_kv,
            n_heads=n_heads, head_dim=head_dim, ablate=ablate,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tb, n_h), out_dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        input_output_aliases={11: 1, 12: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * tb * k * n_q + 2 * tb * q_dim * n_h
            + 4 * n_heads * head_dim * T,
            bytes_accessed=k4 * n_q + q4 * n_h + 4 * T * n_kv * head_dim,
            transcendentals=n_heads * T,
        ),
        interpret=interpret,
    )(scalars, h2, h2, qkv_qw, o_qw,
      input_ln_rows.astype(jnp.float32), attn_sub_rows.astype(jnp.float32),
      qkv_scale_rows.astype(jnp.float32), o_scale_rows.astype(jnp.float32),
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32), ck, cv)
    return out[:b], ck2, cv2


def _attn_megakernel_static(
    pos_ref, h_ref, hres_ref, qw_ref, ow_ref, nw_ref, subw_ref, sq_ref,
    so_ref, cos_ref, sin_ref, ck_ref, cv_ref,
    o_ref, ck_out, cv_out,
    qkv_s, qh_s, xq_ref, sx_ref, xq2_ref, sx2_ref,
    *, dot_dtype, eps, norm2, nq, no, tn_q, tn_o, q_dim, n_kv, n_heads,
    head_dim, ablate=""
):
    """attn_block megakernel WITHOUT scalar-prefetch: the layer loop is
    unrolled with pre-split per-layer operands, so every index map is
    static. Lab 8: PrefetchScalarGridSpec costs ~8-10 us per call —
    that was a third of the whole attention block."""
    g = pl.program_id(1)
    pos = pos_ref[0]
    D = head_dim
    G = n_heads // n_kv
    kvd = n_kv * D

    @pl.when(g == 0)
    def _prologue():
        x = h_ref[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw_ref[0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g < nq)
    def _qkv_tile():
        acc = _planes_dot(xq_ref[:], qw_ref[:], dot_dtype)
        inv = 1.0 / (sx_ref[:] * sq_ref[0:1, :])
        qkv_s[:, pl.ds(g * tn_q, tn_q)] = (
            acc.astype(jnp.float32) * inv
        ).astype(qkv_s.dtype)

    @pl.when(g == nq)
    def _attention():
        qkv = qkv_s[:]
        T = ck_ref.shape[1]
        cos = cos_ref[0:1, :].astype(qkv.dtype)
        sin = sin_ref[0:1, :].astype(qkv.dtype)
        scale = 1.0 / float(np.sqrt(D))
        if ablate != "nocache":  # timing ladder: see _ATTN_ABLATE
            ck_out[:] = ck_ref[:]
            cv_out[:] = cv_ref[:]
            for kvh in range(n_kv):
                k_h = qkv[:, q_dim + kvh * D : q_dim + (kvh + 1) * D]
                k_roped = k_h * cos + _rotate_half_lanes(k_h) * sin
                ck_out[0, pl.ds(pos, 1), kvh, :] = k_roped[0:1, :]
                v_h = qkv[:, q_dim + kvd + kvh * D : q_dim + kvd + (kvh + 1) * D]
                cv_out[0, pl.ds(pos, 1), kvh, :] = v_h[0:1, :]
        for kvh in range(n_kv):
            for gg in range(G):
                off = (kvh * G + gg) * D
                qh_s[kvh * 8 + gg : kvh * 8 + gg + 1, :] = qkv[0:1, off : off + D]
        qall = qh_s[:]
        q_roped = qall * cos + _rotate_half_lanes(qall) * sin
        key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        mask = key_idx <= pos
        if _ATTN_JOINT and ablate == "":
            R = n_kv * 8
            k_flat = ck_out[0].reshape(T * n_kv, D)  # row t*KV+kvh
            v_flat = cv_out[0].reshape(T * n_kv, D)
            s_j = jax.lax.dot_general(
                q_roped, k_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [R, T*KV]
            col = jax.lax.broadcasted_iota(jnp.int32, (R, T * n_kv), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (R, T * n_kv), 0)
            mj = ((col % n_kv) == (row // 8)) & ((col // n_kv) <= pos)
            s_j = jnp.where(mj, s_j, -1e30)
            m_j = jnp.max(s_j, axis=-1, keepdims=True)
            e_j = jnp.exp(s_j - m_j)
            p_j = (e_j / jnp.sum(e_j, axis=-1, keepdims=True)).astype(
                v_flat.dtype)
            out_j = jax.lax.dot_general(
                p_j, v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype)  # [R, D]
            for kvh in range(n_kv):
                for gg in range(G):
                    off = (kvh * G + gg) * D
                    qkv_s[0:1, pl.ds(off, D)] = out_j[
                        kvh * 8 + gg : kvh * 8 + gg + 1, :]
        else:
          for kvh in range(n_kv):
            if ablate in ("noattn", "nocache"):
                outv = q_roped[kvh * 8 : (kvh + 1) * 8, :].astype(qkv.dtype)
            else:
                k_all = ck_out[0, :, kvh, :]
                v_all = cv_out[0, :, kvh, :]
                scores = jax.lax.dot_general(
                    q_roped[kvh * 8 : (kvh + 1) * 8, :], k_all,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                scores = jnp.where(mask, scores, -1e30)
                if ablate == "skipsm":
                    probs = jnp.clip(scores, -1.0, 1.0).astype(v_all.dtype)
                else:
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    e = jnp.exp(scores - m)
                    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_all.dtype)
                outv = jax.lax.dot_general(
                    probs, v_all,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(qkv.dtype)
            for gg in range(G):
                off = (kvh * G + gg) * D
                qkv_s[0:1, pl.ds(off, D)] = outv[gg : gg + 1, :]
        x = qkv_s[:, :q_dim]
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * subw_ref[0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx2_ref[:] = sx
        xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g >= nq)
    def _o_tile():
        acc = _planes_dot(xq2_ref[:], ow_ref[:], dot_dtype)
        inv = 1.0 / (sx2_ref[:] * so_ref[0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:] = hres_ref[:] + d


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "norm2",
                     "q_dim", "n_kv", "n_heads", "head_dim"),
)
def attn_block_megakernel_static(
    h: jax.Array,  # [1, H]
    ck_l: jax.Array,  # [1, T, KV, D] — THIS layer's cache slice
    cv_l: jax.Array,
    qkv_qw_l: jax.Array,  # [H//4, Nq]
    o_qw_l: jax.Array,  # [Q//4, H]
    pos,  # int32 scalar
    qkv_scale_l: jax.Array,  # [8, Nq]
    o_scale_l: jax.Array,  # [8, H]
    input_ln_l: jax.Array,  # [8, H]
    attn_sub_l: jax.Array | None,  # [8, Q]
    cos_row: jax.Array,  # [8, D]
    sin_row: jax.Array,
    *,
    q_dim: int,
    n_kv: int,
    n_heads: int,
    head_dim: int,
    eps: float = 1e-5,
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
):
    """Unrolled-layer attention block: returns (h', ck_l', cv_l')."""
    k4, n_q = qkv_qw_l.shape
    q4, n_h = o_qw_l.shape
    k = 4 * k4
    b = h.shape[0]
    assert b == 1
    tb = 8
    h2 = jnp.pad(h.reshape(b, k), ((0, tb - b), (0, 0)))
    tn_q = _pick_tile_n(n_q)
    tn_o = _pick_tile_n(n_h)
    nq, no = n_q // tn_q, n_h // tn_o
    T = ck_l.shape[1]
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if attn_sub_l is None:
        attn_sub_l = jnp.ones((8, q_dim), jnp.float32)

    def _co(g):
        return jnp.clip(g - nq, 0, no - 1)

    ablate = _ATTN_ABLATE  # import-time timing knob; "" in production
    cache_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if ablate == "nocache"
        else pl.BlockSpec(
            (1, T, n_kv, head_dim), lambda i, g: (0, 0, 0, 0)
        )
    )
    out, ck2, cv2 = pl.pallas_call(
        functools.partial(
            _attn_megakernel_static,
            dot_dtype=dot_dtype, eps=eps, norm2=norm2, nq=nq, no=no,
            tn_q=tn_q, tn_o=tn_o, q_dim=q_dim, n_kv=n_kv,
            n_heads=n_heads, head_dim=head_dim, ablate=ablate,
        ),
        grid=(1, nq + no),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            pl.BlockSpec((tb, k), lambda i, g: (i, 0)),
            pl.BlockSpec((tb, tn_o), lambda i, g: (i, _co(g))),
            pl.BlockSpec((k4, tn_q), lambda i, g: (0, jnp.minimum(g, nq - 1))),
            pl.BlockSpec((q4, tn_o), lambda i, g: (0, _co(g))),
            pl.BlockSpec((8, k), lambda i, g: (0, 0)),
            pl.BlockSpec((8, q_dim), lambda i, g: (0, 0)),
            pl.BlockSpec((8, tn_q), lambda i, g: (0, jnp.minimum(g, nq - 1))),
            pl.BlockSpec((8, tn_o), lambda i, g: (0, _co(g))),
            pl.BlockSpec((8, head_dim), lambda i, g: (0, 0)),
            pl.BlockSpec((8, head_dim), lambda i, g: (0, 0)),
            cache_spec,
            cache_spec,
        ],
        out_specs=[
            pl.BlockSpec((tb, tn_o), lambda i, g: (i, _co(g))),
            cache_spec,
            cache_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tb, n_h), out_dtype),
            jax.ShapeDtypeStruct(ck_l.shape, ck_l.dtype),
            jax.ShapeDtypeStruct(cv_l.shape, cv_l.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, n_q), jnp.bfloat16),
            pltpu.VMEM((n_kv * 8, head_dim), jnp.bfloat16),
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, q_dim), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * tb * k * n_q + 2 * tb * q_dim * n_h
            + 4 * n_heads * head_dim * T,
            bytes_accessed=k4 * n_q + q4 * n_h + 4 * T * n_kv * head_dim,
            transcendentals=n_heads * T,
        ),
        interpret=interpret,
    )(pos_arr, h2, h2, qkv_qw_l, o_qw_l,
      input_ln_l.astype(jnp.float32), attn_sub_l.astype(jnp.float32),
      qkv_scale_l.astype(jnp.float32), o_scale_l.astype(jnp.float32),
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32), ck_l, cv_l)
    return out[:b], ck2, cv2


def _attn_megakernel_manual(
    pos_ref, h_ref, qw_hbm, ow_hbm, nw_ref, subw_ref, sq_ref, so_ref,
    cos_ref, sin_ref, ckr_hbm, cvr_hbm,
    o_ref, ck_out, cv_out,
    w_qw, w_ow, k_res, v_res, scores, qkv_s, qh_s,
    xq_ref, sx_ref, xq2_ref, sx2_ref, knew, vnew, kwin, vwin, oacc_ref,
    sem_qw, sem_ow, sem_k, sem_v, sem_wr,
    *, dot_dtype, eps, norm2, nq, no, tn_q, tn_o, nt, tt, q_dim,
    n_kv, n_heads, head_dim, stacked=False, cache_rows=0, ring=0,
    vsm=False,
):
    """Manual-DMA attention megakernel (batch-1 decode, unrolled layer).

    The auto kernel (`_attn_megakernel_static`) moves ~3x the cache
    bytes it needs: the full static-T cache is a BlockSpec operand —
    DMA'd in, copied VMEM->VMEM, DMA'd back out in full, every layer —
    and the attention grid step streams no weights behind it. Measured
    27.8-42 us/layer (lab6 / lab15) against a ~6-9 us weight+cache
    stream floor.

    Here (scripts/kernel_lab15.py campaign, BIT-EXACT vs the auto
    kernel incl. cache contents):
      - caches stay in HBM (memory_space=ANY, aliased) viewed as
        [T*KV, 128] rows; only tiles with rows < pos are read, so
        cache-read bytes scale with the ACTUAL context, not static T
      - the new token's roped k/v rows land via an aligned RMW of the
        40-row window of their 8-slot group ((pos//8)*8*KV is provably
        8-divisible — Mosaic rejects a direct write at pos*KV); the RMW
        preserves every other row exactly
      - scores use one joint [R=KV*8, tt*KV] dot per tile (head-mask
        keeps each packed q row on its own kv head) into an f32 buffer;
        exact two-pass softmax with the new-token column merged
        analytically — no flash-accumulation drift
      - all weight/cache DMAs start up front and are waited
        just-in-time; norm/quant prologues overlap the streams

    Measured: ~9-10 us/layer at T=512-1024 vs 27.8 (auto, T=328) /
    41.9 (auto, T=1024) — and lifts the auto kernel's T<=1638 VMEM cap
    to ~2048+ (resident-v budget).

    With ``stacked=True`` the kernel serves the production layer-scan
    path: scalars are (layer, pos), weights are the full [L, ., .]
    stacks (DMA source indexed by layer), scale/norm rows are blocked
    per-layer, and the caches are ONE flat [L*T*KV, D] aliased array
    addressed at row offset layer*cache_rows — the scan carries a
    single buffer, no per-layer slice/stack copies at all.
    """
    if stacked:
        lyr = pos_ref[0]
        pos = pos_ref[1]
        cb = lyr * cache_rows  # this layer's first cache row
    else:
        pos = pos_ref[0]
        cb = 0
    D = head_dim
    KV = n_kv
    G = n_heads // n_kv
    kvd = KV * D
    R = KV * 8  # packed q rows (G real per kv head)

    def _rows2(ref):
        # blocked [1, 8, n] (stacked) vs full [8, n] operand -> VALUE
        return ref[0] if stacked else ref[:]

    nw_ref = _rows2(nw_ref)
    subw_ref = _rows2(subw_ref)
    sq_ref = _rows2(sq_ref)
    so_ref = _rows2(so_ref)

    def qw_dma(g):
        src = (qw_hbm.at[lyr, :, pl.ds(g * tn_q, tn_q)] if stacked
               else qw_hbm.at[:, pl.ds(g * tn_q, tn_q)])
        return pltpu.make_async_copy(src, w_qw.at[g], sem_qw.at[g])

    def ow_dma(g):
        src = (ow_hbm.at[lyr, :, pl.ds(g * tn_o, tn_o)] if stacked
               else ow_hbm.at[:, pl.ds(g * tn_o, tn_o)])
        return pltpu.make_async_copy(src, w_ow.at[g], sem_ow.at[g])

    # ring > 0: k_res/v_res hold only `ring` tiles (double/triple
    # buffered cache stream) instead of all nt — lifts the resident-VMEM
    # cap so T=4096+ runs; tile t lives in slot t % ring and is refilled
    # for tile t+ring right after its last consumer (scores pass for k,
    # PV pass for v). ring == 0 keeps every tile resident (small-T path,
    # bit-identical to round 3's kernel).
    def _slot(t):
        return (t % ring) if ring else t

    def k_dma(t):
        s = _slot(t)
        return pltpu.make_async_copy(
            ckr_hbm.at[pl.ds(cb + t * tt * KV, tt * KV)],
            k_res.at[pl.ds(s * tt * KV, tt * KV)], sem_k.at[s])

    def v_dma(t):
        s = _slot(t)
        return pltpu.make_async_copy(
            cvr_hbm.at[pl.ds(cb + t * tt * KV, tt * KV)],
            v_res.at[pl.ds(s * tt * KV, tt * KV)], sem_v.at[s])

    # aligned RMW window: the 8-slot group holding slot pos
    grp = pos // 8
    W = 8 * KV
    rd_k = pltpu.make_async_copy(
        ckr_hbm.at[pl.ds(cb + grp * W, W)], kwin, sem_wr.at[0])
    rd_v = pltpu.make_async_copy(
        cvr_hbm.at[pl.ds(cb + grp * W, W)], vwin, sem_wr.at[1])

    # ---- warm-up: every stream starts now; waits are just-in-time ----
    for g in range(nq):
        qw_dma(g).start()
    rd_k.start()
    rd_v.start()
    for t in range(nt if ring == 0 else min(ring, nt)):
        @pl.when(pos > t * tt)
        def _():
            k_dma(t).start()
            v_dma(t).start()
    for g in range(no):
        ow_dma(g).start(priority=1)  # o weights are needed last

    # ---- prologue A (overlaps the streams): norm + quant ----
    x = h_ref[:]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * nw_ref[0:1, :].astype(x.dtype)
    xf = x.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx = 127.0 / absmax
    sx_ref[:] = sx
    xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    # ---- qkv tiles ----
    for g in range(nq):
        qw_dma(g).wait()
        acc = _planes_dot(xq_ref[:], w_qw[g], dot_dtype)
        inv = 1.0 / (sx_ref[:] * sq_ref[0:1, g * tn_q:(g + 1) * tn_q])
        qkv_s[:, pl.ds(g * tn_q, tn_q)] = (
            acc.astype(jnp.float32) * inv
        ).astype(qkv_s.dtype)

    # ---- attention ----
    qkv = qkv_s[:]
    cos = cos_ref[0:1, :].astype(qkv.dtype)
    sin = sin_ref[0:1, :].astype(qkv.dtype)
    scale = 1.0 / float(np.sqrt(D))

    # new-token roped k / v -> staging rows 0..KV-1 (padding rows must
    # be FINITE: vnew feeds a masked dot where NaN * 0 would still
    # poison the accumulator)
    knew[:] = jnp.zeros((8, D), knew.dtype)
    vnew[:] = jnp.zeros((8, D), vnew.dtype)
    for kvh in range(KV):
        k_h = qkv[:, q_dim + kvh * D : q_dim + (kvh + 1) * D]
        k_roped = k_h * cos + _rotate_half_lanes(k_h) * sin
        knew[kvh : kvh + 1, :] = k_roped[0:1, :]
        v_h = qkv[:, q_dim + kvd + kvh * D : q_dim + kvd + (kvh + 1) * D]
        vnew[kvh : kvh + 1, :] = v_h[0:1, :]

    # overlay the new rows at sublane offset (pos%8)*KV, write back
    woff = (pos % 8) * KV
    rd_k.wait()
    rd_v.wait()
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    sel = (wrow >= woff) & (wrow < woff + KV)
    pad8 = jnp.zeros((W - 8, 128), jnp.float32)

    def _place(new_ref):
        # dynamic rotate is 32-bit only: roll in f32, cast back
        stacked = jnp.concatenate([new_ref[:].astype(jnp.float32), pad8], 0)
        return pltpu.roll(stacked, woff, 0).astype(kwin.dtype)

    kwin[:] = jnp.where(sel, _place(knew), kwin[:])
    vwin[:] = jnp.where(sel, _place(vnew), vwin[:])
    wr_k = pltpu.make_async_copy(
        kwin, ck_out.at[pl.ds(cb + grp * W, W)], sem_wr.at[2])
    wr_v = pltpu.make_async_copy(
        vwin, cv_out.at[pl.ds(cb + grp * W, W)], sem_wr.at[3])
    wr_k.start()
    wr_v.start()

    # packed q heads: row kvh*8+g holds head (kvh*G+g); rows g>=G unused
    for kvh in range(KV):
        for gg in range(G):
            off = (kvh * G + gg) * D
            qh_s[kvh * 8 + gg : kvh * 8 + gg + 1, :] = qkv[0:1, off : off + D]
    q_roped = qh_s[:] * cos + _rotate_half_lanes(qh_s[:]) * sin  # [R, D]

    # scores pass: one joint dot per tile over [tt*KV, D] rows; column
    # c of tile t is (time t*tt + c//KV, head c%KV); the head mask
    # keeps each packed q row on its own kv head.
    # Init only the tiles the pass will NOT visit (pos <= t*tt): visited
    # tiles write every column (the masked where covers the full tile),
    # so a full-buffer init would be redundant VPU traffic — at long T
    # that's half the scores-buffer writes.
    row_head = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 0) // 8
    col_head = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 1) % KV
    col_time0 = jax.lax.broadcasted_iota(jnp.int32, (R, tt * KV), 1) // KV

    # new-token scores [R, 8] (cols >= KV masked; head-matched)
    s_new = jax.lax.dot_general(
        q_roped, knew[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    colh = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 0) // 8
    s_new = jnp.where((colh == rowh) & (colh < KV), s_new, -1e30)

    if vsm:
        # single-tile VALUE-form softmax (WF_ATTN_VSM experiment):
        # scores never round-trip through the scratch buffer — the
        # masked where keeps any unstreamed-garbage k (pos == 0) out,
        # and the PV dot is guarded so garbage v never multiplies.
        # Bit-identical to the scratch path (same reduction shapes,
        # same bf16 cast before the PV dot).
        assert nt == 1
        @pl.when(pos > 0)
        def _():
            k_dma(0).wait()
        s = jax.lax.dot_general(
            q_roped, k_res[pl.ds(0, tt * KV), :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        ok = (col_head == row_head) & (col_time0 < pos)
        s = jnp.where(ok, s, -1e30)
        m = jnp.maximum(
            jnp.max(s, axis=-1, keepdims=True),
            jnp.max(s_new, axis=-1, keepdims=True),
        )
        e = jnp.exp(s - m)
        e_new = jnp.exp(s_new - m)
        denom = (
            jnp.sum(e, axis=-1, keepdims=True)
            + jnp.sum(e_new, axis=-1, keepdims=True)
        )
        oacc_ref[:] = jax.lax.dot_general(
            e_new, vnew[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        @pl.when(pos > 0)
        def _():
            v_dma(0).wait()
            oacc_ref[:] += jax.lax.dot_general(
                e.astype(qkv.dtype), v_res[pl.ds(0, tt * KV), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        # Init only the tiles the scores pass will NOT visit
        # (pos <= t*tt): visited tiles write every column.
        for t in range(nt):
            @pl.when(pos <= t * tt)
            def _():
                scores[:, pl.ds(t * tt * KV, tt * KV)] = jnp.full(
                    (R, tt * KV), -1e30, jnp.float32
                )
        for t in range(nt):
            @pl.when(pos > t * tt)
            def _():
                k_dma(t).wait()
                s = jax.lax.dot_general(
                    q_roped, k_res[pl.ds(_slot(t) * tt * KV, tt * KV), :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [R, tt*KV]
                ok = (col_head == row_head) & (col_time0 + (t * tt) < pos)
                scores[:, pl.ds(t * tt * KV, tt * KV)] = jnp.where(ok, s, -1e30)
                if ring and t + ring < nt:
                    # slot free: stream the next k tile behind the compute
                    @pl.when(pos > (t + ring) * tt)
                    def _():
                        k_dma(t + ring).start()

        # exact two-pass softmax over buffer + new column
        m = jnp.maximum(
            jnp.max(scores[:], axis=-1, keepdims=True),
            jnp.max(s_new, axis=-1, keepdims=True),
        )  # [R, 1]
        scores[:] = jnp.exp(scores[:] - m)
        e_new = jnp.exp(s_new - m)  # [R, 8]
        denom = (
            jnp.sum(scores[:], axis=-1, keepdims=True)
            + jnp.sum(e_new, axis=-1, keepdims=True)
        )

        # PV: tiled accumulation (VMEM ref — pl.when bodies cannot carry
        # Python values out) from resident v + the new-token term
        oacc_ref[:] = jax.lax.dot_general(
            e_new, vnew[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for t in range(nt):
            @pl.when(pos > t * tt)
            def _():
                v_dma(t).wait()
                p = scores[:, pl.ds(t * tt * KV, tt * KV)].astype(qkv.dtype)
                oacc_ref[:] += jax.lax.dot_general(
                    p, v_res[pl.ds(_slot(t) * tt * KV, tt * KV), :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if ring and t + ring < nt:
                    @pl.when(pos > (t + ring) * tt)
                    def _():
                        v_dma(t + ring).start()
    out_all = (oacc_ref[:] / denom).astype(qkv.dtype)  # [R, D]

    # repack head rows into qkv_s columns, then sub-norm + quant
    for kvh in range(KV):
        for gg in range(G):
            off = (kvh * G + gg) * D
            qkv_s[0:1, pl.ds(off, D)] = out_all[kvh * 8 + gg : kvh * 8 + gg + 1, :]
    x = qkv_s[:, :q_dim]
    if norm2:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
            * subw_ref[0:1, :].astype(x.dtype)
    xf = x.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx2 = 127.0 / absmax
    sx2_ref[:] = sx2
    xq2_ref[:] = jnp.clip(jnp.round(xf * sx2), -128, 127).astype(jnp.int8)

    # ---- o tiles + residual ----
    for g in range(no):
        ow_dma(g).wait()
        acc = _planes_dot(xq2_ref[:], w_ow[g], dot_dtype)
        inv = 1.0 / (sx2_ref[:] * so_ref[0:1, g * tn_o:(g + 1) * tn_o])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:, pl.ds(g * tn_o, tn_o)] = h_ref[:, pl.ds(g * tn_o, tn_o)] + d

    wr_k.wait()
    wr_v.wait()


_ATTN_VMEM_BUDGET = 11 * 1024 * 1024
_ATTN_RING = 3  # ring slots per cache stream in streamed mode
# auto/manual crossover floor. In the REAL decode window (profiled, not
# lab chains) the auto kernel runs 13.6 us/layer at T=328 vs 19.4
# manual — the manual variant's fixed VPU cost (joint masked scores
# over [KV*8, T*KV], buffer init, RMW roll) loses below ~T=512, while
# at T=1024 it is 8.9 vs 41.9 and beyond T=1638 the auto kernel cannot
# run at all (VMEM cap). Lab chains overstate the auto kernel ~2x
# (27.8 measured solo) — gate on the in-window numbers. Env override is
# read ONCE at import (ADVICE r4 item 1: these feed jit-static args
# whose cache key is shapes only — flipping mid-process would silently
# reuse stale kernels; process-launch-only semantics).
_ATTN_TMIN = int(os.environ.get("WF_ATTN_MANUAL_TMIN", "512"))
# value-form-softmax single-tile experiment (lost its chip A/B, kept
# for re-measurement; import-time read, process-launch-only semantics)
_ATTN_VSM = os.environ.get("WF_ATTN_VSM", "0") == "1"
# small-T decomposition ladder for the AUTO attention kernel (VERDICT
# r4 item 5): timing-only body ablations for same-session bench A/Bs.
# "" (production) | "skipsm" (identity in place of softmax) | "noattn"
# (skip scores/PV dots too) | "nocache" (noattn + cache blocks left in
# HBM: measures the auto-pipelined cache in/out DMA). OUTPUT TOKENS ARE
# GARBAGE for any non-empty value — never set outside the ladder.
_ATTN_ABLATE = os.environ.get("WF_ATTN_ABLATE", "")
# joint-dot attention in the AUTO kernel (DEFAULT since round 5): ONE
# [KV*8, D] x [D, T*KV] masked scores dot + ONE PV dot instead of 2*KV
# tiny 8-row dots. The ablation ladder measured the per-head dots at
# 5.9 us/layer of the 13.6 at T=328 (MXU issue cost, not bandwidth);
# the joint form benched 504.9 tok/s vs 470.9-472.5 same-day
# (bench_joint.log, 1.981 ms/token). Exactness: equal in exact
# arithmetic (masked entries underflow to +0.0; interpret-mode bitwise
# gate), but on the MXU the wider contraction partitions the real
# elements across different accumulation chunks -> last-ulp f32
# reduction-order drift, the SAME class as the manual kernel vs auto
# (ROOFLINE exactness contract; measured on chip: greedy tokens on
# random near-tied weights diverge after ~7 steps, exactly as any
# fusion/reduction-order change can). WF_ATTN_JOINT=0 restores the
# per-head loop; import-time read.
_ATTN_JOINT = os.environ.get("WF_ATTN_JOINT", "1") == "1"
# resident tiles with nt <= this stream no ring; beyond it the copy-in
# of many small tiles loses to the 3-slot streamed pipeline (chip A/B,
# bench_ctx2048 anomaly: resident-style small tiles degraded mid-T
# decode while the T=4232 ring path sustained 394 tok/s)
_ATTN_RESIDENT_MAX_TILES = 2


def attn_manual_plan(
    T: int, n_kv: int, head_dim: int
) -> tuple[int, int] | None:
    """(time-tile, ring-depth) for the manual attention kernel, or
    None if the geometry is out of policy: T must be a multiple of 8
    (aligned RMW groups) and >= the auto/manual crossover floor
    (_ATTN_TMIN), and the f32 scores row block must fit the VMEM
    budget next to the ~4.1 MB weight tiles.

    Tile: the LARGEST 8-multiple divisor of T that is <= 640 (tiny
    tiles explode the unroll: T=1288 with the old divisor list fell to
    tt=8 -> 161 tiles -> 71 us/layer), searching tile counts up to 64
    so awkward lengths still plan (T=2312 = 8*17^2 has no 8-multiple
    tile with nt <= 16 — round 4 silently fell back to the
    non-megakernel path and decode dropped 480 -> 262 tok/s; now it
    plans tt=136 x 17, ring-streamed).

    Ring policy (replaces the WF_ATTN_FORCE_RING env knob, VERDICT r4
    item 2): resident (ring=0, whole cache copied to VMEM up front)
    only for few-large-tile plans (nt <= _ATTN_RESIDENT_MAX_TILES)
    that fit the budget; otherwise stream k/v through _ATTN_RING slots
    per side — only the scores stay full-T in VMEM."""
    if T % 8 or T < _ATTN_TMIN:
        return None
    per_slot = 2 * n_kv * head_dim * 2 + 8 * 8 * n_kv * 4
    scores_b = T * 8 * 8 * n_kv * 4
    tile = None
    for nt in range(1, 65):
        tt = T // nt
        if T % nt or tt % 8 or tt > 640:
            continue
        tile = tt
        break
    if tile is None:
        return None
    nt = T // tile
    if nt <= _ATTN_RESIDENT_MAX_TILES and T * per_slot <= _ATTN_VMEM_BUDGET:
        return tile, 0
    ring_b = 2 * _ATTN_RING * tile * n_kv * head_dim * 2
    if scores_b + ring_b <= _ATTN_VMEM_BUDGET:
        return tile, _ATTN_RING
    # shrink the tile until the ring fits beside the scores
    for nt2 in range(nt + 1, 257):
        tt = T // nt2
        if T % nt2 or tt % 8:
            continue
        if scores_b + 2 * _ATTN_RING * tt * n_kv * head_dim * 2 \
                <= _ATTN_VMEM_BUDGET:
            return tt, _ATTN_RING
    return None


def attn_manual_tile(T: int, n_kv: int, head_dim: int) -> int | None:
    """Time-tile of `attn_manual_plan` (compat view used by the model's
    kernel-selection gate)."""
    plan = attn_manual_plan(T, n_kv, head_dim)
    return plan[0] if plan else None


def attn_manual_ring(T: int, n_kv: int, head_dim: int) -> int:
    """Ring depth of `attn_manual_plan`: 0 = every cache tile resident
    in VMEM (bit-identical to the round-3 kernel), else _ATTN_RING
    streamed slots per k/v side. Falls back to the fit rule when the
    plan is None (tests call this with out-of-policy T)."""
    plan = attn_manual_plan(T, n_kv, head_dim)
    if plan:
        return plan[1]
    per_slot = 2 * n_kv * head_dim * 2 + 8 * 8 * n_kv * 4
    return 0 if T * per_slot <= _ATTN_VMEM_BUDGET else _ATTN_RING


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "eps", "norm2", "q_dim",
                     "n_kv", "n_heads", "head_dim", "tt", "ring"),
)
def attn_block_megakernel_manual(
    h: jax.Array,  # [1, H]
    ck_flat: jax.Array,  # [T*KV, D] — this layer's cache, row-major
    cv_flat: jax.Array,
    qkv_qw_l: jax.Array,  # [H//4, Nq]
    o_qw_l: jax.Array,  # [Q//4, H]
    pos,
    qkv_scale_l: jax.Array,  # [8, Nq]
    o_scale_l: jax.Array,  # [8, H]
    input_ln_l: jax.Array,  # [8, H]
    attn_sub_l: jax.Array | None,  # [8, Q]
    cos_row: jax.Array,  # [8, D]
    sin_row: jax.Array,
    *,
    q_dim: int,
    n_kv: int,
    n_heads: int,
    head_dim: int,
    tt: int,
    ring: int | None = None,  # None = attn_manual_ring auto; tests override
    eps: float = 1e-5,
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
):
    """Manual-DMA attention block (see `_attn_megakernel_manual`).
    Returns (h' [1,H], ck_flat', cv_flat') with the caches updated in
    place (aliased). Caller passes the cache as flat [T*KV, D] rows;
    `tt` from `attn_manual_tile(T, ...)`."""
    k4, n_q = qkv_qw_l.shape
    q4, n_h = o_qw_l.shape
    H = 4 * k4
    KV, D = n_kv, head_dim
    T = ck_flat.shape[0] // KV
    assert ck_flat.shape == (T * KV, D) and T % tt == 0 and tt % 8 == 0
    b = h.shape[0]
    assert b == 1
    h2 = jnp.pad(h.reshape(b, H), ((0, 8 - b), (0, 0)))
    tn_q = _pick_tile_n(n_q)
    tn_o = _pick_tile_n(n_h)
    nq, no = n_q // tn_q, n_h // tn_o
    nt = T // tt
    ring = min(attn_manual_ring(T, KV, D) if ring is None else ring, nt)
    rt = ring if ring else nt  # resident cache tiles in VMEM
    vsm = nt == 1 and _ATTN_VSM  # import-time constant (ADVICE r4 item 1)
    R = KV * 8
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if attn_sub_l is None:
        attn_sub_l = jnp.ones((8, q_dim), jnp.float32)

    out, ck2, cv2 = pl.pallas_call(
        functools.partial(
            _attn_megakernel_manual,
            dot_dtype=dot_dtype, eps=eps, norm2=norm2, nq=nq, no=no,
            tn_q=tn_q, tn_o=tn_o, nt=nt, tt=tt, q_dim=q_dim, n_kv=KV,
            n_heads=n_heads, head_dim=D, ring=ring, vsm=vsm,
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            pl.BlockSpec((8, H), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # qkv weights
            pl.BlockSpec(memory_space=pl.ANY),  # o weights
            pl.BlockSpec((8, H), lambda i: (0, 0)),  # input_ln rows
            pl.BlockSpec((8, q_dim), lambda i: (0, 0)),  # attn_sub rows
            pl.BlockSpec((8, n_q), lambda i: (0, 0)),  # qkv scale rows
            pl.BlockSpec((8, n_h), lambda i: (0, 0)),  # o scale rows
            pl.BlockSpec((8, D), lambda i: (0, 0)),  # cos
            pl.BlockSpec((8, D), lambda i: (0, 0)),  # sin
            pl.BlockSpec(memory_space=pl.ANY),  # k rows
            pl.BlockSpec(memory_space=pl.ANY),  # v rows
        ],
        out_specs=[
            pl.BlockSpec((8, n_h), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_h), out_dtype),
            jax.ShapeDtypeStruct(ck_flat.shape, ck_flat.dtype),
            jax.ShapeDtypeStruct(cv_flat.shape, cv_flat.dtype),
        ],
        input_output_aliases={10: 1, 11: 2},
        scratch_shapes=[
            pltpu.VMEM((nq, k4, tn_q), jnp.uint8),
            pltpu.VMEM((no, q4, tn_o), jnp.uint8),
            pltpu.VMEM((rt * tt * KV, D), jnp.bfloat16),  # k resident/ring
            pltpu.VMEM((rt * tt * KV, D), jnp.bfloat16),  # v resident/ring
            pltpu.VMEM((R, nt * tt * KV), jnp.float32),  # scores
            pltpu.VMEM((8, n_q), jnp.bfloat16),
            pltpu.VMEM((R, D), jnp.bfloat16),
            pltpu.VMEM((8, H), jnp.int8),
            pltpu.VMEM((8, 1), jnp.float32),
            pltpu.VMEM((8, q_dim), jnp.int8),
            pltpu.VMEM((8, 1), jnp.float32),
            pltpu.VMEM((8, D), jnp.bfloat16),  # knew staging
            pltpu.VMEM((8, D), jnp.bfloat16),  # vnew staging
            pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # k RMW window
            pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # v RMW window
            pltpu.VMEM((R, D), jnp.float32),  # PV accumulator
            pltpu.SemaphoreType.DMA((nq,)),
            pltpu.SemaphoreType.DMA((no,)),
            pltpu.SemaphoreType.DMA((rt,)),
            pltpu.SemaphoreType.DMA((rt,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * H * n_q + 2 * 8 * q_dim * n_h
            + 4 * n_heads * head_dim * T,
            bytes_accessed=k4 * n_q + q4 * n_h + 4 * T * KV * D,
            transcendentals=R * T,
        ),
    )(pos_arr, h2, qkv_qw_l, o_qw_l,
      input_ln_l.astype(jnp.float32), attn_sub_l.astype(jnp.float32),
      qkv_scale_l.astype(jnp.float32), o_scale_l.astype(jnp.float32),
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32),
      ck_flat, cv_flat)
    return out[:b], ck2, cv2


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "eps", "norm2", "q_dim",
                     "n_kv", "n_heads", "head_dim", "tt", "T", "ring"),
)
def attn_block_megakernel_manual_stacked(
    h: jax.Array,  # [1, H]
    ck_flat: jax.Array,  # [L*T*KV, D] — ALL layers' caches, row-major
    cv_flat: jax.Array,
    qkv_qw: jax.Array,  # [L, H//4, Nq]
    o_qw: jax.Array,  # [L, Q//4, H]
    layer,
    pos,
    qkv_scale_rows: jax.Array,  # [L, 8, Nq]
    o_scale_rows: jax.Array,  # [L, 8, H]
    input_ln_rows: jax.Array,  # [L, 8, H]
    attn_sub_rows: jax.Array | None,  # [L, 8, Q]
    cos_row: jax.Array,  # [8, D]
    sin_row: jax.Array,
    *,
    T: int,
    q_dim: int,
    n_kv: int,
    n_heads: int,
    head_dim: int,
    tt: int,
    ring: int | None = None,  # None = attn_manual_ring auto; tests override
    eps: float = 1e-5,
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
):
    """Layer-scan variant of the manual-DMA attention block (see
    `_attn_megakernel_manual`): the scan carries ONE flat aliased cache
    buffer per k/v; this call reads/writes only layer `layer`'s rows at
    offset layer*T*KV. Production batch-1 decode path."""
    L, k4, n_q = qkv_qw.shape
    _, q4, n_h = o_qw.shape
    H = 4 * k4
    KV, D = n_kv, head_dim
    assert ck_flat.shape == (L * T * KV, D), (ck_flat.shape, L, T, KV)
    assert T % tt == 0 and tt % 8 == 0 and (T * KV) % 8 == 0
    b = h.shape[0]
    assert b == 1
    h2 = jnp.pad(h.reshape(b, H), ((0, 8 - b), (0, 0)))
    tn_q = _pick_tile_n(n_q)
    tn_o = _pick_tile_n(n_h)
    nq, no = n_q // tn_q, n_h // tn_o
    nt = T // tt
    ring = min(attn_manual_ring(T, KV, D) if ring is None else ring, nt)
    rt = ring if ring else nt  # resident cache tiles in VMEM
    vsm = nt == 1 and _ATTN_VSM  # import-time constant (ADVICE r4 item 1)
    R = KV * 8
    scalars = jnp.stack([
        jnp.asarray(layer, jnp.int32).reshape(()),
        jnp.asarray(pos, jnp.int32).reshape(()),
    ])
    if attn_sub_rows is None:
        attn_sub_rows = jnp.ones((L, 8, q_dim), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, H), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # qkv weight stack
            pl.BlockSpec(memory_space=pl.ANY),  # o weight stack
            pl.BlockSpec((1, 8, H), lambda i, s: (s[0], 0, 0)),  # input_ln
            pl.BlockSpec((1, 8, q_dim), lambda i, s: (s[0], 0, 0)),  # sub
            pl.BlockSpec((1, 8, n_q), lambda i, s: (s[0], 0, 0)),  # sq
            pl.BlockSpec((1, 8, n_h), lambda i, s: (s[0], 0, 0)),  # so
            pl.BlockSpec((8, D), lambda i, s: (0, 0)),  # cos
            pl.BlockSpec((8, D), lambda i, s: (0, 0)),  # sin
            pl.BlockSpec(memory_space=pl.ANY),  # k rows (all layers)
            pl.BlockSpec(memory_space=pl.ANY),  # v rows
        ],
        out_specs=[
            pl.BlockSpec((8, n_h), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nq, k4, tn_q), jnp.uint8),
            pltpu.VMEM((no, q4, tn_o), jnp.uint8),
            pltpu.VMEM((rt * tt * KV, D), jnp.bfloat16),  # k resident/ring
            pltpu.VMEM((rt * tt * KV, D), jnp.bfloat16),  # v resident/ring
            pltpu.VMEM((R, nt * tt * KV), jnp.float32),  # scores
            pltpu.VMEM((8, n_q), jnp.bfloat16),
            pltpu.VMEM((R, D), jnp.bfloat16),
            pltpu.VMEM((8, H), jnp.int8),
            pltpu.VMEM((8, 1), jnp.float32),
            pltpu.VMEM((8, q_dim), jnp.int8),
            pltpu.VMEM((8, 1), jnp.float32),
            pltpu.VMEM((8, D), jnp.bfloat16),  # knew staging
            pltpu.VMEM((8, D), jnp.bfloat16),  # vnew staging
            pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # k RMW window
            pltpu.VMEM((8 * KV, D), jnp.bfloat16),  # v RMW window
            pltpu.VMEM((R, D), jnp.float32),  # PV accumulator
            pltpu.SemaphoreType.DMA((nq,)),
            pltpu.SemaphoreType.DMA((no,)),
            pltpu.SemaphoreType.DMA((rt,)),
            pltpu.SemaphoreType.DMA((rt,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, ck2, cv2 = pl.pallas_call(
        functools.partial(
            _attn_megakernel_manual,
            dot_dtype=dot_dtype, eps=eps, norm2=norm2, nq=nq, no=no,
            tn_q=tn_q, tn_o=tn_o, nt=nt, tt=tt, q_dim=q_dim, n_kv=KV,
            n_heads=n_heads, head_dim=D, stacked=True, cache_rows=T * KV,
            ring=ring, vsm=vsm,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, n_h), out_dtype),
            jax.ShapeDtypeStruct(ck_flat.shape, ck_flat.dtype),
            jax.ShapeDtypeStruct(cv_flat.shape, cv_flat.dtype),
        ],
        input_output_aliases={10: 1, 11: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * H * n_q + 2 * 8 * q_dim * n_h
            + 4 * n_heads * head_dim * T,
            bytes_accessed=k4 * n_q + q4 * n_h + 4 * T * KV * D,
            transcendentals=R * T,
        ),
    )(scalars, h2, qkv_qw, o_qw,
      input_ln_rows.astype(jnp.float32), attn_sub_rows.astype(jnp.float32),
      qkv_scale_rows.astype(jnp.float32), o_scale_rows.astype(jnp.float32),
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32),
      ck_flat, cv_flat)
    return out[:b], ck2, cv2


def _mlp_megakernel_static(
    h_ref, hres_ref, gw_ref, dw_ref, nw1_ref, nw2_ref, sw1_ref, sw2_ref,
    o_ref, gu_ref, xq_ref, sx_ref, xq2_ref, sx2_ref,
    *, dot_dtype, eps, act, norm2, ngu, nd, tn_gu, tn_d, inter
):
    """MLP megakernel without scalar-prefetch (pre-split weights)."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _prologue_a():
        x = h_ref[:]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw1_ref[0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g < ngu)
    def _gateup_tile():
        acc = _planes_dot(xq_ref[:], gw_ref[:], dot_dtype)
        inv = 1.0 / (sx_ref[:] * sw1_ref[0:1, :])
        gu_ref[:, pl.ds(g * tn_gu, tn_gu)] = (
            acc.astype(jnp.float32) * inv
        ).astype(gu_ref.dtype)

    @pl.when(g == ngu)
    def _prologue_b():
        gu = gu_ref[:]
        gate, up = gu[:, :inter], gu[:, inter:]
        if act == "silu":
            x = _silu_mul(gate, up)
        else:
            x = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
        if norm2:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * nw2_ref[0:1, :].astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
        sx = 127.0 / absmax
        sx2_ref[:] = sx
        xq2_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    @pl.when(g >= ngu)
    def _down_tile():
        acc = _planes_dot(xq2_ref[:], dw_ref[:], dot_dtype)
        inv = 1.0 / (sx2_ref[:] * sw2_ref[0:1, :])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:] = hres_ref[:] + d


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "act",
                     "norm2"),
)
def mlp_block_megakernel_static(
    h: jax.Array,  # [..., H]
    gateup_qw_l: jax.Array,  # [H//4, 2I]
    down_qw_l: jax.Array,  # [I//4, H]
    gateup_scale_l: jax.Array,  # [8, 2I]
    down_scale_l: jax.Array,  # [8, H]
    post_ln_l: jax.Array,  # [8, H]
    ffn_sub_l: jax.Array | None,  # [8, I]
    *,
    eps: float = 1e-5,
    act: str = "relu2",
    norm2: bool = True,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    k4, n_gu = gateup_qw_l.shape
    i4, n_h = down_qw_l.shape
    k = 4 * k4
    inter = 4 * i4
    lead = h.shape[:-1]
    h2 = h.reshape(-1, k)
    b = h2.shape[0]
    tn_gu = _pick_tile_n(n_gu, want=int(os.environ.get("WF_MLP_TN_GU", "1792")))
    tn_d = _pick_tile_n(n_h, want=int(os.environ.get("WF_MLP_TN_D", "1792")))
    ngu, nd = n_gu // tn_gu, n_h // tn_d
    tb = min(_round_up(b, 8) if b <= 8 else _round_up(b, 32), 256)
    while tb > 32 and (
        tb * k * 2 * 2 + tb * n_gu * 2 + tb * k + tb * inter
        + 2 * (k4 * tn_gu + i4 * tn_d) + tb * tn_d * 4
        > 10 * 1024 * 1024
    ):
        tb //= 2
    b_pad = _round_up(b, tb)
    if b_pad != b:
        h2 = jnp.pad(h2, ((0, b_pad - b), (0, 0)))
    if ffn_sub_l is None:
        ffn_sub_l = jnp.ones((8, inter), jnp.float32)

    def _cd(g):
        return jnp.clip(g - ngu, 0, nd - 1)

    out = pl.pallas_call(
        functools.partial(
            _mlp_megakernel_static,
            dot_dtype=dot_dtype, eps=eps, act=act, norm2=norm2,
            ngu=ngu, nd=nd, tn_gu=tn_gu, tn_d=tn_d, inter=inter,
        ),
        grid=(b_pad // tb, ngu + nd),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, g: (i, 0)),
            pl.BlockSpec((tb, tn_d), lambda i, g: (i, _cd(g))),
            pl.BlockSpec((k4, tn_gu), lambda i, g: (0, jnp.minimum(g, ngu - 1))),
            pl.BlockSpec((i4, tn_d), lambda i, g: (0, _cd(g))),
            pl.BlockSpec((8, k), lambda i, g: (0, 0)),
            pl.BlockSpec((8, inter), lambda i, g: (0, 0)),
            pl.BlockSpec((8, tn_gu), lambda i, g: (0, jnp.minimum(g, ngu - 1))),
            pl.BlockSpec((8, tn_d), lambda i, g: (0, _cd(g))),
        ],
        out_specs=pl.BlockSpec((tb, tn_d), lambda i, g: (i, _cd(g))),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, n_gu), jnp.bfloat16),
            pltpu.VMEM((tb, k), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, inter), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n_gu + 2 * b_pad * inter * n_h,
            bytes_accessed=b_pad * k * 4 + k4 * n_gu + i4 * n_h + b_pad * n_h * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(h2, h2, gateup_qw_l, down_qw_l,
      post_ln_l.astype(jnp.float32), ffn_sub_l.astype(jnp.float32),
      gateup_scale_l.astype(jnp.float32), down_scale_l.astype(jnp.float32))
    return out[:b].reshape(*lead, n_h)


def _pick_tile_n(n: int, want: int = 1792) -> int:
    # larger tiles -> fewer grid iterations; per-iteration fixed cost is
    # first-order at batch-1 decode
    for cand in (want, 2560, 2304, 1792, 1536, 1280, 1024, 768, 512, 384, 256, 128):
        if cand <= want and n % cand == 0:
            return cand
    return n


def _mlp_megakernel_manual(
    l_ref, h_ref, gw_hbm, dw_hbm, nw1_ref, nw2_ref, sw1_ref, sw2_ref,
    o_ref, ring_gw, ring_dw, gu_ref, xq_ref, sx_ref, xq2_ref, sx2_ref,
    sem_gw, sem_dw,
    *, dot_dtype, eps, act, norm2, ngu, nd, tn_gu, tn_d, inter,
    depth, dring, dw_starts,
):
    """Manual-DMA software-pipelined MLP megakernel (batch-1 decode).

    One grid step managing its own weight-tile DMA rings instead of the
    auto-pipeliner (which is capped at double buffering and serializes
    the step-0 input fetch ahead of the first body). Measured on the 2B
    geometry (scripts/kernel_lab14.py, long 256/4096-step chain windows):
    19.2-21.7 us/layer at ring depth 5 vs 24.7-25.6 for the auto kernel
    — >=85% of the measured-achievable stream (ROOFLINE.md 18.16
    us/layer floor), past the >=80% target.

      - `depth`-deep gateup ring; the refill DMA targets the slot
        consumed in the PREVIOUS iteration (prefetch distance depth-1 <
        depth), so an in-flight copy never lands on the tile being read
      - down-tile DMAs staged at late gateup steps (`dw_starts`), ring
        `dring`; refills (nd > dring) issue inside the down loop at
        distance dring-1
      - prologue A (norm+quant) overlaps the warm-up stream, prologue B
        (act+sub-norm+quant) overlaps the down-tile stream

    Bit-exact with the auto `_mlp_megakernel`: identical tile sizes and
    per-tile math, only the data movement differs."""
    l = l_ref[0]

    def gw_dma(t):
        return pltpu.make_async_copy(
            gw_hbm.at[l, :, pl.ds(t * tn_gu, tn_gu)],
            ring_gw.at[t % depth], sem_gw.at[t % depth])

    def dw_dma(t):
        return pltpu.make_async_copy(
            dw_hbm.at[l, :, pl.ds(t * tn_d, tn_d)],
            ring_dw.at[t % dring], sem_dw.at[t % dring])

    # warm-up: fill depth-1 ring slots (the last slot stays free so
    # refills never target the tile being consumed)
    for t in range(min(depth - 1, ngu)):
        gw_dma(t).start()
    for t, s in enumerate(dw_starts):
        if s < 0:
            dw_dma(t).start(priority=1)

    # prologue A overlaps the warm-up stream
    x = h_ref[:]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    x = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * nw1_ref[0, 0:1, :].astype(x.dtype)
    xf = x.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx = 127.0 / absmax
    sx_ref[:] = sx
    xq_ref[:] = jnp.clip(jnp.round(xf * sx), -128, 127).astype(jnp.int8)

    # gateup tiles (static unroll: ngu is compile-time)
    for g in range(ngu):
        gw_dma(g).wait()
        # refill distance depth-1: targets slot (g-1)%depth, consumed
        # at iteration g-1 (never the live tile — ADVICE.md r2 race)
        if g + depth - 1 < ngu:
            gw_dma(g + depth - 1).start()
        for t, s in enumerate(dw_starts):
            if s == g:
                dw_dma(t).start()
        acc = _planes_dot(xq_ref[:], ring_gw[g % depth], dot_dtype)
        inv = 1.0 / (sx_ref[:] * sw1_ref[0, 0:1, g * tn_gu:(g + 1) * tn_gu])
        gu_ref[:, g * tn_gu:(g + 1) * tn_gu] = (
            acc.astype(jnp.float32) * inv
        ).astype(gu_ref.dtype)

    # prologue B overlaps the down-tile stream
    gu = gu_ref[:]
    gate, up = gu[:, :inter], gu[:, inter:]
    if act == "silu":
        xact = _silu_mul(gate, up)
    else:
        xact = jnp.square(jnp.maximum(gate, jnp.zeros_like(gate))) * up
    if norm2:
        xf = xact.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xact = (xf * jax.lax.rsqrt(var + eps)).astype(xact.dtype) \
            * nw2_ref[0, 0:1, :].astype(xact.dtype)
    xf = xact.astype(jnp.float32)
    absmax = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    sx2 = 127.0 / absmax
    sx2_ref[:] = sx2
    xq2_ref[:] = jnp.clip(jnp.round(xf * sx2), -128, 127).astype(jnp.int8)

    # down tiles + residual
    for g in range(nd):
        dw_dma(g).wait()
        t = g + dring - 1
        if t >= dring and t < nd:  # staged tiles covered slots 0..dring-1
            dw_dma(t).start()
        acc = _planes_dot(xq2_ref[:], ring_dw[g % dring], dot_dtype)
        inv = 1.0 / (sx2_ref[:] * sw2_ref[0, 0:1, g * tn_d:(g + 1) * tn_d])
        d = (acc.astype(jnp.float32) * inv).astype(o_ref.dtype)
        o_ref[:, g * tn_d:(g + 1) * tn_d] = h_ref[:, g * tn_d:(g + 1) * tn_d] + d


def _mlp_manual_call(
    lidx, h2, gateup_qw, down_qw, post_ln_rows, ffn_sub_rows,
    gateup_scale_rows, down_scale_rows,
    *, dot_dtype, eps, act, norm2, out_dtype, tn_gu, tn_d, depth, dring,
    dw_starts,
):
    """pallas_call wrapper for `_mlp_megakernel_manual` (tb == 8)."""
    L, k4, n_gu = gateup_qw.shape
    _, i4, n_h = down_qw.shape
    H = 4 * k4
    inter = 4 * i4
    tb = h2.shape[0]
    ngu, nd = n_gu // tn_gu, n_h // tn_d

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((tb, H), lambda i, l: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, H), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, inter), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, n_gu), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 8, n_h), lambda i, l: (l[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, n_h), lambda i, l: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((depth, k4, tn_gu), jnp.uint8),
            pltpu.VMEM((dring, i4, tn_d), jnp.uint8),
            pltpu.VMEM((tb, n_gu), jnp.bfloat16),
            pltpu.VMEM((tb, H), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, inter), jnp.int8),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((dring,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _mlp_megakernel_manual,
            dot_dtype=dot_dtype, eps=eps, act=act, norm2=norm2,
            ngu=ngu, nd=nd, tn_gu=tn_gu, tn_d=tn_d, inter=inter,
            depth=depth, dring=dring, dw_starts=dw_starts,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tb, n_h), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=15 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * tb * H * n_gu + 2 * tb * inter * n_h,
            # packed weights dominate; scale rows and activation
            # round-trips are the remainder
            bytes_accessed=(k4 * n_gu + i4 * n_h)
            + 4 * 8 * (n_gu + n_h + H + inter)
            + tb * (H * 2 + n_gu * 2 + inter + H),
            transcendentals=0,
        ),
    )(lidx, h2, gateup_qw, down_qw, post_ln_rows, ffn_sub_rows,
      gateup_scale_rows, down_scale_rows)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "dot_dtype", "interpret", "eps", "act", "norm2"),
)
def mlp_block_megakernel(
    h: jax.Array,  # [..., H] bf16 (pre-norm residual input)
    gateup_qw: jax.Array,  # [L, H//4, 2I] uint8
    down_qw: jax.Array,  # [L, I//4, H] uint8
    layer,
    gateup_scale_rows: jax.Array,  # [L, 8, 2I] f32
    down_scale_rows: jax.Array,  # [L, 8, H] f32
    post_ln_rows: jax.Array,  # [L, 8, H]
    ffn_sub_rows: jax.Array | None,  # [L, 8, I] (None = no sub-norm)
    *,
    eps: float = 1e-5,
    act: str = "relu2",  # relu2 | silu
    norm2: bool = True,  # apply ffn_sub RMS before down
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    """Residual MLP block as ONE kernel: h + down(act(gateup(norm(h)))).

    Replaces 2 pallas calls + 1 XLA residual fusion per layer with a
    single launch — at batch-1 decode the ~10 us fixed cost per launch
    rivals the arithmetic (RESULTS.md "kernel-count floor").
    """
    L, k4, n_gu = gateup_qw.shape
    _, i4, n_h = down_qw.shape
    k = 4 * k4
    inter = 4 * i4
    assert n_gu == 2 * inter and n_h == k, (gateup_qw.shape, down_qw.shape)
    lead = h.shape[:-1]
    h2 = h.reshape(-1, k)
    b = h2.shape[0]

    tn_gu = _pick_tile_n(n_gu, want=int(os.environ.get("WF_MLP_TN_GU", "1792")))
    tn_d = _pick_tile_n(n_h, want=int(os.environ.get("WF_MLP_TN_D", "1792")))
    ngu = n_gu // tn_gu
    nd = n_h // tn_d

    # decode rows ride in 8 sublanes (the VPU prologues — norm, act,
    # quant — scale with tb; 32 was 4x wasted work at batch 1)
    tb = min(_round_up(b, 8) if b <= 8 else _round_up(b, 32), 256)
    # VMEM: h + residual blocks (double-buffered), weight tiles, scratch
    while tb > 32 and (
        tb * k * 2 * 2 + tb * n_gu * 2 + tb * k + tb * inter
        + 2 * (k4 * tn_gu + i4 * tn_d) + tb * tn_d * 4
        > 10 * 1024 * 1024
    ):
        tb //= 2
    b_pad = _round_up(b, tb)
    if b_pad != b:
        h2 = jnp.pad(h2, ((0, b_pad - b), (0, 0)))
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    if ffn_sub_rows is None:
        ffn_sub_rows = jnp.ones((L, 8, inter), jnp.float32)

    # batch-1 decode: manual-DMA software pipeline (ring depth sized to
    # a VMEM budget; the auto pipeliner's double buffer starves the DMA
    # queue — see _mlp_megakernel_manual). Falls through to the auto
    # kernel off-TPU, in interpret mode, at serving batch, or when the
    # geometry leaves no room for a >=3-deep ring.
    if (
        os.environ.get("WF_MLP_MANUAL", "1") == "1"
        and not interpret
        and b_pad == tb == 8
        and ngu >= 2
        and jax.devices()[0].platform == "tpu"
    ):
        ring_budget = int(os.environ.get(
            "WF_MLP_RING_VMEM", str(10 * 1024 * 1024)))
        tn_d_m = tn_d
        for _ in range(2):
            nd_m = n_h // tn_d_m
            dring = min(3, nd_m) if nd_m > 2 else min(2, nd_m)
            depth = (ring_budget - dring * i4 * tn_d_m) // (k4 * tn_gu)
            depth = max(2, min(int(depth), int(os.environ.get(
                "WF_MLP_DEPTH", "5")), ngu))
            if depth >= 3:
                break
            smaller = _pick_tile_n_below(n_h, tn_d_m)
            if smaller >= tn_d_m:
                break
            tn_d_m = smaller
        if depth >= 3:
            n_staged = min(dring, nd_m)
            dw_starts = tuple(
                max(0, ngu - 2 * (n_staged - j)) for j in range(n_staged)
            )
            out = _mlp_manual_call(
                lidx, h2, gateup_qw, down_qw,
                post_ln_rows.astype(jnp.float32),
                ffn_sub_rows.astype(jnp.float32),
                gateup_scale_rows.astype(jnp.float32),
                down_scale_rows.astype(jnp.float32),
                dot_dtype=dot_dtype, eps=eps, act=act, norm2=norm2,
                out_dtype=out_dtype, tn_gu=tn_gu, tn_d=tn_d_m,
                depth=depth, dring=dring, dw_starts=dw_starts,
            )
            return out[:b].reshape(*lead, n_h)

    def _clip_d(g):
        return jnp.clip(g - ngu, 0, nd - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb, ngu + nd),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, g, l: (i, 0)),  # h (prologue A)
            pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _clip_d(g))),  # residual
            pl.BlockSpec(
                (1, k4, tn_gu), lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))
            ),
            pl.BlockSpec((1, i4, tn_d), lambda i, g, l: (l[0], 0, _clip_d(g))),
            pl.BlockSpec((1, 8, k), lambda i, g, l: (l[0], 0, 0)),  # post_ln
            pl.BlockSpec((1, 8, inter), lambda i, g, l: (l[0], 0, 0)),  # ffn_sub
            pl.BlockSpec(
                (1, 8, tn_gu), lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))
            ),
            pl.BlockSpec((1, 8, tn_d), lambda i, g, l: (l[0], 0, _clip_d(g))),
        ],
        out_specs=pl.BlockSpec((tb, tn_d), lambda i, g, l: (i, _clip_d(g))),
        scratch_shapes=[
            pltpu.VMEM((tb, n_gu), jnp.bfloat16),  # gu (bf16-rounded)
            pltpu.VMEM((tb, k), jnp.int8),  # xq (stage A)
            pltpu.VMEM((tb, 1), jnp.float32),  # sx
            pltpu.VMEM((tb, inter), jnp.int8),  # xq2 (stage B)
            pltpu.VMEM((tb, 1), jnp.float32),  # sx2
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _mlp_megakernel,
            dot_dtype=dot_dtype, eps=eps, act=act, norm2=norm2,
            ngu=ngu, nd=nd, tn_gu=tn_gu, tn_d=tn_d, inter=inter,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_h), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n_gu + 2 * b_pad * inter * n_h,
            bytes_accessed=b_pad * k * 4 + k4 * n_gu + i4 * n_h + b_pad * n_h * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, h2, h2, gateup_qw, down_qw,
      post_ln_rows.astype(jnp.float32), ffn_sub_rows.astype(jnp.float32),
      gateup_scale_rows.astype(jnp.float32), down_scale_rows.astype(jnp.float32))
    return out[:b].reshape(*lead, n_h)


def ternary_linear_pallas_stacked(
    x: jax.Array,
    qweight: jax.Array,  # [L, K4, N]
    weight_scale: jax.Array,  # [L]
    layer,
    *,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
    quant_axis: str | None = None,
) -> jax.Array:
    x_q, act_scale = quantize_activations(x, quant_axis=quant_axis)
    return ternary_matmul_pallas_stacked(
        x_q, qweight, layer, act_scale, weight_scale,
        out_dtype=out_dtype, dot_dtype=dot_dtype, interpret=interpret,
    )


def ternary_linear_pallas(
    x: jax.Array,
    qweight: jax.Array,
    weight_scale: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    dot_dtype=jnp.int8,
    interpret: bool = False,
    quant_axis: str | None = None,
) -> jax.Array:
    """Drop-in `linear_fn` for the model: act-quant + fused kernel."""
    x_q, act_scale = quantize_activations(x, quant_axis=quant_axis)
    return ternary_matmul_pallas(
        x_q,
        qweight,
        act_scale,
        weight_scale,
        out_dtype=out_dtype,
        dot_dtype=dot_dtype,
        interpret=interpret,
    )


def make_pallas_linear_fused(dot_dtype=None, interpret: bool = False,
                             mega: bool = None):
    """Fused-prologue stacked linear_fn (see ternary_matmul_stacked_fused):
    callable(h, qw_stack, scale_rows, layer, norm_w=None, act, norm, eps).
    `.prologue` marks it for the model's prologue-fused layer path;
    `.mlp_mega` (WF_MLP_MEGA, default on) additionally collapses the
    whole MLP block into one kernel (mlp_block_megakernel)."""
    import os

    if dot_dtype is None:
        dot_dtype = (
            jnp.bfloat16
            if os.environ.get("WF_PALLAS_DOT", "int8") == "bf16"
            else jnp.int8
        )
    if mega is None:
        mega = os.environ.get("WF_MLP_MEGA", "1") == "1"

    def linear_fn(h, qw_stack, scale_rows, layer, norm_w=None, *,
                  act="none", norm=True, eps=1e-5, out_dtype=jnp.bfloat16):
        return ternary_matmul_stacked_fused(
            h, qw_stack, layer, scale_rows, norm_w,
            eps=eps, act=act, norm=norm, out_dtype=out_dtype,
            dot_dtype=dot_dtype, interpret=interpret,
        )

    def mlp_mega_fn(h, gateup_qw, down_qw, layer, gateup_scale_rows,
                    down_scale_rows, post_ln_rows, ffn_sub_rows, *,
                    eps=1e-5, act="relu2", norm2=True):
        return mlp_block_megakernel(
            h, gateup_qw, down_qw, layer, gateup_scale_rows,
            down_scale_rows, post_ln_rows, ffn_sub_rows,
            eps=eps, act=act, norm2=norm2,
            dot_dtype=dot_dtype, interpret=interpret,
        )

    def attn_mega_fn(h, ck, cv, qkv_qw, o_qw, layer, pos, qkv_scale_rows,
                     o_scale_rows, input_ln_rows, attn_sub_rows, cos_row,
                     sin_row, *, q_dim, n_kv, n_heads, head_dim,
                     eps=1e-5, norm2=True):
        return attn_block_megakernel(
            h, ck, cv, qkv_qw, o_qw, layer, pos, qkv_scale_rows,
            o_scale_rows, input_ln_rows, attn_sub_rows, cos_row, sin_row,
            q_dim=q_dim, n_kv=n_kv, n_heads=n_heads, head_dim=head_dim,
            eps=eps, norm2=norm2, dot_dtype=dot_dtype, interpret=interpret,
        )

    def layer_mega_fn(h, ck, cv, qkv_qw, o_qw, gateup_qw, down_qw, layer,
                      pos, qkv_scale_rows, o_scale_rows, gateup_scale_rows,
                      down_scale_rows, input_ln_rows, attn_sub_rows,
                      post_ln_rows, ffn_sub_rows, cos_row, sin_row, *,
                      q_dim, n_kv, n_heads, head_dim, eps=1e-5,
                      act="relu2", norm2=True):
        return layer_block_megakernel(
            h, ck, cv, qkv_qw, o_qw, gateup_qw, down_qw, layer, pos,
            qkv_scale_rows, o_scale_rows, gateup_scale_rows,
            down_scale_rows, input_ln_rows, attn_sub_rows, post_ln_rows,
            ffn_sub_rows, cos_row, sin_row,
            q_dim=q_dim, n_kv=n_kv, n_heads=n_heads, head_dim=head_dim,
            eps=eps, act=act, norm2=norm2,
            dot_dtype=dot_dtype, interpret=interpret,
        )

    def attn_mega_static_fn(h, ck_l, cv_l, qkv_qw_l, o_qw_l, pos,
                            qkv_scale_l, o_scale_l, input_ln_l,
                            attn_sub_l, cos_row, sin_row, *, q_dim, n_kv,
                            n_heads, head_dim, eps=1e-5, norm2=True):
        return attn_block_megakernel_static(
            h, ck_l, cv_l, qkv_qw_l, o_qw_l, pos, qkv_scale_l, o_scale_l,
            input_ln_l, attn_sub_l, cos_row, sin_row,
            q_dim=q_dim, n_kv=n_kv, n_heads=n_heads, head_dim=head_dim,
            eps=eps, norm2=norm2, dot_dtype=dot_dtype, interpret=interpret,
        )

    def attn_mega_manual_fn(h, ck_flat, cv_flat, qkv_qw_l, o_qw_l, pos,
                            qkv_scale_l, o_scale_l, input_ln_l,
                            attn_sub_l, cos_row, sin_row, *, q_dim, n_kv,
                            n_heads, head_dim, tt, eps=1e-5, norm2=True):
        return attn_block_megakernel_manual(
            h, ck_flat, cv_flat, qkv_qw_l, o_qw_l, pos, qkv_scale_l,
            o_scale_l, input_ln_l, attn_sub_l, cos_row, sin_row,
            q_dim=q_dim, n_kv=n_kv, n_heads=n_heads, head_dim=head_dim,
            tt=tt, eps=eps, norm2=norm2, dot_dtype=dot_dtype,
        )

    def attn_mega_manual_stacked_fn(h, ck_flat, cv_flat, qkv_qw, o_qw,
                                    layer, pos, qkv_scale_rows,
                                    o_scale_rows, input_ln_rows,
                                    attn_sub_rows, cos_row, sin_row, *,
                                    T, q_dim, n_kv, n_heads, head_dim,
                                    tt, eps=1e-5, norm2=True):
        return attn_block_megakernel_manual_stacked(
            h, ck_flat, cv_flat, qkv_qw, o_qw, layer, pos,
            qkv_scale_rows, o_scale_rows, input_ln_rows, attn_sub_rows,
            cos_row, sin_row, T=T, q_dim=q_dim, n_kv=n_kv,
            n_heads=n_heads, head_dim=head_dim, tt=tt, eps=eps,
            norm2=norm2, dot_dtype=dot_dtype,
        )

    def mlp_mega_static_fn(h, gateup_qw_l, down_qw_l, gateup_scale_l,
                           down_scale_l, post_ln_l, ffn_sub_l, *,
                           eps=1e-5, act="relu2", norm2=True):
        return mlp_block_megakernel_static(
            h, gateup_qw_l, down_qw_l, gateup_scale_l, down_scale_l,
            post_ln_l, ffn_sub_l, eps=eps, act=act, norm2=norm2,
            dot_dtype=dot_dtype, interpret=interpret,
        )

    linear_fn.stacked = True
    linear_fn.prologue = True
    if mega:
        linear_fn.mlp_mega = mlp_mega_fn
        linear_fn.mlp_mega_static = mlp_mega_static_fn
        if os.environ.get("WF_ATTN_MEGA", "1") == "1":
            linear_fn.attn_mega = attn_mega_fn
            linear_fn.attn_mega_static = attn_mega_static_fn
            # manual-DMA variant (TPU only, batch-1, geometry-gated by
            # attn_manual_tile): ~3x faster than the auto kernel and
            # bit-exact against it (kernel_lab15)
            if (
                os.environ.get("WF_ATTN_MANUAL", "1") == "1"
                and not interpret
            ):
                linear_fn.attn_mega_manual = attn_mega_manual_fn
                linear_fn.attn_mega_manual_stacked = (
                    attn_mega_manual_stacked_fn
                )
            # measured SLOWER than the attn+mlp pair on v5e (4.18 vs
            # 3.56 ms/token — 4 concurrent weight streams overflow VMEM
            # double-buffering); keep opt-in for future tuning
            if os.environ.get("WF_LAYER_MEGA", "0") == "1":
                linear_fn.layer_mega = layer_mega_fn
    return linear_fn


def make_pallas_linear_stacked(dot_dtype=None, interpret: bool = False):
    """Stacked-weights linear_fn: signature (x, qw_stack [L,K4,N],
    scale_stack [L], layer, ...). The .stacked attribute tells the model
    layer-scan to pass the whole stack + index (no per-layer copies)."""
    if dot_dtype is None:
        import os

        dot_dtype = (
            jnp.bfloat16
            if os.environ.get("WF_PALLAS_DOT", "int8") == "bf16"
            else jnp.int8
        )

    def linear_fn(x, qw_stack, scale_stack, layer, out_dtype=jnp.bfloat16,
                  quant_axis=None):
        return ternary_linear_pallas_stacked(
            x, qw_stack, scale_stack, layer, out_dtype=out_dtype,
            dot_dtype=dot_dtype, interpret=interpret, quant_axis=quant_axis,
        )

    linear_fn.stacked = True
    return linear_fn


def make_pallas_linear(dot_dtype=None, interpret: bool = False):
    if dot_dtype is None:
        import os

        dot_dtype = (
            jnp.bfloat16
            if os.environ.get("WF_PALLAS_DOT", "int8") == "bf16"
            else jnp.int8
        )
    def linear_fn(x, qweight, scale, out_dtype=jnp.bfloat16, quant_axis=None):
        return ternary_linear_pallas(
            x, qweight, scale, out_dtype=out_dtype, dot_dtype=dot_dtype,
            interpret=interpret, quant_axis=quant_axis,
        )

    return linear_fn
