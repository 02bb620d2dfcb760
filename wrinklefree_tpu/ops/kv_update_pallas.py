"""In-place paged-KV write kernel (Pallas, input_output_aliases).

XLA lowers the advanced-indexing scatter `pool.at[l, page, off].set(v)` on
a multi-GB pool to a full-buffer copy (~112 ms/step measured for a 2.5 GB
pool on v5e-class hardware — it dominated decode). This kernel aliases
the pool in/out and DMAs ONLY the touched token rows, so the update is
truly in place regardless of how the surrounding program uses the buffer.

Mosaic DMA regions must be (8, 128)-aligned for bf16, so pools store KV
heads padded up to a multiple of 8 sublanes (`kv_pad`); physically the
TPU tiled HBM layout pads to those boundaries anyway, so the explicit
padding costs nothing new. The TPU analog of the reference's C++ paged-KV
scatter (reference sgl-kernel C++ KV cache, SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kv_pad(kv: int, mult: int = 8) -> int:
    return -(-kv // mult) * mult


def _kv_write_kernel(rows_ref, vals_ref, pool_in_ref, pool_out_ref, sem, *, m):
    """One grid program per layer: start all m row-DMAs, then wait —
    keeps m copies in flight instead of paying DMA latency serially."""
    l = pl.program_id(0)
    base = l * m

    def _copy(j):
        return pltpu.make_async_copy(
            vals_ref.at[base + j],           # [KVp, D] row in HBM
            pool_out_ref.at[rows_ref[base + j]],  # destination row
            sem.at[j],
        )

    def start(j, c):
        _copy(j).start()
        return c

    jax.lax.fori_loop(0, m, start, 0)

    def wait(j, c):
        _copy(j).wait()
        return c

    jax.lax.fori_loop(0, m, wait, 0)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=('rows_per_program',))
def kv_write_pallas(
    pool: jax.Array,  # [LP, ps, KVp, D] (layer-flattened pages)
    vals: jax.Array,  # [N, KVp, D] rows to write (KVp % 8 == 0)
    flat_ids: jax.Array,  # [N] int32 flat page ids
    offsets: jax.Array,  # [N] int32 slot within page
    rows_per_program: int = 64,
) -> jax.Array:
    """pool[flat_ids[i], offsets[i]] = vals[i], in place (pool donated)."""
    n, kvp, d = vals.shape
    assert kvp % 8 == 0 and d % 128 == 0, (kvp, d)  # Mosaic DMA tile alignment
    lp, ps = pool.shape[0], pool.shape[1]
    rows = (flat_ids * ps + offsets).astype(jnp.int32)  # [N] flat row index
    pool_rows = pool.reshape(lp * ps, kvp, d)
    # grid over groups of m rows; m in-flight DMAs per program
    m = rows_per_program
    while n % m:
        m //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((m,))],
    )
    out = pl.pallas_call(
        functools.partial(_kv_write_kernel, m=m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool_rows.shape, pool.dtype),
        input_output_aliases={2: 0},  # pool operand -> output (in-place)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(rows, vals, pool_rows)
    return out.reshape(pool.shape)


def paged_kv_update(pool, vals, page_ids, offsets, layer_stride: int):
    """Write [L, B, S, KVp, D] vals into a [L, P, ps, KVp, D] pool in place.

    page_ids/offsets are [B, S] (per-token); layer l writes page
    `page_ids + l*layer_stride` of the layer-flattened pool view.
    """
    L = vals.shape[0]
    B, S = page_ids.shape
    kvp, d = vals.shape[-2], vals.shape[-1]
    ps = pool.shape[2]
    flat_pool = pool.reshape(L * layer_stride, ps, kvp, d)
    flat_ids = (
        page_ids[None] + (jnp.arange(L) * layer_stride)[:, None, None]
    ).reshape(-1)
    flat_offs = jnp.broadcast_to(offsets[None], (L, B, S)).reshape(-1)
    flat_vals = vals.reshape(L * B * S, kvp, d)
    out = kv_write_pallas(flat_pool, flat_vals, flat_ids.astype(jnp.int32),
                          flat_offs.astype(jnp.int32))
    return out.reshape(pool.shape)
