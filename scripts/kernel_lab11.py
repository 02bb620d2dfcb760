#!/usr/bin/env python
"""Lab 11: pure weight-stream calibration for the MLP megakernel.

lab10 measured the MLP megakernel at 24.5 us/layer vs a 16.2 us floor
computed from v5e PEAK HBM bandwidth (819 GB/s). But peak is not
achievable by ANY real kernel; this lab measures the best case for the
same tile pattern: a kernel whose body does (almost) nothing, so the
slope is pure DMA stream time + per-tile pipeline overhead. That number
— not 819 GB/s — is the honest denominator for kernel efficiency
(BASELINE's >=85%-of-roofline target).

Variants (same grid/BlockSpecs as mlp_block_megakernel tiles-big):
  stream-mlp  : gateup+down packed tiles (13.27 MB/layer), touch-only body
  stream-1buf : the same bytes as ONE flat [K4, N] tensor in a single
                progression (no stage switch) — isolates the two-stage
                grid's cost
Run: python scripts/kernel_lab11.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wrinklefree_tpu.config import BitNetConfig

    cfg = BitNetConfig.bitnet_2b()
    L = cfg.num_layers
    H, inter = cfg.hidden_size, cfg.intermediate_size
    k4, i4 = H // 4, inter // 4
    n_gu, n_h = 2 * inter, H
    tn_gu, tn_d = 2304, 2560
    ngu, nd = n_gu // tn_gu, n_h // tn_d

    rng = np.random.default_rng(0)
    gw = jnp.asarray(rng.integers(-127, 127, size=(L, k4, n_gu), dtype=np.int8))
    dw = jnp.asarray(rng.integers(-127, 127, size=(L, i4, n_h), dtype=np.int8))
    h0 = jnp.ones((8, 128), jnp.float32)

    # --- stream-mlp: same two-stage tile walk, touch-only -----------------
    def _kernel(l_ref, h_ref, gw_ref, dw_ref, o_ref, acc_ref, *, ngu, nd):
        del l_ref
        g = pl.program_id(1)

        @pl.when(g < ngu)
        def _gu():
            # touch one lane per sublane so the DMA cannot be elided
            acc_ref[:] += gw_ref[0, :8, :128].astype(jnp.float32)

        @pl.when(g >= ngu)
        def _d():
            acc_ref[:] += dw_ref[0, :8, :128].astype(jnp.float32)

        @pl.when(g == ngu + nd - 1)
        def _out():
            o_ref[:] = h_ref[:] + acc_ref[:]

    def _cd(g):
        return jnp.clip(g - ngu, 0, nd - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, ngu + nd),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, g, l: (0, 0)),
            pl.BlockSpec((1, k4, tn_gu),
                         lambda i, g, l: (l[0], 0, jnp.minimum(g, ngu - 1))),
            pl.BlockSpec((1, i4, tn_d), lambda i, g, l: (l[0], 0, _cd(g))),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, g, l: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )

    def call_mlp(h, w, l):
        gw_, dw_ = w
        lidx = jnp.asarray(l, jnp.int32).reshape(1)
        return pl.pallas_call(
            functools.partial(_kernel, ngu=ngu, nd=nd),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=1, bytes_accessed=k4 * n_gu + i4 * n_h,
                transcendentals=0,
            ),
        )(lidx, h, gw_, dw_)

    # --- stream-1buf: one flat tensor, same total bytes -------------------
    flat_n = n_gu + (i4 * n_h) // k4  # [k4, flat_n] == same bytes
    fw = jnp.asarray(
        rng.integers(-127, 127, size=(L, k4, flat_n), dtype=np.int8))
    tn_f = 2304
    nf = flat_n // tn_f if flat_n % tn_f == 0 else None
    if nf is None:
        # pad to a multiple
        pad = tn_f - flat_n % tn_f
        fw = jnp.pad(fw, ((0, 0), (0, 0), (0, pad)))
        flat_n += pad
        nf = flat_n // tn_f

    def _kernel1(l_ref, h_ref, fw_ref, o_ref, acc_ref, *, nf):
        del l_ref
        g = pl.program_id(1)
        acc_ref[:] += fw_ref[0, :8, :128].astype(jnp.float32)

        @pl.when(g == nf - 1)
        def _out():
            o_ref[:] = h_ref[:] + acc_ref[:]

    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nf),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, g, l: (0, 0)),
            pl.BlockSpec((1, k4, tn_f), lambda i, g, l: (l[0], 0, g)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, g, l: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )

    def call_1buf(h, w, l):
        (fw_,) = w
        lidx = jnp.asarray(l, jnp.int32).reshape(1)
        return pl.pallas_call(
            functools.partial(_kernel1, nf=nf),
            grid_spec=grid_spec1,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=1, bytes_accessed=k4 * flat_n, transcendentals=0,
            ),
        )(lidx, h, fw_)

    def measure(tag, call, weights, nbytes):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(h, w, steps):
            def step(h, l):
                return call(h, w, l % L), None

            h, _ = jax.lax.scan(step, h, jnp.arange(steps, dtype=jnp.int32))
            return h

        def run(n):
            np.asarray(chain(h0, weights, n))

        def t(n):
            t0 = time.perf_counter()
            run(n)
            return time.perf_counter() - t0

        n1, n2 = 256, 4096  # long windows (see lab10/lab12 jitter note)
        run(n1); run(n2)
        s = min((t(n2) - t(n1)) / (n2 - n1) for _ in range(3))
        gb = nbytes / 1e9
        bw = gb / s
        print(f"{tag:12s}: {s*1e6:7.2f} us/layer  {gb*1e3:.2f} MB  "
              f"-> {bw:6.1f} GB/s ({bw/819*100:4.1f}% of peak)", flush=True)

    measure("stream-mlp", call_mlp, (gw, dw), k4 * n_gu + i4 * n_h)
    measure("stream-1buf", call_1buf, (fw,), k4 * flat_n)


if __name__ == "__main__":
    main()
