"""Transport/HBM health calibration for benchmark artifacts.

Every published serving artifact is stamped with a ~10 s measurement of
(a) the dispatch->fetch round-trip latency of this session's transport
and (b) the achievable weight-stream rate of a touch-only Pallas kernel
using the production MLP tile pattern (the kernel_lab11 calibration,
ROOFLINE.md). A degraded tunnel day is then self-labeling: a slow
serving row next to a healthy stamp means the engine regressed; next to
a degraded stamp it means the transport did (VERDICT r2 item 4 — the
r2 prefill-heavy artifact recorded 4.2k tok/s with no way to tell).

Known-good values on this v5e tunnel (RESULTS.md / ROOFLINE.md):
round-trip ~30 ms, stream ~18.2 us/layer (731 GB/s). The `healthy`
verdict uses generous bounds (round-trip < 60 ms, stream < 25 us/layer)
so only genuine degradation trips it.

Run standalone: ``python -m wrinklefree_tpu.bench.calibrate`` prints one
JSON line.
"""

from __future__ import annotations

import functools
import json
import time

# production-geometry constants (BitNet-2B MLP, ROOFLINE.md)
_HEALTHY_RT_MS = 60.0
_HEALTHY_STREAM_US = 25.0
_REF_STREAM_US = 18.16  # measured-achievable (kernel_lab11, long windows)


def measure_transport_rt_ms(n: int = 10) -> float:
    """Min dispatch->fetch round trip of a trivial program (ms)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def measure_stream_us_per_layer(windows=(64, 512), reps: int = 3):
    """Touch-only kernel with the production MLP tile pattern: chain
    slope over `windows` steps (short windows suffice for a +-20%
    health signal; the authoritative number is kernel_lab11's long
    windows). Returns (us_per_layer, gb_per_s) or (None, None) off-TPU.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.devices()[0].platform not in ("tpu",):
        return None, None
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..config import BitNetConfig

    cfg = BitNetConfig.bitnet_2b()
    L = cfg.num_layers
    H, inter = cfg.hidden_size, cfg.intermediate_size
    k4, i4 = H // 4, inter // 4
    n_gu, n_h = 2 * inter, H
    tn_gu, tn_d = 1536, 1280
    ngu, nd = n_gu // tn_gu, n_h // tn_d
    layer_bytes = k4 * n_gu + i4 * n_h

    # int8 (not uint8): Mosaic has no uint8->f32 cast for the touch body
    rng = np.random.default_rng(0)
    gw = jnp.asarray(rng.integers(-127, 127, size=(L, k4, n_gu), dtype=np.int8))
    dw = jnp.asarray(rng.integers(-127, 127, size=(L, i4, n_h), dtype=np.int8))

    def _kernel(l_ref, h_ref, gw_ref, dw_ref, o_ref, acc_ref, *, ngu, nd):
        del l_ref
        g = pl.program_id(1)

        @pl.when(g < ngu)
        def _gu():
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

    def touch(h, w, l):
        gw_, dw_ = w
        lidx = jnp.asarray(l, jnp.int32).reshape(1)
        return pl.pallas_call(
            functools.partial(_kernel, ngu=ngu, nd=nd),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=1, bytes_accessed=layer_bytes, transcendentals=0),
        )(lidx, h, gw_, dw_)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(h, w, steps):
        def step(h, l):
            return touch(h, w, l % L), None

        h, _ = jax.lax.scan(step, h, jnp.arange(steps, dtype=jnp.int32))
        return h

    h0 = jnp.ones((8, 128), jnp.float32)
    w = (gw, dw)

    def t(n):
        t0 = time.perf_counter()
        np.asarray(chain(h0, w, n))
        return time.perf_counter() - t0

    n1, n2 = windows
    t(n1)
    t(n2)  # compile both
    slope = min((t(n2) - t(n1)) / (n2 - n1) for _ in range(reps))
    return slope * 1e6, layer_bytes / slope / 1e9


def calibrate() -> dict:
    """Full health stamp. Keys: transport_rt_ms, stream_us_per_layer,
    stream_gb_s, stream_ref_us, healthy, platform."""
    import jax

    plat = jax.devices()[0].platform
    rt = measure_transport_rt_ms()
    us, gbs = measure_stream_us_per_layer()
    healthy = rt < _HEALTHY_RT_MS and (us is None or us < _HEALTHY_STREAM_US)
    return {
        "platform": plat,
        "transport_rt_ms": round(rt, 2),
        "stream_us_per_layer": None if us is None else round(us, 2),
        "stream_gb_s": None if gbs is None else round(gbs, 1),
        "stream_ref_us": _REF_STREAM_US,
        "healthy": bool(healthy),
    }


if __name__ == "__main__":
    print(json.dumps(calibrate()))
