"""Memory-bandwidth / roofline reporter.

TPU analog of the reference's memory profiler (reference
legacy/benchmark/memory_profiler.py:1-78 — achieved GB/s vs theoretical
max and utilization %). Batch-1 ternary decode is HBM-bandwidth bound
(SURVEY.md §7 "GEMV roofline at batch 1"), so the headline number for
every kernel is % of peak HBM bandwidth; compute-bound shapes report
% of peak MXU throughput instead.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

# Peak specs per chip (public figures). bf16 FLOP/s, int8 OP/s, HBM B/s.
TPU_SPECS: Dict[str, Dict[str, float]] = {
    "v5e": {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_bw": 819e9, "hbm_gb": 16},
    "v5p": {"bf16_flops": 459e12, "int8_ops": 918e12, "hbm_bw": 2765e9, "hbm_gb": 95},
    "v4": {"bf16_flops": 275e12, "int8_ops": 275e12, "hbm_bw": 1228e9, "hbm_gb": 32},
    "v6e": {"bf16_flops": 918e12, "int8_ops": 1836e12, "hbm_bw": 1640e9, "hbm_gb": 32},
    "cpu": {"bf16_flops": 1e12, "int8_ops": 2e12, "hbm_bw": 50e9, "hbm_gb": 64},
}


def detect_chip(device=None) -> str:
    """Map a jax device to a TPU_SPECS key."""
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key in ("v6e", "v5p", "v5e", "v4"):
        if key in kind or key.replace("v", "v ") in kind:
            return key
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    return "cpu"


def device_memory_stats(device=None) -> Dict[str, float]:
    """Live HBM usage from the runtime (bytes)."""
    if device is None:
        import jax

        device = jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": float(stats.get("bytes_in_use", 0)),
        "bytes_limit": float(stats.get("bytes_limit", 0)),
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
    }


def ternary_matmul_traffic(batch: int, k: int, n: int) -> Dict[str, float]:
    """HBM bytes and integer ops for one packed-ternary matmul.

    Weights stream 2-bit packed (k*n/4 bytes — the whole point of the
    format), activations int8 in, bf16 out.
    """
    bytes_w = k * n / 4
    bytes_x = batch * k  # int8
    bytes_o = batch * n * 2  # bf16
    return {
        "bytes": bytes_w + bytes_x + bytes_o,
        "flops": 2.0 * batch * k * n,
    }


@dataclasses.dataclass
class RooflinePoint:
    name: str
    time_ms: float
    gbytes_per_s: float
    gflops: float
    bw_utilization: float  # fraction of peak HBM bandwidth
    compute_utilization: float  # fraction of peak int8 throughput
    bound: str  # "memory" | "compute"

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


def roofline(
    name: str,
    time_s: float,
    bytes_moved: float,
    flops: float,
    chip: Optional[str] = None,
    compute_key: str = "int8_ops",
) -> RooflinePoint:
    """Score one measured kernel against the chip's roofline."""
    spec = TPU_SPECS[chip or detect_chip()]
    achieved_bw = bytes_moved / time_s
    achieved_fl = flops / time_s
    # which wall does the IDEAL kernel hit first at this arithmetic intensity?
    t_mem = bytes_moved / spec["hbm_bw"]
    t_cmp = flops / spec[compute_key]
    return RooflinePoint(
        name=name,
        time_ms=time_s * 1e3,
        gbytes_per_s=achieved_bw / 1e9,
        gflops=achieved_fl / 1e9,
        bw_utilization=achieved_bw / spec["hbm_bw"],
        compute_utilization=achieved_fl / spec[compute_key],
        bound="memory" if t_mem >= t_cmp else "compute",
    )


def decode_step_traffic(cfg, batch: int = 1, context: int = 512) -> Dict[str, float]:
    """HBM traffic of one full decode step of the model: all packed
    weights once + KV history + embeddings row + logits matmul."""
    H, I, Q, KV = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim, cfg.kv_dim
    L, V = cfg.num_layers, cfg.vocab_size
    w_bytes = L * (H * Q + 2 * H * KV + Q * H + 2 * H * I + I * H) / 4
    kv_bytes = L * batch * context * KV * 2 * 2  # K+V bf16
    logits_bytes = V * H * 2  # tied embedding matmul, bf16
    flops = 2.0 * batch * (
        L * (H * Q + 2 * H * KV + Q * H + 2 * H * I + I * H) + V * H
    ) + 4.0 * batch * L * context * Q
    return {"bytes": w_bytes + kv_bytes + logits_bytes, "flops": flops}


def speed_of_light_toks(cfg, batch: int = 1, context: int = 512, chip: Optional[str] = None) -> float:
    """Upper bound on decode tok/s/chip: HBM-bandwidth-limited time for
    one step (the TPU analog of the reference's 93-164 tok/s
    'kernel-only theoretical', notebook.md:946-948)."""
    spec = TPU_SPECS[chip or detect_chip()]
    t = decode_step_traffic(cfg, batch, context)["bytes"] / spec["hbm_bw"]
    return batch / t
