"""Multi-host process-group initialization and global mesh construction.

The TPU replacement for the reference's no-op distributed layer
(reference extern/vllm-cpu-stub .../parallel_state.py:67-75 —
`init_distributed_environment(backend="gloo")` does nothing; SURVEY.md
§5.8). Here: `jax.distributed.initialize()` forms the real process group
(coordinator discovery from env / TPU metadata), and meshes are laid out
so the model axis stays INSIDE a host's ICI domain while data/expert
axes may cross hosts over DCN — collectives then ride the fast links
(scaling-book recipe: mesh + shardings, XLA inserts collectives).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the multi-host process group; returns (pid, nprocs).

    No-op on a single process (the common dev case). On TPU pods with no
    explicit args, jax.distributed discovers the coordinator from the TPU
    metadata server; on other fleets set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (or pass them here).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    explicit = coordinator_address and num_processes is not None
    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if explicit or on_tpu_pod:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:  # already initialized
            logger.info("jax.distributed: %s", e)
    pid = jax.process_index()
    n = jax.process_count()
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                pid, n, jax.local_device_count(), jax.device_count())
    return pid, n


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    *,
    axis_names: Tuple[str, str] = ("data", "model"),
):
    """Mesh over ALL devices (all hosts), model axis innermost so TP
    collectives stay on intra-host ICI; the data axis spans hosts (DCN).

    Defaults: tp = local device count (one TP group per host),
    dp = total/tp.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    total = devices.size
    if tp is None:
        tp = jax.local_device_count()
    if dp is None:
        dp = total // tp
    if dp * tp != total:
        raise ValueError(f"dp*tp = {dp}*{tp} != {total} devices")
    return Mesh(devices.reshape(dp, tp), axis_names)
