"""Multi-host initialization & helpers.

The reference's multi-node story is torchrun + SLURM env plumbing + NCCL/RCCL
NIC pinning (reference: cluster_utilities/LUMI/start_multinode_job_inside_env.sh:17-40,
sge_tools/python:27-32). On TPU none of that exists: each host runs the same
program, `jax.distributed.initialize()` discovers the coordinator from the
TPU runtime metadata (or explicit env), XLA compiles the collectives, and ICI
/DCN routing is automatic. These helpers wrap the few host-level concerns
that remain.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. No-op for single-process runs.

    On Cloud TPU pods, call with no arguments — everything is discovered.
    Elsewhere (e.g. CPU fleets), pass coordinator/num_processes/process_id or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and "TPU_WORKER_HOSTNAMES" not in os.environ:
        if num_processes in (None, 1):
            logger.info("single-process run; skipping jax.distributed.initialize")
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_barrier(tag: str = "barrier"):
    """All-host sync (replaces torch.distributed.barrier in data prep)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
