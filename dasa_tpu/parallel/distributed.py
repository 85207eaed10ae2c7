"""Multi-host runtime plumbing.

Replaces the reference's launcher-environment discovery — OMPI rank env
vars + nvidia-smi GPU assignment (tasks/R2R/distributed.py:7-93) and the
Philly cluster host-file parsing (tasks/R2R/distenv.py:92-131) — with
the JAX process runtime: on TPU pods `jax.distributed.initialize()`
auto-discovers the coordinator from the TPU metadata; elsewhere it reads
the standard COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars
(also accepting OMPI/SLURM spellings for MPI-style launchers).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _env_int(*names: str) -> Optional[int]:
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return int(v)
    return None


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime (idempotent; single-process
    runs are a no-op)."""
    if num_processes is None:
        num_processes = _env_int("NUM_PROCESSES", "JAX_NUM_PROCESSES",
                                 "OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS")
    if process_id is None:
        process_id = _env_int("PROCESS_ID", "JAX_PROCESS_ID",
                              "OMPI_COMM_WORLD_RANK", "SLURM_PROCID")
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")

    if num_processes in (None, 1) and coordinator_address is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def is_primary() -> bool:
    """Rank-0 check for checkpoint writes / logging
    (the reference's local_rank in (-1, 0) gates,
    nav_dic_pretrain.py:366-382)."""
    return jax.process_index() == 0


def barrier(name: str = "sync") -> None:
    """Global device barrier (replaces torch.distributed.barrier around
    data prep, nav_dic_pretrain.py:795-855)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
