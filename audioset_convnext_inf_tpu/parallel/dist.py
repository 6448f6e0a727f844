"""Multi-host bootstrap.

The TPU analog of utils/idr_torch.py:8-23 (SLURM env -> NCCL rendezvous):
``jax.distributed.initialize`` wires all hosts of a slice into one runtime;
after it returns, ``jax.devices()`` spans the full slice and every mesh in
:mod:`parallel.mesh` is automatically global. SLURM variables are honored
when present so sbatch-style launches keep working.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-host runtime if running in a multi-process job.

    Resolution order: explicit args -> SLURM env (SLURM_NTASKS/PROCID,
    node list head as coordinator) -> single-process no-op. Returns True if
    distributed mode was initialized.
    """
    import jax

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", os.environ.get("SLURM_NODELIST", ""))
            head = _slurm_head_node(nodelist) if nodelist else "127.0.0.1"
            port = 12345 + int(os.environ.get("SLURM_JOBID", "0")) % 10000
            coordinator_address = f"{head}:{port}"

    if not num_processes or num_processes <= 1:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _slurm_head_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist.

    Handles plain names (incl. dashes: 'tpu-vm-3'), comma lists, and
    bracketed ranges: 'node[001-004,007]' -> 'node001',
    'gpu-a[01-04]' -> 'gpu-a01'.
    """
    import re

    m = re.match(r"([^\[,]+)\[([^\]]+)\]", nodelist)
    if m:
        prefix, ranges = m.groups()
        first = ranges.split(",")[0].split("-")[0]
        return prefix + first
    return nodelist.split(",")[0]


def is_primary() -> bool:
    """rank-0 gating for logging/checkpointing (reference main.py:287,747)."""
    import jax

    return jax.process_index() == 0
