"""Multi-host / multi-slice initialization helpers.

One real comm surface exists in this model family (data-parallel
all-reduce; see bflow_tpu/parallel/mesh.py). Scaling beyond one host is
therefore: initialize the JAX distributed runtime, build the global data
mesh over all devices, and feed each host its own shard of the global
batch — XLA routes gradient reductions over ICI within a slice and DCN
across slices automatically for a 1-D data axis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-ops (returns False) for single-process runs so the same entry
    point works everywhere. TPU pod environments usually need no
    explicit arguments (they come from the metadata server / env).
    """
    env_says_multiprocess = any(
        k in os.environ
        for k in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not (coordinator_address or env_says_multiprocess or num_processes):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_batch_slice(global_batch_size: int) -> slice:
    """The index range of the global batch this host should load."""
    n_proc = jax.process_count()
    assert global_batch_size % n_proc == 0, (global_batch_size, n_proc)
    per = global_batch_size // n_proc
    idx = jax.process_index()
    return slice(idx * per, (idx + 1) * per)


def is_primary_host() -> bool:
    """Rank-zero guard for logging/checkpoint upload."""
    return jax.process_index() == 0
