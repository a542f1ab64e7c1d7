"""Multi-host (pod / DCN) initialization and per-process data slicing.

The reference has no distributed story (SURVEY.md §2). For multi-host TPU
pods: `jax.distributed.initialize` connects the processes, meshes span all
global devices, and each host feeds only its local shard of the global batch
(`host_local_slice`), which `jax.make_array_from_process_local_data`
assembles into the globally-sharded array.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

__all__ = ["initialize", "host_local_slice", "global_batch"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the pod (no-op if single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_slice(global_index: np.ndarray) -> np.ndarray:
    """This process's contiguous slice of a global example-index array."""
    n = jax.process_count()
    i = jax.process_index()
    per = len(global_index) // n
    return global_index[i * per : (i + 1) * per]


def global_batch(local_arrays, mesh: Mesh, sharding: NamedSharding):
    """Assemble per-host local batch arrays into a global sharded array."""
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        local_arrays,
    )
