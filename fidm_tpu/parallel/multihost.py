"""Multi-host (pod / DCN) initialization and per-process data slicing.

The reference has no distributed story (SURVEY.md §2). For multi-host TPU
pods: `jax.distributed.initialize` connects the processes, meshes span all
global devices, and each host feeds only its local shard of the global batch
(`host_local_slice`), which `jax.make_array_from_process_local_data`
assembles into the globally-sharded array.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

__all__ = ["initialize", "launched_by_env", "host_local_slice",
           "global_batch", "is_primary", "barrier"]

# environment markers set by the standard multi-host launchers (TPU pod
# runtime, GKE/JobSet) that jax.distributed.initialize() can auto-configure
# from with no explicit arguments
_LAUNCHER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)
# launchers that also need evidence of MORE THAN ONE task: a bare
# SLURM_JOB_ID inside `salloc`/sbatch (single task) must stay a no-op —
# jax's cluster detection would crash or hang there
_LAUNCHER_SIZE_VARS = ("SLURM_STEP_NUM_TASKS", "SLURM_NTASKS",
                       "OMPI_COMM_WORLD_SIZE")


def launched_by_env() -> bool:
    """True when a recognized MULTI-process launcher environment is present.

    Single-process environments (plain shells, salloc with one task,
    single-worker TPU VMs) must return False so `initialize()` stays a
    no-op there. TPU_WORKER_HOSTNAMES in particular is set even on
    SINGLE-host TPU runtimes (this axon host exports
    `TPU_WORKER_HOSTNAMES=localhost`) — only a multi-entry list is pod
    evidence; presence alone once made every auto-detecting caller crash
    in jax.distributed.initialize (a real bug the cli.train wiring
    exposed)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if any(v in os.environ for v in _LAUNCHER_ENV_VARS):
        return True
    for v in _LAUNCHER_SIZE_VARS:
        try:
            if int(os.environ.get(v, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Connect this process to the pod. Returns True if distributed init ran.

    Three modes:
    - explicit args -> `jax.distributed.initialize(addr, n, id)`;
    - no args under a recognized launcher env (TPU pod runtime / SLURM /
      MPI, see `_LAUNCHER_ENV_VARS`) -> no-arg auto-detected
      `jax.distributed.initialize()`;
    - no args, no launcher env -> single-process no-op (returns False).
    """
    if num_processes is not None:
        if num_processes <= 1:
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if launched_by_env():
        jax.distributed.initialize()
        return True
    return False


def host_local_slice(global_index: np.ndarray,
                     global_batch_size: Optional[int] = None) -> np.ndarray:
    """This process's slice of a global example-index array.

    Without `global_batch_size`: the contiguous 1/process_count slice
    (dataset partitioning, order across batches irrelevant).

    With `global_batch_size` B: the PER-BATCH slice — the order is viewed
    as consecutive global batches of B and this process takes rows
    [i*B/n, (i+1)*B/n) of each. Assembled with `global_batch` over a mesh
    whose data-axis device order follows process index (the
    `jax.devices()` default), every global batch then has EXACTLY the
    composition and row order a single-process run would produce — the
    property the multi-process loss-parity test anchors
    (tests/test_multihost_train.py). A ragged tail short of a full global
    batch is dropped (multi-process feeding implies drop_last)."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size is None:
        per = len(global_index) // n
        return global_index[i * per : (i + 1) * per]
    B = int(global_batch_size)
    if B % n:
        raise ValueError(
            f"global batch size {B} must divide by process count {n}")
    local = B // n
    nb = len(global_index) // B
    arr = np.asarray(global_index)[: nb * B].reshape(nb, B)
    return arr[:, i * local : (i + 1) * local].reshape(-1)


def is_primary() -> bool:
    """True on the process that owns singleton host-side effects
    (checkpoint directory surgery, metadata/marker writes, logging)."""
    return jax.process_index() == 0


def barrier(tag: str) -> None:
    """Cross-process sync point; single-process no-op.

    Used around checkpoint-directory mutations so no process reads or
    writes a path while the primary renames it (training/checkpoint.py's
    crash-safe overwrite protocol)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def global_batch(local_arrays, mesh: Mesh, sharding: NamedSharding):
    """Assemble per-host local batch arrays into a global sharded array."""
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        local_arrays,
    )
