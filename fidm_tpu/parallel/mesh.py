"""Device-mesh and sharding utilities.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed /
NCCL anywhere; device handling is `cuda-if-available` at
`scripts/train.py:178`). Parallelism is therefore a TPU-native *addition*:
single-program multi-data over a `jax.sharding.Mesh`, with XLA inserting the
gradient all-reduce / collectives over ICI.

Axes:
  - "data": batch (data-parallel) sharding for train and eval sampling.
  - "fsdp": optional parameter sharding axis (ZeRO-style) for models too
    large to replicate.
  - "model": optional tensor-parallel axis (Megatron column/row sharding of
    the UNet channel dims — see `parallel/tp.py`); only present when
    requested so existing 2-axis meshes are unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "auto_mesh",
    "batch_sharding",
    "replicated",
    "fsdp_param_specs",
    "shard_params",
    "shard_batch",
]


def create_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    model: int = 1,
) -> Mesh:
    """Create a (data[, fsdp][, model]) mesh over the available devices.

    `data=None` uses all remaining devices on the data axis. ICI-adjacent
    devices stay adjacent on the *innermost* axes, so the chatty collectives
    (per-block TP psums on "model", param all-gathers on "fsdp") ride the
    shortest torus links and the per-step gradient all-reduce on "data"
    takes the long hops. The "model" axis is only materialized when
    model > 1, keeping 2-axis meshes (and their cache keys) unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (fsdp * model)
    assert data * fsdp * model == n, (
        f"mesh {data}x{fsdp}x{model} != {n} devices"
    )
    if model > 1:
        arr = np.asarray(devices).reshape(data, fsdp, model)
        return Mesh(arr, ("data", "fsdp", "model"))
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def auto_mesh(batch_size: int, fsdp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh whose data axis is the largest device count dividing batch_size.

    Avoids sharding errors for small batches (e.g. batch 2 on 8 devices
    uses only 2 devices on the data axis)."""
    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // fsdp
    data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return create_mesh(data=data, fsdp=fsdp,
                       devices=devices[: data * fsdp])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data (and fsdp, if present) axes."""
    if "fsdp" in mesh.axis_names and mesh.shape["fsdp"] > 1:
        return NamedSharding(mesh, P(("data", "fsdp")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_specs(params, mesh: Mesh, min_size: int = 2**18):
    """ZeRO-3-style parameter partition specs.

    Each tensor above `min_size` elements is sharded along its largest
    axis divisible by the fsdp axis size; everything else is replicated.
    """
    n = mesh.shape.get("fsdp", 1)

    def spec_for(x):
        if n <= 1 or x.size < min_size:
            return P()
        # prefer the largest divisible axis (usually the conv IO channel)
        order = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for axis in order:
            if x.shape[axis] % n == 0:
                spec = [None] * x.ndim
                spec[axis] = "fsdp"
                return P(*spec)
        return P()

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(params, mesh: Mesh, use_fsdp: bool = False, min_size: int = 2**18):
    """Place params on the mesh: replicated, or fsdp-sharded when requested."""
    if use_fsdp:
        specs = fsdp_param_specs(params, mesh, min_size)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(params, shardings), specs
    return jax.device_put(params, replicated(mesh)), jax.tree_util.tree_map(
        lambda _: P(), params
    )


def shard_batch(batch, mesh: Mesh, spatial: bool = False,
                spatial_axis: str = "model"):
    """Put a host batch (pytree of arrays) onto the mesh, batch-dim sharded.

    With `spatial=True`, NHWC image-like leaves (ndim >= 4) additionally
    shard their H dimension over `spatial_axis` (GSPMD spatial
    partitioning — see `tp.spatial_sharding`); lower-rank leaves (labels,
    timesteps) stay batch-sharded only. This is the input layout for
    spatially-partitioned *training* (`make_train_step(spatial=True)`):
    conv halo exchanges and their transposes in the backward pass are
    inserted by XLA's SPMD partitioner, so the train step itself is
    unchanged. Leaves whose H is not divisible by the axis size fall back
    to batch-only sharding (correct, just not spatially parallel)."""
    bs = batch_sharding(mesh)
    if not spatial or mesh.shape.get(spatial_axis, 1) <= 1:
        return jax.device_put(batch, bs)
    b_spec = bs.spec[0] if len(bs.spec) else None
    n = mesh.shape[spatial_axis]

    def put(x):
        if getattr(x, "ndim", 0) >= 4 and x.shape[1] % n == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(b_spec, spatial_axis)))
        return jax.device_put(x, bs)

    return jax.tree_util.tree_map(put, batch)
