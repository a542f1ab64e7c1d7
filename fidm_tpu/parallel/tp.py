"""Tensor parallelism (Megatron-style) for the inpainting UNet.

The reference is strictly single-device (SURVEY.md §2: no distributed code
of any kind), so — like data/FSDP parallelism in `mesh.py` — this layer is a
TPU-native *addition*, expressed the GSPMD way: partition specs on the
parameter tree and nothing else. XLA's SPMD partitioner propagates the
shardings through the jitted train/sampling programs and inserts the
collectives (one psum per ResBlock / attention pair) over ICI. No manual
collectives, no model rewrite, and the same programs run unsharded when the
mesh has no "model" axis.

Why TP at all for a 500 MB UNet: batch-parallel sampling scales throughput
but leaves single-sample latency pinned to one chip's speed. Sharding the
*channel* dimension over k chips divides the per-forward FLOPs per chip,
which is the only mesh layout that cuts the latency floor of a single
256x256 inpainting request (serving ladder batch-1 programs) or of very
large UNet variants.

Sharding pattern per ResBlock (the Megatron column/row pairing,
arXiv:1909.08053 §3, mapped from MLPs onto convs):

  in_conv   kernel [3,3,I,O]  -> O sharded  ("column-parallel": each device
                                  computes a channel slice of h)
  emb_proj  kernel [E,O|2O]   -> output sharded (adds onto the sharded h)
  out_norm  scale/bias [O]    -> sharded. GroupNorm32 statistics stay
                                  shard-local when each device's channel
                                  slice is a whole number of groups, i.e.
                                  (O/k) divisible by (O/32) <=> k | 32 —
                                  true for every practical mesh; otherwise
                                  GSPMD falls back to a cross-device reduce,
                                  still exact.
  out_conv  kernel [3,3,O,C]  -> input sharded ("row-parallel"): the conv
                                  contracts the sharded channel axis, XLA
                                  psums the partial outputs; bias replicated.

Attention blocks: qkv kernel [C,3C] output-sharded, proj kernel [C,C]
input-sharded (bias replicated) — the classic attention column/row pair.
Everything else (time embed, first/last convs, skip convs, up/down convs)
is replicated; activations are replicated at every block boundary.

NOTE (real multi-chip TPU): the Pallas attention kernel is an opaque custom
call that the SPMD partitioner cannot split; trace TP programs under the
scoped XLA-attention override — `with ops.registry.pallas_override(False,
"attention"): step(...)` (InpaintingPipeline(tp_params=True) does this
around its own jit calls). Attention is ~0.2% of a UNet step here
(BENCH.md), so nothing is lost.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_specs", "tp_shard_params", "spatial_sharding"]

# param names inside a ResBlock / AttentionBlock (models/layers.py) and the
# kernel axis each shards: -1 = output channels, else the input-channel axis
_COLUMN_MODULES = ("in_conv", "emb_proj", "qkv")   # output-sharded
_ROW_MODULES = ("out_conv", "proj")                # kernel input-sharded
_NORM_MODULES = ("out_norm",)                      # affine over sharded h


def _names(path) -> tuple:
    return tuple(getattr(k, "key", str(k)) for k in path)


def tp_param_specs(params, mesh: Mesh, axis: str = "model"):
    """Megatron column/row PartitionSpecs for a UNet parameter tree.

    Tensors whose shard axis is not divisible by the mesh axis size are
    replicated (correct, just less parallel). Returns a pytree of
    PartitionSpec matching `params`.
    """
    n = mesh.shape.get(axis, 1)

    def spec_for(path, x):
        names = _names(path)
        if n <= 1:
            return P()
        leaf = names[-1]

        def shard(a):
            if x.shape[a] % n:
                return P()
            s = [None] * x.ndim
            s[a] = axis
            return P(*s)

        # block-internal mid-norm affine (…/<block>/out_norm/GroupNorm_0/
        # {scale,bias}) acts on the column-sharded h — shard it; the
        # top-level final norm (base/out_norm/…, index 1) normalizes the
        # replicated output stream and stays replicated
        if leaf in ("scale", "bias") and any(
                m in names[2:-1] for m in _NORM_MODULES):
            return shard(0)
        if len(names) < 4:
            # top-level modules (time_embed, in_0_conv, base out_conv,
            # label_emb) stay replicated: their activations are the
            # replicated block-boundary streams
            return P()
        mod = names[-2]
        if mod in _COLUMN_MODULES:
            return shard(x.ndim - 1)  # kernel O axis; bias is 1-D -> O too
        if mod in _ROW_MODULES and leaf == "kernel":
            return shard(x.ndim - 2)  # contracting (input-channel) axis
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(p, x) for p, x in flat]
    )


def tp_shard_params(params, mesh: Mesh, axis: str = "model",
                    fsdp_min_size: Optional[int] = None):
    """Place `params` on the mesh TP-sharded; returns (params, specs).

    If `fsdp_min_size` is given and the mesh has an fsdp axis > 1, tensors
    the TP rules leave replicated are additionally ZeRO-sharded along the
    fsdp axis (TP takes precedence where both apply).
    """
    specs = tp_param_specs(params, mesh, axis)
    if fsdp_min_size is not None and mesh.shape.get("fsdp", 1) > 1:
        from .mesh import fsdp_param_specs

        fsdp = fsdp_param_specs(params, mesh, fsdp_min_size)
        specs = jax.tree_util.tree_map(
            lambda t, f: t if tuple(t) else f, specs, fsdp,
            is_leaf=lambda x: isinstance(x, P),
        )
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings), specs


def spatial_sharding(mesh: Mesh, axis: str = "model",
                     shard_batch: bool = True) -> NamedSharding:
    """Shard NHWC image batches along H over a mesh axis (GSPMD spatial
    partitioning: XLA inserts conv halo exchanges automatically).

    The second latency-scaling layout: where TP divides channels, this
    divides pixels — the natural choice for large images (512²+), where
    per-shard spatial tiles stay MXU-friendly. Params stay replicated.
    With `shard_batch` the batch dim additionally shards over the
    data(+fsdp) axes, matching `mesh.batch_sharding`.
    """
    if not shard_batch:
        return NamedSharding(mesh, P(None, axis))
    b_axes = (
        ("data", "fsdp") if mesh.shape.get("fsdp", 1) > 1 else "data"
    )
    return NamedSharding(mesh, P(b_axes, axis))
