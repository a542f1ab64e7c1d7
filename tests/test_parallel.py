"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.parallel import (
    batch_sharding,
    create_mesh,
    fsdp_param_specs,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["fsdp"] == 1
    mesh2 = create_mesh(data=4, fsdp=2)
    assert mesh2.shape == {"data": 4, "fsdp": 2}


def test_batch_sharded_across_devices():
    mesh = create_mesh()
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["image"].addressable_shards]
    assert all(s == (2, 8, 8, 3) for s in shard_shapes)
    assert len(shard_shapes) == 8


def test_fsdp_param_specs_shard_large_tensors():
    mesh = create_mesh(data=4, fsdp=2)
    params = {
        "big": jnp.zeros((64, 128)),
        "small": jnp.zeros((4,)),
        "odd": jnp.zeros((7, 13)),  # no divisible axis
    }
    specs = fsdp_param_specs(params, mesh, min_size=64)
    assert "fsdp" in tuple(specs["big"])
    assert tuple(specs["small"]) == ()
    assert tuple(specs["odd"]) == ()


def test_sharded_matmul_all_reduce():
    """Data-parallel mean over the mesh equals the host computation."""
    mesh = create_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def mean_sq(a):
        return jnp.mean(a**2)

    assert float(mean_sq(xs)) == pytest.approx(float(np.mean(x**2)), rel=1e-6)


def test_graft_dryrun_multichip():
    """The driver's multichip validation path: full sharded train step."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
