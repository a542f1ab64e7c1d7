"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import os
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


# ----------------------------------------------------------- multihost glue

def test_multihost_initialize_single_process_noop(monkeypatch):
    from fidm_tpu.parallel import multihost

    for v in (multihost._LAUNCHER_ENV_VARS + multihost._LAUNCHER_SIZE_VARS
              + ("TPU_WORKER_HOSTNAMES",)):
        monkeypatch.delenv(v, raising=False)
    assert multihost.initialize() is False
    assert multihost.initialize(num_processes=1) is False
    assert multihost.launched_by_env() is False


def test_multihost_launcher_env_detection(monkeypatch):
    from fidm_tpu.parallel import multihost

    for v in (multihost._LAUNCHER_ENV_VARS + multihost._LAUNCHER_SIZE_VARS
              + ("SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES")):
        monkeypatch.delenv(v, raising=False)
    # a bare SLURM_JOB_ID (salloc shell, single task) must NOT trigger
    # distributed init — jax cluster detection would crash or hang there
    monkeypatch.setenv("SLURM_JOB_ID", "12345")
    assert multihost.launched_by_env() is False
    # single-worker TPU runtimes export TPU_WORKER_HOSTNAMES=localhost
    # (this very host does): presence alone is NOT pod evidence — jax's
    # auto-detect then dies on a missing coordinator address (real bug,
    # caught when cli.train started auto-initializing)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.launched_by_env() is False
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert multihost.launched_by_env() is True
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    assert multihost.launched_by_env() is False
    # multi-task evidence does
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert multihost.launched_by_env() is True
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert multihost.launched_by_env() is False
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert multihost.launched_by_env() is True


def test_multihost_global_batch_assembly():
    """Single-process `make_array_from_process_local_data` over the virtual
    8-device mesh: local data == global array, sharded across devices."""
    from fidm_tpu.parallel.multihost import global_batch, host_local_slice

    mesh = create_mesh()
    sharding = batch_sharding(mesh)
    local = {"image": np.arange(16 * 2, dtype=np.float32).reshape(16, 2),
             "mask": np.ones((16, 1), np.float32)}
    g = global_batch(local, mesh, sharding)
    assert g["image"].shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(g["image"]), local["image"])
    assert len(g["image"].addressable_shards) == 8
    assert all(s.data.shape == (2, 2) for s in g["image"].addressable_shards)
    # single process owns the whole index set
    idx = np.arange(10)
    np.testing.assert_array_equal(host_local_slice(idx), idx)


def test_pipeline_fsdp_sharded_eval_sampling():
    """Eval sampling with ZeRO-3-sharded params on a (data=4, fsdp=2) mesh:
    the model's large tensors live sharded, XLA all-gathers inside the
    compiled sampler, and the result preserves known pixels exactly."""
    import jax.numpy as jnp

    from fidm_tpu.models import UNetConfig
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    mesh = create_mesh(data=4, fsdp=2)
    cfg = PipelineConfig(
        unet=UNetConfig(image_size=16, in_channels=9, model_channels=32,
                        out_channels=6, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16,
                        dtype=jnp.float32),
        schedule="linear", num_timesteps=50,
        sampler=SamplerConfig(method="ddim", num_steps=4, eta=0.0),
    )
    with mesh:
        pipe = InpaintingPipeline.create(cfg, mesh=mesh, fsdp_params=True,
                                         fsdp_min_size=1024)
        # at least one large tensor must actually be sharded over fsdp
        sharded = [
            v for v in jax.tree_util.tree_leaves(pipe.variables["params"])
            if "fsdp" in tuple(v.sharding.spec)
        ]
        assert sharded, "no parameter was fsdp-sharded"
        rng = np.random.default_rng(0)
        gt = np.clip(rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
                     * 0.4, -1, 1)
        mask = np.zeros((8, 16, 16, 1), np.float32)
        mask[:, 4:12, 4:12] = 1.0
        out = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(0)))
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    assert np.isfinite(out).all()


_MH_WORKER = '''
import sys
sys.path.insert(0, {repo!r})
import jax
# the axon sitecustomize force-registers the TPU backend and IGNORES the
# JAX_PLATFORMS env var; pin CPU via the config API before backend init
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
from fidm_tpu.parallel import multihost
ok = multihost.initialize(coordinator_address="127.0.0.1:" + port,
                          num_processes=2, process_id=pid)
assert ok is True
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = np.array(jax.devices())
assert len(devs) == 2, devs  # one local CPU device per process
mesh = Mesh(devs, ("data",))
sharding = NamedSharding(mesh, P("data"))
local = np.full((1, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local)
# replicated output forces a cross-process all-reduce over the DCN (gloo)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
val = float(jax.device_get(total.addressable_data(0)))
assert val == 12.0, val  # 4*1 + 4*2, summed across BOTH processes
print("PSUM_OK", pid, val, flush=True)
'''


def test_multihost_two_process_distributed_smoke(tmp_path):
    """Actually initialize the DCN path: two CPU processes connect through
    multihost.initialize (coordinator + worker), assert process/device
    counts, and run a cross-process all-reduce (VERDICT r2 item 9 — the
    only previously-untested branch in the parallel layer)."""
    import socket
    import subprocess
    import sys as _sys

    worker = tmp_path / "mh_worker.py"
    worker.write_text(_MH_WORKER.format(repo="/root/repo"))
    with socket.socket() as s:  # free port, released before the race window
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["XLA_FLAGS"] = ""  # drop the 8-virtual-device forcing: 1 dev/proc
    procs = [subprocess.Popen(
        [_sys.executable, str(worker), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PSUM_OK {i} 12.0" in out, out
