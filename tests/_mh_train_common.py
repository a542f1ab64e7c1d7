"""Shared train->checkpoint->restart->resume routine for the multi-process
parity test (tests/test_multihost_train.py).

Run identically by the 2-process distributed workers and by the
single-process reference; the test asserts loss-history and final-parameter
parity between the two. Everything is deterministic: synthetic data keyed
by example index, seeded shuffle, fixed PRNG keys.
"""
import numpy as np


class SynthInpaintDataset:
    """Deterministic synthetic dataset: item i derives from rng(i)."""

    def __init__(self, n: int, size: int = 16):
        self.n = n
        self.size = size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        S = self.size
        rng = np.random.default_rng(1000 + i)
        img = np.clip(rng.standard_normal((S, S, 3)), -1, 1).astype(np.float32)
        mask = np.zeros((S, S, 1), np.float32)
        mask[S // 4 : 3 * S // 4, S // 4 : 3 * S // 4] = 1.0
        return {"image": img, "masked_image": img * (1 - mask), "mask": mask}


def run_training(ckpt_dir: str, mesh) -> dict:
    """2 epochs -> checkpoint -> 'restart' (fresh manager + restore) ->
    1 more epoch. Returns {"history": [...], "resumed": [...],
    "param_sum": float} — identical across process topologies when batch
    assembly preserves global batch composition/order."""
    import jax
    import jax.numpy as jnp

    from fidm_tpu.data.dataset import DataLoader
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.training import (CheckpointManager, FitConfig, TrainState,
                                   fit, make_eval_step, make_optimizer,
                                   make_train_step)
    from fidm_tpu.training.lr import make_lr_schedule

    S = 16
    cfg = UNetConfig(image_size=S, in_channels=9, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, dtype=jnp.float32)
    sched = DiffusionSchedule.create("linear", 50)
    model = InpaintingUNet(cfg)

    ds = SynthInpaintDataset(16, S)
    # GLOBAL batch size 4; under 2 processes each host feeds 2 rows/step
    train_loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                              drop_last=True)
    val_loader = DataLoader(SynthInpaintDataset(4, S), batch_size=4)

    b0 = ds[0]
    variables = model.init(jax.random.PRNGKey(0),
                           b0["image"][None], np.zeros((1,), np.int32),
                           b0["masked_image"][None], b0["mask"][None])
    tx = make_optimizer(make_lr_schedule("none", 1e-3, 100, 0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    # donate=False: the first step consumes host-resident (auto-replicated)
    # state; donation of an uncommitted input is unsafe
    train_step = make_train_step(sched, mesh=mesh, donate=False)
    eval_step = make_eval_step(sched, mesh=mesh)

    quiet = FitConfig(num_epochs=2, log_fn=lambda *a, **k: None,
                      handle_preemption=False)
    mgr = CheckpointManager(ckpt_dir, keep_last_n=3)
    state, history = fit(state, train_step, eval_step, train_loader,
                         val_loader, jax.random.PRNGKey(7), quiet,
                         checkpoint_manager=mgr, mesh=mesh)
    mgr.close()

    # ---- restart: fresh manager, restore latest, resume one more epoch
    mgr2 = CheckpointManager(ckpt_dir, keep_last_n=3)
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=a.sharding), state)
    restored, meta = mgr2.restore("latest", abstract)
    assert meta["epoch"] == 1, meta
    # the resumed loader must continue the shuffle sequence (fit handles
    # loader.epoch); fresh loaders emulate the restarted process
    train_loader2 = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                               drop_last=True)
    val_loader2 = DataLoader(SynthInpaintDataset(4, S), batch_size=4)
    resumed_cfg = FitConfig(num_epochs=3, log_fn=lambda *a, **k: None,
                            handle_preemption=False)
    state2, resumed = fit(restored, train_step, eval_step, train_loader2,
                          val_loader2, jax.random.PRNGKey(7), resumed_cfg,
                          checkpoint_manager=mgr2, mesh=mesh,
                          start_epoch=meta["epoch"] + 1)
    mgr2.close()

    param_sum = float(jax.device_get(
        jax.jit(lambda p: sum(jnp.sum(jnp.abs(x))
                              for x in jax.tree_util.tree_leaves(p)),
                out_shardings=None)(state2.params)))
    return {"history": history, "resumed": resumed, "param_sum": param_sum}
