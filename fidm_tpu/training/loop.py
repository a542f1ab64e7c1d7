"""High-level training loop: epochs, validation, checkpointing, early stop.

Host-side orchestration mirroring the reference main loop
(`scripts/train.py:173-363` and `train_inpainting.py:15-131`) — but every
per-batch operation is one jitted, mesh-sharded XLA program (see
train_state.py), and batches stream through the threaded loader + device
prefetcher so the TPU never waits on PIL.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import numpy as np

from ..parallel.mesh import batch_sharding
from .early_stopping import EarlyStopping

__all__ = ["train_epoch", "validate", "fit", "FitConfig"]


def _device_batches(loader, mesh):
    from ..data.prefetch import device_prefetch

    sharding = batch_sharding(mesh) if mesh is not None else None
    arrays_only = (
        {k: b[k] for k in ("image", "masked_image", "mask")} for b in loader
    )
    return device_prefetch(arrays_only, size=2, sharding=sharding)


def train_epoch(state, train_step, loader, key, mesh=None, log_every=50,
                log_fn=print):
    """One epoch; returns (state, mean_loss). Loss is fetched asynchronously
    (only the final mean forces a sync, unlike the reference's per-step
    `loss.item()` at `train_inpainting.py:68`)."""
    losses = []
    start = time.time()
    n = 0
    for batch in _device_batches(loader, mesh):
        state, metrics = train_step(state, batch, key)
        losses.append(metrics["loss"])
        n += 1
        if log_every and n % log_every == 0:
            log_fn(
                f"  step {n}: loss={float(np.mean(jax.device_get(losses[-log_every:]))):.5f} "
                f"({(time.time()-start)/n:.3f}s/step)"
            )
    mean_loss = float(np.mean(jax.device_get(losses))) if losses else float("nan")
    return state, mean_loss


def validate(state, eval_step, loader, key, mesh=None):
    """Validation mean loss (`train_inpainting.py:82-131`)."""
    losses = []
    for i, batch in enumerate(_device_batches(loader, mesh)):
        losses.append(eval_step(state, batch, jax.random.fold_in(key, i))["loss"])
    return float(np.mean(jax.device_get(losses))) if losses else float("nan")


@dataclass
class FitConfig:
    num_epochs: int = 10
    early_stopping_patience: int = 0  # 0 = disabled
    early_stopping_min_delta: float = 0.0
    keep_last_n: int = 3
    log_fn: Callable = print


def fit(
    state,
    train_step,
    eval_step,
    train_loader,
    val_loader,
    key,
    cfg: FitConfig,
    checkpoint_manager=None,
    mesh=None,
    start_epoch: int = 0,
    metadata: Optional[dict] = None,
):
    """Full fit loop: per-epoch train -> validate -> checkpoint -> early stop.

    Returns (state, history). History entries: {epoch, train_loss, val_loss,
    seconds}.
    """
    stopper = (
        EarlyStopping(cfg.early_stopping_patience, cfg.early_stopping_min_delta)
        if cfg.early_stopping_patience > 0
        else None
    )
    history = []
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        ekey = jax.random.fold_in(key, epoch)
        state, train_loss = train_epoch(
            state, train_step, train_loader, ekey, mesh, log_fn=cfg.log_fn
        )
        val_loss = validate(state, eval_step, val_loader,
                            jax.random.fold_in(ekey, 10_000), mesh)
        dt = time.time() - t0
        history.append(
            {"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss,
             "seconds": dt}
        )
        cfg.log_fn(
            f"epoch {epoch}: train={train_loss:.5f} val={val_loss:.5f} ({dt:.1f}s)"
        )
        if checkpoint_manager is not None:
            meta = dict(metadata or {})
            meta.update({"epoch": epoch, "train_loss": train_loss})
            is_best = checkpoint_manager.save(
                epoch, state, metadata=meta, val_loss=val_loss
            )
            if is_best:
                cfg.log_fn(f"  new best (val={val_loss:.5f})")
        if stopper is not None:
            stop, best_params = stopper.update(val_loss, state.params)
            if stop:
                cfg.log_fn(f"early stopping at epoch {epoch}")
                state = state.replace(params=best_params)
                break
    return state, history
