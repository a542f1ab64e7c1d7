"""High-level training loop: epochs, validation, checkpointing, early stop.

Host-side orchestration mirroring the reference main loop
(`scripts/train.py:173-363` and `train_inpainting.py:15-131`) — but every
per-batch operation is one jitted, mesh-sharded XLA program (see
train_state.py), and batches stream through the threaded loader + device
prefetcher so the TPU never waits on PIL.
"""
from __future__ import annotations

import contextlib
import signal
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import numpy as np

from ..parallel.mesh import batch_sharding
from .early_stopping import EarlyStopping

__all__ = ["train_epoch", "validate", "fit", "FitConfig", "GracefulShutdown"]


class GracefulShutdown:
    """Cooperative SIGTERM/SIGINT handling for preemptible TPU workers.

    The reference has no preemption story (SURVEY §5: no elasticity); on
    TPU pods preemption is routine. The first signal only sets a flag that
    the training loop checks between steps — the in-flight jitted step
    completes, `fit` saves an emergency checkpoint, and returns cleanly so
    `--resume latest` continues after rescheduling. A second signal falls
    through to a hard KeyboardInterrupt.
    """

    def __init__(self):
        self.requested = False
        self._orig = {}

    def __enter__(self):
        import threading

        # signal.signal only works on the main thread; degrade to a no-op
        # flag holder elsewhere (fit() in a worker thread keeps working,
        # just without preemption handling)
        if threading.current_thread() is not threading.main_thread():
            return self
        for sig in (signal.SIGTERM, signal.SIGINT):
            self._orig[sig] = signal.signal(sig, self._handle)
        return self

    def _handle(self, signum, frame):
        if self.requested:
            raise KeyboardInterrupt(f"second signal {signum}: hard stop")
        self.requested = True

    def __exit__(self, *exc):
        for sig, handler in self._orig.items():
            signal.signal(sig, handler)
        return False


def _device_batches(loader, mesh, threaded: bool = False):
    from ..data.prefetch import ThreadedLoader, device_prefetch

    sharding = batch_sharding(mesh) if mesh is not None else None
    keys = ("image", "masked_image", "mask", "label")

    def gen():
        for b in loader:
            yield {k: b[k] for k in keys if k in b}

    # threaded=True moves the loader's CPU work (PIL decode, mask raster,
    # stacking) onto a background thread so the dispatch thread never
    # waits on it — the raw-directory feed-rate fix for multi-core hosts
    # (packed shards remain the recommended path; on a 1-core host this
    # only adds queue hops). Batch CONTENT is identical either way
    # (tests/test_training.py::test_threaded_loader_identical_results).
    src = ThreadedLoader(gen, queue_size=4) if threaded else gen()
    if mesh is not None and jax.process_count() > 1:
        # multi-process feeding: each host's loader yields its LOCAL slice
        # of the global batch (DataLoader(process_local=True) — fit() flips
        # it automatically) and `make_array_from_process_local_data`
        # assembles the globally-sharded batch. device_prefetch's plain
        # device_put would mis-place an already-global array, so assembly
        # replaces it here (the make_array path stages asynchronously
        # itself).
        from ..parallel.multihost import global_batch

        return (global_batch(b, mesh, sharding) for b in src)
    return device_prefetch(src, size=2, sharding=sharding)


def train_epoch(state, train_step, loader, key, mesh=None, log_every=50,
                log_fn=print, should_stop: Optional[Callable] = None,
                threaded: bool = False):
    """One epoch; returns (state, mean_loss). Loss is fetched asynchronously
    (only the final mean forces a sync, unlike the reference's per-step
    `loss.item()` at `train_inpainting.py:68`). `should_stop()` is checked
    between steps (preemption, see GracefulShutdown)."""
    losses = []
    start = time.time()
    n = 0
    for batch in _device_batches(loader, mesh, threaded):
        state, metrics = train_step(state, batch, key)
        losses.append(metrics["loss"])
        n += 1
        if log_every and n % log_every == 0:
            log_fn(
                f"  step {n}: loss={float(np.mean(jax.device_get(losses[-log_every:]))):.5f} "
                f"({(time.time()-start)/n:.3f}s/step)"
            )
        if should_stop is not None and should_stop():
            break
    mean_loss = float(np.mean(jax.device_get(losses))) if losses else float("nan")
    return state, mean_loss


def validate(state, eval_step, loader, key, mesh=None, threaded: bool = False):
    """Validation mean loss (`train_inpainting.py:82-131`)."""
    losses = []
    for i, batch in enumerate(_device_batches(loader, mesh, threaded)):
        losses.append(eval_step(state, batch, jax.random.fold_in(key, i))["loss"])
    return float(np.mean(jax.device_get(losses))) if losses else float("nan")


@dataclass
class FitConfig:
    num_epochs: int = 10
    early_stopping_patience: int = 0  # 0 = disabled
    early_stopping_min_delta: float = 0.0
    log_fn: Callable = print
    # catch SIGTERM/SIGINT, checkpoint, and return cleanly (TPU preemption)
    handle_preemption: bool = True
    # decode/stack batches on a background thread (ThreadedLoader) — for
    # raw-directory datasets on multi-core hosts; identical batch content
    threaded_loader: bool = False


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
    if mesh is not None and jax.process_count() > 1:
        # multi-process wiring (VERDICT r4 weak #6): each host must feed
        # only its slice of every global batch. DataLoader implements the
        # slicing (process_local); flip it here so a single-process train
        # script promotes to pod training with no loader changes. Foreign
        # loaders must pre-slice themselves — surface that contract
        # instead of silently double-feeding.
        for ld in (train_loader, val_loader):
            if ld is None:
                continue
            if hasattr(ld, "process_local"):
                ld.process_local = True
            else:
                cfg.log_fn(
                    f"fit(): multi-process run with a loader of type "
                    f"{type(ld).__name__} that has no process_local "
                    "support — it must yield this host's LOCAL slice of "
                    "each global batch (see parallel.multihost."
                    "host_local_slice)")
    stopper = (
        EarlyStopping(cfg.early_stopping_patience, cfg.early_stopping_min_delta)
        if cfg.early_stopping_patience > 0
        else None
    )
    shutdown = GracefulShutdown() if cfg.handle_preemption else None
    history = []
    if start_epoch and hasattr(train_loader, "epoch"):
        # resumed runs must continue the shuffle sequence, not replay the
        # epoch-0 order (DataLoader derives each epoch's order from
        # seed + epoch and a fresh process restarts its counter at 0)
        train_loader.epoch = start_epoch
    with shutdown if shutdown is not None else contextlib.nullcontext():
        for epoch in range(start_epoch, cfg.num_epochs):
            t0 = time.time()
            ekey = jax.random.fold_in(key, epoch)
            state, train_loss = train_epoch(
                state, train_step, train_loader, ekey, mesh, log_fn=cfg.log_fn,
                should_stop=(lambda: shutdown.requested) if shutdown else None,
                threaded=cfg.threaded_loader,
            )
            if shutdown is not None and shutdown.requested:
                cfg.log_fn(
                    f"preemption signal at epoch {epoch} — saving checkpoint "
                    "and exiting (resume with --resume latest)"
                )
                history.append(
                    {"epoch": epoch, "train_loss": train_loss,
                     "val_loss": float("nan"),
                     "seconds": time.time() - t0, "preempted": True}
                )
                if checkpoint_manager is not None:
                    meta = dict(metadata or {})
                    # record the last COMPLETED epoch so `--resume latest`
                    # (start_epoch = meta["epoch"] + 1) redoes the
                    # interrupted epoch instead of silently skipping its
                    # untrained remainder; train_loss covers only the
                    # partial epoch
                    meta.update({"epoch": epoch - 1,
                                 "interrupted_epoch": epoch,
                                 "partial_train_loss": train_loss,
                                 "preempted": True})
                    checkpoint_manager.save(epoch, state, metadata=meta)
                break
            val_loss = validate(state, eval_step, val_loader,
                                jax.random.fold_in(ekey, 10_000), mesh,
                                threaded=cfg.threaded_loader)
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
    if checkpoint_manager is not None and hasattr(checkpoint_manager, "wait"):
        # flush in-flight async saves before returning — the preemption
        # path above must never exit the process with an uncommitted
        # checkpoint (CheckpointManager(async_save=True))
        checkpoint_manager.wait()
    return state, history
