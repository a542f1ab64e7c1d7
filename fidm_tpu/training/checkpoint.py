"""Orbax checkpoint management: latest / best / rotating-N + resume.

TPU-native equivalent of the reference `CheckpointManager`
(`scripts/train.py:27-96`: keeps `latest_model.pt`, `best_model.pt`, and a
rotating window of N numbered checkpoints with disk cleanup) and of
`save_checkpoint`/`load_checkpoint` (`train_inpainting.py:134-196`: epoch,
model, optimizer, scheduler state, val_loss, diffusion config in one file).

Here a checkpoint is the full TrainState pytree (params + optimizer state +
step) plus a JSON-serializable metadata dict (epoch, val_loss, diffusion
config). Orbax handles atomic writes and async I/O; sharded (pjit) arrays
restore to the same mesh layout automatically.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import orbax.checkpoint as ocp

from ..parallel.multihost import barrier, is_primary

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """latest/best/rotating-N checkpointing over Orbax.

    `async_save=True` commits rotating-step checkpoints on Orbax's
    background thread: `save()` returns as soon as the state is snapshotted
    to host memory and training continues while the serialization + write
    happen concurrently — on a big model the multi-second save disappears
    from the step-time budget. Call `wait()` (or `close()`, which implies
    it) before exiting; the preemption path in `training.loop.fit` does.
    The crash-safe overwrite protocol is preserved: the renamed-aside
    backup of a redone step survives until the async commit is CONFIRMED
    (next save / wait / close), so a crash mid-async-write still recovers
    the old checkpoint. Best-checkpoint saves stay synchronous (rare, and
    the marker file must agree with the directory)."""

    def __init__(self, directory: str, keep_last_n: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self._steps_root = os.path.join(self.directory, "steps")
        os.makedirs(self.directory, exist_ok=True)
        # MULTI-PROCESS CONTRACT (all processes share `directory`, e.g. a
        # pod writing to common storage): every process calls save/restore/
        # wait/close COLLECTIVELY — Orbax coordinates the sharded array
        # writes itself — but the custom protocol around it (overwrite
        # backups, best dir, markers) mutates paths with plain renames, so
        # those run on the PRIMARY process only, fenced by barriers so no
        # process touches a path mid-rename.
        if is_primary():
            self._recover_interrupted_overwrite()
        barrier("fidm-ckpt-init")
        self.async_save = async_save
        self._pending_cleanup = False
        self._mgr = ocp.CheckpointManager(
            self._steps_root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_last_n, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._best = ocp.StandardCheckpointer()
        self.best_val_loss = float("inf")
        self._load_best_marker()

    # -- metadata ----------------------------------------------------------
    def _marker_path(self):
        return os.path.join(self.directory, "best.json")

    def _load_best_marker(self):
        try:
            with open(self._marker_path()) as f:
                self.best_val_loss = json.load(f)["val_loss"]
        except (OSError, KeyError, ValueError):
            pass

    # -- crash-safe overwrite ------------------------------------------------
    # Re-saving a step happens legitimately when a preempted epoch is redone
    # after resume. A plain delete-then-save leaves a window where a second
    # crash destroys the only checkpoint at that step, so the old step dir is
    # first *renamed* aside (atomic), the new one saved (orbax writes via
    # tmp+rename), and only then the backup dropped. An interrupted overwrite
    # is rolled forward or back on the next manager construction.
    def _backup_root(self) -> str:
        return os.path.join(self.directory, "overwrite_backup")

    def _recover_interrupted_overwrite(self):
        root = self._backup_root()
        if not os.path.isdir(root):
            return
        for name in os.listdir(root):
            dst = os.path.join(self._steps_root, name)
            if os.path.exists(dst):  # new save finished; backup is stale
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            else:  # crashed mid-overwrite: restore the old checkpoint
                os.rename(os.path.join(root, name), dst)
        shutil.rmtree(root, ignore_errors=True)

    def _begin_overwrite(self, step: int):
        # primary renames; everyone waits, then re-reads the step listing
        if is_primary():
            src = os.path.join(self._steps_root, str(step))
            if os.path.isdir(src):
                root = self._backup_root()
                shutil.rmtree(root, ignore_errors=True)
                os.makedirs(root)
                os.rename(src, os.path.join(root, str(step)))
            else:  # unexpected layout; last-resort delete
                self._mgr.delete(step)
        barrier("fidm-ckpt-overwrite")
        self._mgr.reload()

    # -- save ---------------------------------------------------------------
    def save(self, step: int, state, metadata: Optional[dict] = None,
             val_loss: Optional[float] = None) -> bool:
        """Save a rotating numbered checkpoint; track best by val_loss.

        Returns True if this checkpoint became the new best.
        """
        meta = dict(metadata or {})
        if val_loss is not None:
            meta["val_loss"] = float(val_loss)
        # a still-in-flight async save must commit before we rename step
        # dirs around (overwrite) or drop its overwrite backup
        if self._pending_cleanup or step in self._mgr.all_steps():
            self.wait()
        if step in self._mgr.all_steps():
            self._begin_overwrite(step)
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if self.async_save:
            # the tmp+rename commit happens on the background thread; keep
            # any overwrite backup until it's confirmed (next save / wait /
            # close) so a crash mid-write still recovers the old checkpoint
            self._pending_cleanup = True
        else:
            self._mgr.wait_until_finished()
            if is_primary():
                shutil.rmtree(self._backup_root(), ignore_errors=True)

        # val_loss is identical on every process (the sharded eval reduces
        # globally), so is_best agrees everywhere and the collective
        # best-save below is entered by all processes together
        is_best = val_loss is not None and val_loss < self.best_val_loss
        if is_best:
            self.best_val_loss = float(val_loss)
            best_dir = os.path.join(self.directory, "best")
            if is_primary() and os.path.exists(best_dir):
                shutil.rmtree(best_dir)
            barrier("fidm-ckpt-best")
            self._best.save(best_dir, state)
            self._best.wait_until_finished()
            if is_primary():
                with open(self._marker_path(), "w") as f:
                    # carry the FULL metadata, not just the marker fields:
                    # the rotating step that holds it can be pruned, and
                    # consumers (cli.evaluate's mean_type resolution)
                    # prefer "best"
                    json.dump({**meta, "val_loss": self.best_val_loss,
                               "step": step}, f)
        return is_best

    # -- restore -------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, which: str, abstract_state):
        """Restore 'latest' | 'best' | a step number into abstract_state's
        structure/shardings. Returns (state, metadata|None)."""
        if self._pending_cleanup:  # never read behind an in-flight save
            self.wait()
        if which == "best":
            best_dir = os.path.join(self.directory, "best")
            state = self._best.restore(best_dir, abstract_state)
            meta = None
            try:
                with open(self._marker_path()) as f:
                    meta = json.load(f)
            except OSError:
                pass
            return state, meta
        step = self.latest_step() if which == "latest" else int(which)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def restore_params(self, which: str = "latest", prefer_ema: bool = False):
        """Restore only the model params pytree (for evaluation), without
        needing the optimizer/TrainState structure.

        With prefer_ema=True, return the exponential-moving-average
        parameters when the checkpoint carries them (training ran with
        `ema_decay`) — the standard eval weights for diffusion models —
        falling back to the raw params otherwise."""
        if self._pending_cleanup:
            self.wait()
        if which == "best":
            state = self._best.restore(os.path.join(self.directory, "best"))
        else:
            step = self.latest_step() if which == "latest" else int(which)
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            restored = self._mgr.restore(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardRestore()),
            )
            state = restored["state"]
        if prefer_ema:
            ema = state.get("ema_params")
            if ema:  # None / {} when training ran without EMA
                return ema
        return state["params"]

    def restore_metadata(self, which: str = "latest") -> Optional[dict]:
        """The JSON metadata dict saved alongside a checkpoint, or None.

        Lets consumers (e.g. cli.evaluate) recover training-time facts the
        parameter tree cannot express — mean_type parameterization,
        schedule, distillation mode — without restoring any arrays."""
        import orbax.checkpoint as ocp

        if self._pending_cleanup:
            self.wait()

        if which == "best":
            try:
                with open(self._marker_path()) as f:
                    return json.load(f)
            except OSError:
                return None
        step = self.latest_step() if which == "latest" else int(which)
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
            )
            return restored["meta"]
        except Exception:  # older checkpoints may carry no meta item
            return None

    def wait(self):
        """Block until every in-flight (async) save has committed, then
        finish the deferred overwrite-backup cleanup. No-op when idle."""
        self._mgr.wait_until_finished()
        if self._pending_cleanup:
            if is_primary():
                shutil.rmtree(self._backup_root(), ignore_errors=True)
            self._pending_cleanup = False

    def close(self):
        self.wait()
        self._mgr.close()
