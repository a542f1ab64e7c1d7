"""Early stopping with best-weight restoration.

Parity with the reference `EarlyStopping` (`train_inpainting.py:313-339`):
patience in epochs, min-delta threshold, optional snapshot of the best params
restored when stopping triggers.
"""
from __future__ import annotations

import jax

__all__ = ["EarlyStopping"]


class EarlyStopping:
    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 restore_best_weights: bool = True):
        self.patience = patience
        self.min_delta = min_delta
        self.restore_best_weights = restore_best_weights
        self.wait = 0
        self.stopped = False
        self.best_loss = float("inf")
        self.best_params = None

    def update(self, val_loss: float, params=None):
        """Returns (should_stop, params) — params is the best snapshot when
        stopping with restore_best_weights, else the input params."""
        if val_loss < self.best_loss - self.min_delta:
            self.best_loss = val_loss
            self.wait = 0
            if self.restore_best_weights and params is not None:
                # a real device copy, not an identity map: the donating
                # train step (donate=True default) invalidates the live
                # param buffers next epoch, and an aliased "snapshot" would
                # restore deleted arrays
                self.best_params = jax.tree_util.tree_map(
                    lambda x: x.copy() if hasattr(x, "copy") else x, params)
        else:
            self.wait += 1
        if self.wait >= self.patience:
            self.stopped = True
            if self.restore_best_weights and self.best_params is not None:
                return True, self.best_params
            return True, params
        return False, params
