"""Learning-rate schedules.

Optax equivalents of the reference schedulers
(`train_inpainting.py:342-413`): cosine annealing with optional linear
warmup and a `min_lr_ratio` floor, step decay (T/3, gamma 0.5), or constant.
Schedules are per-*step* (the reference steps per epoch; pass
steps_per_epoch=1 for exact parity).
"""
from __future__ import annotations

import optax

__all__ = ["make_lr_schedule"]


def make_lr_schedule(
    kind: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr_ratio: float = 0.01,
):
    """Build an optax schedule: 'cosine' | 'step' | 'none'."""
    # Short runs (smoke tests, tiny distill rounds) can ask for more warmup
    # than total steps; optax requires decay_steps > warmup_steps.
    warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
    if kind == "cosine":
        if warmup_steps > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=base_lr,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
                end_value=base_lr * min_lr_ratio,
            )
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=total_steps, alpha=min_lr_ratio
        )
    if kind == "step":
        step_size = max(total_steps // 3, 1)
        return optax.piecewise_constant_schedule(
            base_lr, {step_size: 0.5, 2 * step_size: 0.5}
        )
    if kind == "none":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown scheduler: {kind}")
