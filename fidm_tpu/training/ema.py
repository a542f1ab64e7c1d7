"""Exponential moving average of parameters.

Standard for diffusion training (Improved-DDPM uses EMA rate 0.9999 for its
released checkpoints); the reference fine-tuning loop omits it — a quality
gap this framework closes. Pure functional update so it jits into the train
step; stored as an extra pytree alongside the TrainState.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["init_ema", "update_ema"]


def init_ema(params):
    """EMA state initialized to a COPY of the params.

    A real copy matters: `jnp.asarray` would alias the live param buffers,
    and a donating train step (`make_train_step(donate=True)`, the default)
    would then donate the same buffer twice and crash on its first call."""
    return jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else jnp.array(x), params)


def update_ema(ema_params, params, decay: float = 0.9999):
    """ema <- decay * ema + (1-decay) * params."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
