"""Mixed-precision utilities.

The reference ships a broken, dead `MixedPrecisionTrainer`
(`fp16_util.py:92-185`: references an undefined `logger` and
`self.sync_cuda`, imported nowhere). On TPU the native answer is bf16
compute with fp32 master params — which needs NO loss scaling and is the
framework default (`UNetConfig.dtype=bfloat16`, fp32 `param_dtype`).

For completeness (fp16 experimentation, non-TPU backends) this module
provides a WORKING dynamic loss scale with the standard
grow-on-N-finite-steps / halve-on-overflow policy, as a pure functional
state so it jits into the train step.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LossScaleState", "init_loss_scale", "scale_loss", "unscale_grads"]


class LossScaleState(NamedTuple):
    scale: jnp.ndarray          # current multiplier
    growth_counter: jnp.ndarray  # consecutive finite steps
    growth_interval: int = 2000
    growth_factor: float = 2.0
    backoff_factor: float = 0.5


def init_loss_scale(initial: float = 2.0**15, growth_interval: int = 2000
                    ) -> LossScaleState:
    return LossScaleState(
        scale=jnp.asarray(initial, jnp.float32),
        growth_counter=jnp.asarray(0, jnp.int32),
        growth_interval=growth_interval,
    )


def scale_loss(state: LossScaleState, loss):
    return loss * state.scale


def unscale_grads(state: LossScaleState, grads
                  ) -> Tuple[LossScaleState, object, jnp.ndarray]:
    """Unscale grads; detect overflow; update the scale.

    Returns (new_state, unscaled_grads, grads_finite). When not finite, the
    caller should skip the optimizer update (`optax.apply_if_finite` pairs
    well with this).
    """
    inv = 1.0 / state.scale
    grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
    finite = jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(g))
                   for g in jax.tree_util.tree_leaves(grads)])
    )
    counter = jnp.where(finite, state.growth_counter + 1, 0)
    grow = counter >= state.growth_interval
    new_scale = jnp.where(
        finite,
        jnp.where(grow, state.scale * state.growth_factor, state.scale),
        state.scale * state.backoff_factor,
    )
    new_state = state._replace(
        scale=new_scale, growth_counter=jnp.where(grow, 0, counter)
    )
    return new_state, grads, finite
