"""Classifier-FREE guidance (Ho & Salimans 2022) for class-conditional models.

The reference implements only *classifier* guidance (external gradient,
`gaussian_diffusion.py:326-355`; ours: `diffusion/gaussian.py:condition_mean`
/`condition_score`). Classifier-free guidance is the modern replacement: the
model itself is trained with a fraction of labels dropped to a null token,
and at sampling time the conditional and unconditional predictions are
extrapolated:

    eps_guided = eps_uncond + scale * (eps_cond - eps_uncond)

Usage with the samplers: wrap the label-aware apply function and hand the
wrapper to `inpaint_sample` / `sample` — guidance is orthogonal to the scan.

    apply = classifier_free(
        lambda x, t, mi, m, y: model.apply(v, x, t, mi, m, y=y),
        y=labels, null_label=NUM_CLASSES, scale=3.0)
    out = inpaint_sample(apply, sched, cfg, gt=gt, mask=mask, key=key)

Convention: allocate `num_classes = C + 1` embedding rows and use index C
as the null token. Train with `label_dropout` on `make_train_step` (which
calls `drop_labels`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["classifier_free", "drop_labels"]


def classifier_free(
    apply_fn: Callable,
    *,
    y: jnp.ndarray,
    null_label: int,
    scale: float,
    guide_channels: int = 3,
):
    """Wrap a label-aware apply_fn into the samplers' label-free signature.

    The conditional and unconditional forwards run as ONE batched model
    call (batch doubled) — better MXU utilization than two sequential
    calls. Only the first `guide_channels` output channels (the mean/eps
    prediction) are extrapolated; learned-variance channels pass through
    from the conditional branch. scale=1 reduces to the conditional
    model, scale=0 to the unconditional one.
    """
    y = jnp.asarray(y)

    def wrapped(x, t, *rest):
        B = x.shape[0]
        two = lambda a: jnp.concatenate([a, a], axis=0)
        y2 = jnp.concatenate([y, jnp.full_like(y, null_label)], axis=0)
        out = apply_fn(two(x), two(t), *map(two, rest), y2)
        c, u = out[:B], out[B:]
        eps = u[..., :guide_channels] + scale * (
            c[..., :guide_channels] - u[..., :guide_channels]
        )
        if out.shape[-1] > guide_channels:
            return jnp.concatenate([eps, c[..., guide_channels:]], axis=-1)
        return eps

    return wrapped


def drop_labels(key: jax.Array, y: jnp.ndarray, p: float, null_label: int):
    """Replace each label with the null token with probability p (training)."""
    drop = jax.random.bernoulli(key, p, y.shape)
    return jnp.where(drop, jnp.full_like(y, null_label), y)
