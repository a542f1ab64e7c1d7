"""Progressive distillation: halve sampling steps at matched quality.

Beyond-reference capability (Salimans & Ho, "Progressive Distillation for
Fast Sampling of Diffusion Models", 2022): a student learns to reproduce TWO
deterministic DDIM steps of a frozen teacher in ONE step. Repeating the
procedure halves the sampler's step count each round — the right
performance lever here, since the compiled UNet already runs at ~70% of the
chip's bf16 peak (CLAUDE.md) and DDIM-100 cost is linear in steps.

Everything — teacher double-step, target construction, SNR-weighted loss,
student update — compiles into one jitted, mesh-shardable XLA program.

Grid convention: `boundaries = round(linspace(T-1, 0, K+1))` gives K teacher
transitions; the student trains on the K/2 coarse transitions
boundaries[2j] -> boundaries[2j+2] via the teacher midpoint boundaries[2j+1].
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import gaussian as gd
from ..diffusion.schedules import DiffusionSchedule

__all__ = ["distill_boundaries", "make_distill_step"]


def distill_boundaries(num_timesteps: int, teacher_steps: int) -> np.ndarray:
    """K+1 descending timestep boundaries for a K-step teacher."""
    assert teacher_steps % 2 == 0, "teacher_steps must be even to halve"
    return np.round(
        np.linspace(num_timesteps - 1, 0, teacher_steps + 1)
    ).astype(np.int32)


def _alpha_sigma(sched: DiffusionSchedule, t, nd):
    a = gd.extract(sched.sqrt_alphas_cumprod, t, nd)
    s = gd.extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
    return a, s


def _x0_from(raw, x, alpha, sigma, mean_type):
    if mean_type == gd.ModelMeanType.EPSILON:
        return (x - sigma * raw) / alpha
    if mean_type == gd.ModelMeanType.VELOCITY:
        return alpha * x - sigma * raw
    if mean_type == gd.ModelMeanType.START_X:
        return raw
    raise NotImplementedError(mean_type)


def make_distill_step(
    sched: DiffusionSchedule,
    teacher_apply: Callable,
    student_apply: Callable,
    *,
    teacher_steps: int,
    teacher_mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON,
    student_mean_type: gd.ModelMeanType = gd.ModelMeanType.VELOCITY,
    clip_denoised: bool = True,
    mesh=None,
):
    """Build the jitted distillation train step.

    teacher_apply/student_apply: (params, x, t[B], masked_image, mask) ->
    model output (NHWC; extra channels beyond 3 are ignored).

    Returns step(student_state, teacher_params, batch, key) ->
    (student_state, metrics). `batch` = {image, masked_image, mask}.
    """
    boundaries = jnp.asarray(distill_boundaries(sched.num_timesteps,
                                                teacher_steps))
    n_student = teacher_steps // 2

    def teacher_ddim_step(params, x, t, t_next, cond):
        nd = x.ndim
        a0, s0 = _alpha_sigma(sched, t, nd)
        a1, s1 = _alpha_sigma(sched, t_next, nd)
        raw = teacher_apply(params, x, t, *cond)[..., :3]
        x0 = _x0_from(raw, x, a0, s0, teacher_mean_type)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (x - a0 * x0) / s0
        return a1 * x0 + s1 * eps

    def step(state, teacher_params, batch, key):
        key = jax.random.fold_in(key, state.step)
        seg_key, noise_key = jax.random.split(key)
        x_start = batch["image"]
        B = x_start.shape[0]
        cond = (batch["masked_image"], batch["mask"])

        # per-sample coarse segment j: t0 -> t1 -> t2
        j = jax.random.randint(seg_key, (B,), 0, n_student)
        t0 = boundaries[2 * j]
        t1 = boundaries[2 * j + 1]
        t2 = boundaries[2 * j + 2]

        noise = jax.random.normal(noise_key, x_start.shape, x_start.dtype)
        x_t = gd.q_sample(sched, x_start, t0, noise)

        # frozen teacher: two DDIM steps
        x_mid = teacher_ddim_step(teacher_params, x_t, t0, t1, cond)
        x_two = teacher_ddim_step(teacher_params, x_mid, t1, t2, cond)
        x_two = jax.lax.stop_gradient(x_two)

        nd = x_t.ndim
        a0, s0 = _alpha_sigma(sched, t0, nd)
        a2, s2 = _alpha_sigma(sched, t2, nd)
        # the x0 a ONE-step DDIM from t0 must predict to land on x_two
        ratio = s2 / jnp.maximum(s0, 1e-8)
        x0_target = (x_two - ratio * x_t) / jnp.maximum(a2 - ratio * a0, 1e-8)
        x0_target = jax.lax.stop_gradient(x0_target)

        # truncated-SNR weighting: max(alpha^2/sigma^2, 1)
        w = jnp.maximum((a0 / jnp.maximum(s0, 1e-8)) ** 2, 1.0)

        def loss_fn(params):
            raw = student_apply(params, x_t, t0, *cond)[..., :3]
            x0_s = _x0_from(raw, x_t, a0, s0, student_mean_type)
            return (w * (x0_s - x0_target) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    # no donation: the student is typically initialized FROM the teacher, so
    # state.params and teacher_params may alias the same buffers
    if mesh is None:
        return jax.jit(step)

    from ..parallel.mesh import batch_sharding, replicated

    batch_sh = {k: batch_sharding(mesh)
                for k in ("image", "masked_image", "mask")}
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sh, replicated(mesh)),
    )
