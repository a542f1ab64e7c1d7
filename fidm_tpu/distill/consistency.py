"""Consistency distillation: 1-2 step sampling from a trained teacher.

Beyond-reference capability (Song, Dhariwal, Chen & Sutskever, "Consistency
Models", 2023; pseudo-huber metric from Song & Dhariwal, "Improved
Techniques for Training Consistency Models", 2023), completing the few-step
family next to progressive distillation (`distill/progressive.py`): where
progressive halves the step count per round (16->8->4->2), consistency
distillation trains a single student whose output at ANY noise level is the
trajectory endpoint x0, so sampling is f(x_T, T) — one model evaluation —
with an optional renoise-and-refine multistep ladder.

Discrete-time VP formulation on our `DiffusionSchedule`: the consistency
function is the student's own x0-prediction under its mean-type
parameterization, f_theta(x, t) = x0_pred(raw, x, t). At the chain's
t = 0 endpoint (alpha_bar ~ 1) this reduces to ~x for EPSILON / VELOCITY
parameterizations, which is the discrete analogue of the boundary condition
f(x, eps) = x — no extra c_skip/c_out head is needed, and initializing the
student FROM the teacher makes f start as the teacher's x0 predictor (the
strongest init the paper recommends).

Training (Algorithm 2 of the paper, one jitted XLA program per step):
sample a grid segment t_n+1 > t_n, noise data to x_{t_n+1}, take ONE
deterministic teacher DDIM step down to x_hat_{t_n}, and pull
f_theta(x_{t_n+1}) toward f_{theta^-}(x_hat_{t_n}) where theta^- is an EMA
"target network" (carried in `TrainState.ema_params`). Distance is the
pseudo-huber metric by default (sqrt(||.||^2 + c^2) - c), which the
improved-techniques paper shows dominates plain L2. With
`teacher_apply=None` the same step runs consistency TRAINING (Algorithm 3:
x_{t_n} comes from the data with the same noise draw — no teacher needed).

The reference has no distillation of any kind; its only acceleration is
first-order DDIM step subsetting (`test_inpainting_better.py:395-408`).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import gaussian as gd
from ..diffusion.schedules import DiffusionSchedule
from .progressive import _alpha_sigma, _x0_from

__all__ = [
    "consistency_grid",
    "consistency_x0",
    "make_consistency_step",
    "consistency_sample",
]


def consistency_grid(num_timesteps: int, steps: int) -> np.ndarray:
    """`steps`+1 descending timestep boundaries T-1 -> 0 (f is evaluated at
    the first `steps` of them; the last is the renoise target of none)."""
    return np.round(
        np.linspace(num_timesteps - 1, 0, steps + 1)
    ).astype(np.int32)


def consistency_x0(
    sched: DiffusionSchedule, raw, x, t,
    mean_type: gd.ModelMeanType = gd.ModelMeanType.VELOCITY,
    clip_denoised: bool = True,
):
    """The consistency function: the x0 the raw model output implies at t."""
    a, s = _alpha_sigma(sched, t, x.ndim)
    x0 = _x0_from(raw[..., :3], x, a, s, mean_type)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def make_consistency_step(
    sched: DiffusionSchedule,
    teacher_apply: Optional[Callable],
    student_apply: Callable,
    *,
    grid_size: int = 40,
    teacher_mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON,
    student_mean_type: gd.ModelMeanType = gd.ModelMeanType.VELOCITY,
    ema_decay: float = 0.95,
    loss_metric: str = "huber",
    huber_c: Optional[float] = None,
    clip_denoised: bool = True,
    mesh=None,
):
    """Build the jitted consistency train step (distillation or training).

    teacher_apply/student_apply: (params, x, t[B], masked_image, mask) ->
    model output. The student state MUST carry `ema_params` (the target
    network theta^-, usually initialized to the same teacher weights);
    the step returns it updated with `ema_decay`.

    With `teacher_apply=None` this becomes consistency TRAINING (the
    paper's Algorithm 3 — no teacher at all): the adjacent-level pair
    (x_{t_n+1}, x_{t_n}) is built from the data sample itself with a
    SHARED noise draw (the single-sample score estimate), so a 1-2 step
    generator trains from scratch. Pass anything (e.g. None) as
    `teacher_params` in that mode.

    Returns step(student_state, teacher_params, batch, key) ->
    (student_state, metrics). `batch` = {image, masked_image, mask}.
    """
    boundaries = jnp.asarray(consistency_grid(sched.num_timesteps, grid_size))

    def teacher_ddim_step(params, x, t, t_next, cond):
        nd = x.ndim
        a0, s0 = _alpha_sigma(sched, t, nd)
        a1, s1 = _alpha_sigma(sched, t_next, nd)
        raw = teacher_apply(params, x, t, *cond)[..., :3]
        x0 = _x0_from(raw, x, a0, s0, teacher_mean_type)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (x - a0 * x0) / jnp.maximum(s0, 1e-8)
        return a1 * x0 + s1 * eps

    def distance(pred, target):
        err2 = jnp.sum((pred - target) ** 2, axis=(1, 2, 3))
        if loss_metric == "l2":
            return err2.mean()
        # pseudo-huber; the improved-techniques default c = 0.00054*sqrt(D)
        D = pred.shape[1] * pred.shape[2] * pred.shape[3]
        c = huber_c if huber_c is not None else 0.00054 * float(np.sqrt(D))
        return (jnp.sqrt(err2 + c * c) - c).mean()

    def step(state, teacher_params, batch, key):
        assert state.ema_params is not None, (
            "consistency distillation needs a target network: create the "
            "TrainState with ema_params=<initial student params>"
        )
        key = jax.random.fold_in(key, state.step)
        seg_key, noise_key = jax.random.split(key)
        x_start = batch["image"]
        B = x_start.shape[0]
        cond = (batch["masked_image"], batch["mask"])

        n = jax.random.randint(seg_key, (B,), 0, grid_size)
        t0 = boundaries[n]        # noisier end of the segment
        t1 = boundaries[n + 1]    # one solver step down

        noise = jax.random.normal(noise_key, x_start.shape, x_start.dtype)
        x_t = gd.q_sample(sched, x_start, t0, noise)

        if teacher_apply is None:
            # consistency training: the lower-level point reuses the SAME
            # noise (x and x_hat sit on the same single-sample trajectory
            # estimate) — no model evaluation
            x_hat = gd.q_sample(sched, x_start, t1, noise)
        else:
            x_hat = jax.lax.stop_gradient(
                teacher_ddim_step(teacher_params, x_t, t0, t1, cond)
            )
        raw_tgt = student_apply(state.ema_params, x_hat, t1, *cond)
        target = jax.lax.stop_gradient(
            consistency_x0(sched, raw_tgt, x_hat, t1,
                           student_mean_type, clip_denoised)
        )

        def loss_fn(params):
            raw = student_apply(params, x_t, t0, *cond)
            pred = consistency_x0(sched, raw, x_t, t0,
                                  student_mean_type, clip_denoised)
            return distance(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, new_state.params,
            )
        )
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step)

    from ..parallel.mesh import batch_sharding, replicated

    batch_sh = {k: batch_sharding(mesh)
                for k in ("image", "masked_image", "mask")}
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sh, replicated(mesh)),
    )


def consistency_sample(
    apply_fn: Callable,
    sched: DiffusionSchedule,
    num_steps: int,
    shape,
    key,
    *,
    mean_type: gd.ModelMeanType = gd.ModelMeanType.VELOCITY,
    clip_denoised: bool = True,
    gt=None,
    mask=None,
):
    """Multistep consistency sampling (paper Algorithm 1, VP-discrete).

    apply_fn(x, t[B]) -> raw model output (close over params/conditioning).
    num_steps=1 is a single f(x_T) evaluation; more steps alternate
    renoise-to-grid / f, refining detail. With `gt` [B,H,W,3] and `mask`
    [B,H,W,1] (1 = hole) the known region is injected at every level and
    blended exactly at the end — the reference's inpainting conditioning
    (`gaussian_diffusion.py:114-157`) applied zero-shot to a consistency
    student.

    Runs as one `lax.scan`; jit-compatible (wrap in jax.jit for repeat use).
    """
    grid = jnp.asarray(consistency_grid(sched.num_timesteps, num_steps))
    B = shape[0]
    k_init, k_loop = jax.random.split(jax.random.fold_in(key, 0))
    x = jax.random.normal(k_init, shape)
    keep = None if gt is None else 1.0 - mask

    def body(carry, i):
        x, k = carry
        k, k_inj, k_re = jax.random.split(k, 3)
        t = jnp.full((B,), grid[i], jnp.int32)
        if gt is not None:
            gt_noised = gd.q_sample(
                sched, gt, t, jax.random.normal(k_inj, gt.shape, gt.dtype))
            x = mask * x + keep * gt_noised
        raw = apply_fn(x, t)
        x0 = consistency_x0(sched, raw, x, t, mean_type, clip_denoised)
        t_next = jnp.full((B,), grid[i + 1], jnp.int32)
        x_re = gd.q_sample(
            sched, x0, t_next, jax.random.normal(k_re, x0.shape, x0.dtype))
        x = jnp.where(i == num_steps - 1, x0, x_re)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, k_loop), jnp.arange(num_steps))
    if gt is not None:
        x = mask * x + keep * gt  # exact final blend
    return x
