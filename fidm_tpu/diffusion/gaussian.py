"""Functional Gaussian-diffusion math core (NHWC, jit-friendly).

TPU-native re-design of `/root/reference/code/gaussian_diffusion.py:27-637`.
Instead of a stateful class with a noise cache and per-step host logic, this
module exposes pure functions over a `DiffusionSchedule` pytree. Timesteps are
traced int32 arrays, schedule gating is `jnp.where` (the reference's
`int(t[0].item())` logic at `gaussian_diffusion.py:131` would break tracing),
and ground-truth-noise caching becomes explicit PRNG keys: calling
`noised_ground_truth` with the same key reproduces the reference's
`(shape, timestep, device)` cache semantics (`gaussian_diffusion.py:85-108`)
deterministically.

Tensor layout is NHWC throughout — the native TPU convolution layout — with
masks shaped [B, H, W, 1] (1 = inpaint/hole, 0 = keep), matching the data
convention of `data/dataset.py:136-142`.
"""
from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

__all__ = [
    "ModelMeanType",
    "ModelVarType",
    "LossType",
    "extract",
    "q_mean_variance",
    "q_sample",
    "q_posterior_mean_variance",
    "predict_xstart_from_eps",
    "predict_xstart_from_xprev",
    "predict_eps_from_xstart",
    "split_model_output",
    "model_variance",
    "p_mean_variance",
    "PMeanVariance",
    "noised_ground_truth",
    "apply_inpainting_injection",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "mean_flat",
]


class ModelMeanType(enum.Enum):
    """What the model predicts (reference `losses.py:10-16`).

    VELOCITY (v = alpha*eps - sigma*x0, Salimans & Ho 2022) is an addition
    beyond the reference, used by the progressive-distillation path.
    """

    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()
    VELOCITY = enum.auto()

    @classmethod
    def from_name(cls, name: str) -> "ModelMeanType":
        """CLI-name mapping shared by train/evaluate (one source of truth)."""
        return {"epsilon": cls.EPSILON, "xstart": cls.START_X,
                "velocity": cls.VELOCITY, "xprev": cls.PREVIOUS_X}[name]


class ModelVarType(enum.Enum):
    """How variance is parameterized (reference `losses.py:19-26`)."""

    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    """Training loss (reference `losses.py:29-39`)."""

    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep constants and broadcast to an ndim-rank tensor.

    Functional analogue of `_extract_into_tensor` (`gaussian_diffusion.py:12-24`).
    `t` is an int32 [B] array; result has shape [B, 1, ..., 1].
    """
    vals = jnp.take(table, t, axis=0)
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


# --------------------------------------------------------------------------
# q distributions
# --------------------------------------------------------------------------

def q_mean_variance(sched: DiffusionSchedule, x_start, t):
    """q(x_t | x_0) mean/variance/log-variance (`gaussian_diffusion.py:159-170`)."""
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Sample from q(x_t | x_0) with explicit noise (`gaussian_diffusion.py:172-189`)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) (`gaussian_diffusion.py:191-211`)."""
    nd = x_t.ndim
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, nd)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


# --------------------------------------------------------------------------
# parameterization conversions
# --------------------------------------------------------------------------

def predict_xstart_from_eps(sched, x_t, t, eps):
    """`gaussian_diffusion.py:300-305`."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    """`gaussian_diffusion.py:307-314`."""
    nd = x_t.ndim
    return (
        extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    """`gaussian_diffusion.py:316-319`."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_xstart_from_v(sched, x_t, t, v):
    """x0 = alpha*x_t - sigma*v (v-parameterization)."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def velocity_from_eps_xstart(sched, t, eps, x_start):
    """v = alpha*eps - sigma*x0 — the v-prediction training target."""
    nd = eps.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * eps
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


# --------------------------------------------------------------------------
# model-output interpretation
# --------------------------------------------------------------------------

def split_model_output(model_output, var_type: ModelVarType):
    """Split a 2C-channel output into (mean-part, raw-variance-part) on the last axis.

    Mirrors the channel split at `gaussian_diffusion.py:241-243`, NHWC layout.
    """
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        c = model_output.shape[-1] // 2
        return model_output[..., :c], model_output[..., c:]
    return model_output, None


def model_variance(sched, var_values, x_shape_ndim, t, var_type: ModelVarType):
    """Return (variance, log_variance) per `gaussian_diffusion.py:241-265`."""
    nd = x_shape_ndim
    if var_type == ModelVarType.LEARNED:
        model_log_variance = var_values
        return jnp.exp(model_log_variance), model_log_variance
    if var_type == ModelVarType.LEARNED_RANGE:
        min_log = extract(sched.posterior_log_variance_clipped, t, nd)
        max_log = extract(sched.log_betas, t, nd)
        frac = (var_values + 1.0) / 2.0
        model_log_variance = frac * max_log + (1.0 - frac) * min_log
        return jnp.exp(model_log_variance), model_log_variance
    if var_type == ModelVarType.FIXED_LARGE:
        return (
            extract(sched.fixed_large_variance, t, nd),
            extract(sched.fixed_large_log_variance, t, nd),
        )
    if var_type == ModelVarType.FIXED_SMALL:
        return (
            extract(sched.posterior_variance, t, nd),
            extract(sched.posterior_log_variance_clipped, t, nd),
        )
    raise NotImplementedError(var_type)


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def p_mean_variance(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
    clip_denoised: bool = True,
) -> PMeanVariance:
    """Interpret a model output as p(x_{t-1} | x_t) statistics.

    Functional version of `gaussian_diffusion.py:213-298` that takes the model
    output as data (the caller runs the network), so it composes with scan,
    remat, and custom samplers without callbacks.
    """
    mean_part, var_values = split_model_output(model_output, var_type)
    variance, log_variance = model_variance(sched, var_values, x.ndim, t, var_type)

    def process_xstart(x0):
        return jnp.clip(x0, -1.0, 1.0) if clip_denoised else x0

    if mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, mean_part))
        mean = mean_part
    elif mean_type == ModelMeanType.START_X:
        pred_xstart = process_xstart(mean_part)
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    elif mean_type == ModelMeanType.EPSILON:
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, mean_part))
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    elif mean_type == ModelMeanType.VELOCITY:
        pred_xstart = process_xstart(predict_xstart_from_v(sched, x, t, mean_part))
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return PMeanVariance(mean, variance, log_variance, pred_xstart)


# --------------------------------------------------------------------------
# classifier guidance
# --------------------------------------------------------------------------

def condition_mean(pmv: "PMeanVariance", gradient: jnp.ndarray) -> "PMeanVariance":
    """Shift the posterior mean by variance * grad(log p(y|x)).

    Functional version of `gaussian_diffusion.py:326-337`; the caller
    computes `gradient = grad(log p(y|x_t))` (e.g. via a classifier).
    """
    return pmv._replace(mean=pmv.mean + pmv.variance * gradient)


def condition_score(
    sched: DiffusionSchedule,
    pmv: "PMeanVariance",
    x: jnp.ndarray,
    t: jnp.ndarray,
    gradient: jnp.ndarray,
) -> "PMeanVariance":
    """Condition the score function by a classifier gradient.

    Functional version of `gaussian_diffusion.py:339-355`: adjust eps by
    -sqrt(1-alpha_bar) * grad, re-derive x0 and the posterior mean.
    """
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, pmv.pred_xstart)
    eps = eps - jnp.sqrt(1.0 - alpha_bar) * gradient
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return pmv._replace(mean=mean, pred_xstart=pred_xstart)


# --------------------------------------------------------------------------
# inpainting injection
# --------------------------------------------------------------------------

def noised_ground_truth(sched, gt, t, key):
    """GT diffused to level t with key-derived noise.

    Deterministic replacement for the reference's GT-noise cache
    (`gaussian_diffusion.py:85-108`): reuse the same `key` across steps/calls
    to reproduce "cumulative" (cached) noise; fold in the step index for fresh
    noise per step.
    """
    noise = jax.random.normal(key, gt.shape, gt.dtype)
    return q_sample(sched, gt, t, noise)


def apply_inpainting_injection(
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    gt: jnp.ndarray,
    gt_keep_mask: jnp.ndarray,
    key: jax.Array,
    *,
    injection_schedule: str = "all",
) -> jnp.ndarray:
    """Overwrite known regions of x with correctly-noised ground truth.

    Functional version of `gaussian_diffusion.py:114-157`. `gt_keep_mask` is
    [B, H, W, 1] with 1 = keep (known), 0 = generate. The "high"/"low"
    schedule gate splits at T//2 and is applied per-sample with `jnp.where`
    instead of the reference's python-int branch.
    """
    weighed_gt = noised_ground_truth(sched, gt, t, key)
    injected = gt_keep_mask * weighed_gt + (1.0 - gt_keep_mask) * x
    if injection_schedule == "all":
        return injected
    half = sched.num_timesteps // 2
    if injection_schedule == "high":
        gate = (t >= half).reshape((-1,) + (1,) * (x.ndim - 1))
    elif injection_schedule == "low":
        gate = (t < half).reshape((-1,) + (1,) * (x.ndim - 1))
    else:
        raise ValueError(f"unknown injection_schedule: {injection_schedule}")
    return jnp.where(gate, injected, x)


# --------------------------------------------------------------------------
# likelihood utilities (reference losses.py:42-97)
# --------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (`losses.py:42-52`)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Tanh-based CDF approximation (`losses.py:55-60`)."""
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of discretized (±1/255 bin) Gaussian (`losses.py:63-90`)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


def mean_flat(tensor):
    """Mean over all non-batch dims (`losses.py:93-97`)."""
    return tensor.mean(axis=tuple(range(1, tensor.ndim)))


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_output,
    x_start,
    x_t,
    t,
    *,
    mean_type=ModelMeanType.EPSILON,
    var_type=ModelVarType.LEARNED_RANGE,
    clip_denoised=True,
):
    """Variational-bound term in bits-per-dim (`gaussian_diffusion.py:617-637`)."""
    true_mean, _, true_logvar = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_output, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = normal_kl(true_mean, true_logvar, out.mean, out.log_variance)
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_xstart
