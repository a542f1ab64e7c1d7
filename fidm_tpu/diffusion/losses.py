"""Training losses for mask-aware diffusion inpainting.

Functional re-design of `GaussianDiffusion.training_losses`
(`/root/reference/code/gaussian_diffusion.py:540-614`): the masked,
area-normalized MSE over the hole region, with optional train-time injection
of correctly-noised known pixels into x_t. Unlike the reference (which raises
`NotImplementedError` for KL losses at `gaussian_diffusion.py:612`), the
hybrid MSE+VLB loss used by Improved-DDPM is implemented here natively.

All functions take the model *forward output* path as a callable so the whole
loss evaluates inside one jitted train step. Layout NHWC; mask [B,H,W,1] with
1 = inpaint (hole), 0 = keep.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import gaussian as gd
from .schedules import DiffusionSchedule

__all__ = ["training_losses", "masked_mse", "snr_loss_weight"]


def masked_mse(target, prediction, inpaint_mask, sample_weight=None):
    """Area-normalized MSE over the hole region (`gaussian_diffusion.py:596-605`).

    mask is broadcast to all channels; per-sample sums over space are divided
    by the (clamped >= 1) mask area, then averaged over batch and channels.
    `sample_weight` ([B], optional) scales each sample's contribution —
    the hook for timestep-dependent loss weighting (min-SNR / P2).
    """
    mask_c = jnp.broadcast_to(inpaint_mask, target.shape)
    mse = (target - prediction) ** 2 * mask_c
    # sum over spatial dims (NHWC -> axes 1,2), keep batch & channel
    mask_area = jnp.clip(mask_c.sum(axis=(1, 2), keepdims=True), min=1.0)
    per = mse.sum(axis=(1, 2), keepdims=True) / mask_area
    if sample_weight is not None:
        per = per * sample_weight.reshape((-1,) + (1,) * (per.ndim - 1))
    return per.mean()


def snr_loss_weight(
    sched: DiffusionSchedule,
    t: jnp.ndarray,
    mean_type: gd.ModelMeanType,
    kind: str,
    gamma: Optional[float] = None,
    p2_k: float = 1.0,
) -> jnp.ndarray:
    """Per-sample timestep loss weights ([B]) for the masked MSE.

    Both schemes are defined on the x0/eps-space loss and converted to the
    model's parameterization via eps-mse = SNR * x0-mse and
    v-mse = (SNR+1) * x0-mse, so a given `kind` applies the SAME effective
    weighting regardless of mean_type (tested as an algebraic identity):

    - "min_snr" (Hang et al. 2023, arXiv:2303.09556): clamp the effective
      x0-space weight at gamma (default 5.0). eps-models:
      min(SNR, g)/SNR; x0-models: min(SNR, g); v-models: min(SNR, g)/(SNR+1).
    - "p2" (Choi et al. 2022, arXiv:2204.00227): down-weight the easy
      low-noise steps by 1/(k + SNR)^gamma relative to the STANDARD eps
      loss (gamma default 1.0, k=1.0).

    Beyond-reference capability: the reference trains with the uniform
    eps-MSE only (`gaussian_diffusion.py:596-605`).
    """
    if kind == "none":
        return jnp.ones_like(t, jnp.float32)
    if mean_type == gd.ModelMeanType.PREVIOUS_X:
        raise ValueError("snr loss weighting is undefined for xprev models")
    snr = gd.extract(
        sched.alphas_cumprod / (1.0 - sched.alphas_cumprod), t, 1)
    if kind == "min_snr":
        g = 5.0 if gamma is None else gamma
        w_x0 = jnp.minimum(snr, g)  # x0-space weight
    elif kind == "p2":
        g = 1.0 if gamma is None else gamma
        # paper weight is relative to the standard eps loss -> x0-space
        # weight carries the SNR factor of eps-mse = SNR * x0-mse
        w_x0 = snr / (p2_k + snr) ** g
    else:
        raise ValueError(f"unknown loss_weight kind: {kind!r}")
    if mean_type == gd.ModelMeanType.EPSILON:
        return w_x0 / snr
    if mean_type == gd.ModelMeanType.VELOCITY:
        return w_x0 / (snr + 1.0)
    return w_x0  # START_X


def training_losses(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    *,
    mask: Optional[jnp.ndarray] = None,
    masked_image: Optional[jnp.ndarray] = None,
    loss_type: gd.LossType = gd.LossType.MSE,
    var_type: gd.ModelVarType = gd.ModelVarType.LEARNED_RANGE,
    mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON,
    use_injection: bool = True,
    injection_schedule: str = "all",
    vb_weight: float = 0.0,
    loss_weight: str = "none",
    loss_weight_gamma: Optional[float] = None,
):
    """Compute the inpainting training loss.

    Args:
      model_fn: callable (x_t, t, masked_image, mask) -> model output (NHWC,
        2C channels when variance is learned).
      x_start: clean images [B,H,W,3] in [-1,1].
      t: int32 [B] timesteps.
      key: PRNG key; split internally for diffusion noise and injection noise.
      mask: [B,H,W,1], 1 = inpaint. Defaults to all-ones (whole image).
      masked_image: [B,H,W,3] image with holes zeroed; enables injection.
      vb_weight: if > 0, adds `vb_weight * vb_term` computed with a
        stop-gradient on the mean channels (Improved-DDPM hybrid loss) —
        a capability the reference lacks.
      loss_weight: "none" | "min_snr" | "p2" — timestep-dependent loss
        weighting (see `snr_loss_weight`); applies to the MSE term only.
      loss_weight_gamma: clamp/exponent for the chosen scheme (defaults:
        min_snr 5.0, p2 1.0).

    Returns:
      dict with "loss", "mse" (and "vb" when enabled).
    """
    noise_key, inject_key = jax.random.split(key)
    noise = jax.random.normal(noise_key, x_start.shape, x_start.dtype)

    if mask is None:
        mask = jnp.ones(x_start.shape[:-1] + (1,), x_start.dtype)

    x_t = gd.q_sample(sched, x_start, t, noise)

    # Train-time injection of known regions (gaussian_diffusion.py:570-582):
    # overwrite keep-region of x_t with an independently-noised copy of GT.
    if use_injection and masked_image is not None:
        gt_keep_mask = 1.0 - mask
        x_t = gd.apply_inpainting_injection(
            sched, x_t, t, x_start, gt_keep_mask, inject_key,
            injection_schedule=injection_schedule,
        )

    terms = {}
    if loss_type in (gd.LossType.MSE, gd.LossType.RESCALED_MSE):
        model_output = model_fn(x_t, t, masked_image, mask)
        mean_part, var_values = gd.split_model_output(model_output, var_type)

        if mean_type == gd.ModelMeanType.VELOCITY:
            target = gd.velocity_from_eps_xstart(sched, t, noise, x_start)
        elif mean_type == gd.ModelMeanType.PREVIOUS_X:
            # reference target for xprev models: the true posterior mean
            # (`gaussian_diffusion.py:584-588`)
            target = gd.q_posterior_mean_variance(sched, x_start, x_t, t)[0]
        else:
            target = {
                gd.ModelMeanType.EPSILON: noise,
                gd.ModelMeanType.START_X: x_start,
            }[mean_type]
        weight = (
            snr_loss_weight(sched, t, mean_type, loss_weight,
                            loss_weight_gamma)
            if loss_weight != "none" else None
        )
        terms["mse"] = masked_mse(target, mean_part, mask,
                                  sample_weight=weight)
        if loss_type == gd.LossType.RESCALED_MSE:
            terms["mse"] = terms["mse"] * sched.num_timesteps
        terms["loss"] = terms["mse"]

        if vb_weight > 0.0 and var_values is not None:
            # Hybrid loss: learn variance through the VLB with frozen mean.
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_part), var_values], axis=-1
            )
            vb, _ = gd.vb_terms_bpd(
                sched, frozen, x_start, x_t, t,
                mean_type=mean_type, var_type=var_type, clip_denoised=False,
            )
            terms["vb"] = vb.mean()
            terms["loss"] = terms["loss"] + vb_weight * terms["vb"]
    elif loss_type.is_vb():
        model_output = model_fn(x_t, t, masked_image, mask)
        vb, _ = gd.vb_terms_bpd(
            sched, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        terms["vb"] = vb.mean()
        if loss_type == gd.LossType.RESCALED_KL:
            terms["vb"] = terms["vb"] * sched.num_timesteps
        terms["loss"] = terms["vb"]
    else:
        raise NotImplementedError(loss_type)

    return terms
