"""Beta schedules and derived diffusion constants.

TPU-native re-design of the reference schedule library
(`/root/reference/code/utils/schedules.py:9-106` and the derived-quantity
precompute in `/root/reference/code/gaussian_diffusion.py:47-80`).

All tables are computed once on the host in float64 for accuracy, then frozen
into a `DiffusionSchedule` pytree of float32 device constants. Everything
downstream (q/p distributions, samplers, losses) indexes these tables with
traced integer timesteps via `jnp.take`, so the entire diffusion process stays
inside one XLA program — no host round-trips per step.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "get_named_beta_schedule",
    "betas_for_alpha_bar",
    "DiffusionSchedule",
    "ddim_timestep_sequence",
    "timestep_sequence",
]


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Return the named beta schedule as a float64 numpy array.

    Bit-compatible with the reference (`utils/schedules.py:9-46`):
      - ``linear``: Ho et al. schedule scaled by 1000/T from 1e-4 to 2e-2.
      - ``cosine``: Nichol & Dhariwal alpha-bar cosine with s=0.008.
      - ``quadratic``: beta interpolated along t^2 between the linear endpoints.
      - ``sqrt_linear`` / ``sqrt``: sqrt of a linspace(1e-4, 2e-2).
    """
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    if schedule_name == "quadratic":
        scale = 1000 / num_diffusion_timesteps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
        progression = np.linspace(0, 1, num_diffusion_timesteps, dtype=np.float64) ** 2
        return beta_start + (beta_end - beta_start) * progression
    if schedule_name in ("sqrt_linear", "sqrt"):
        return np.sqrt(np.linspace(0.0001, 0.02, num_diffusion_timesteps, dtype=np.float64))
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas.

    Matches `utils/schedules.py:49-66`.
    """
    i = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = i / num_diffusion_timesteps
    t2 = (i + 1) / num_diffusion_timesteps
    ab = np.vectorize(alpha_bar)
    return np.minimum(1.0 - ab(t2) / ab(t1), max_beta)


@struct.dataclass
class DiffusionSchedule:
    """All per-timestep constants of the Gaussian diffusion, as device tables.

    Derived quantities mirror `gaussian_diffusion.py:47-80` exactly (computed
    in float64, stored float32). The struct is a pytree so it passes freely
    through `jit` / `pjit` / `scan` as a closure constant.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # FIXED_LARGE variance table: [posterior_var[1], betas[1:]] (gaussian_diffusion.py:255-257)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False, default="")
    # host-side float64 betas, kept so samplers can rebuild coefficient
    # tables at full precision even for custom (unnamed) schedules — the
    # device `betas` above are rounded to f32 (see sampler.py
    # host_alphas_cumprod)
    betas_host: np.ndarray = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, schedule_name: str, num_timesteps: int, dtype=jnp.float32):
        betas = get_named_beta_schedule(schedule_name, num_timesteps)
        return cls.from_betas(betas, name=schedule_name, dtype=dtype)

    @classmethod
    def from_betas(cls, betas: np.ndarray, name: str = "", dtype=jnp.float32):
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        T = betas.shape[0]
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        post_logvar_clipped = np.log(np.append(post_var[1], post_var[1:]))
        fixed_large_var = np.append(post_var[1], betas[1:])

        as_dev = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dev(betas),
            alphas_cumprod=as_dev(acp),
            alphas_cumprod_prev=as_dev(acp_prev),
            alphas_cumprod_next=as_dev(acp_next),
            sqrt_alphas_cumprod=as_dev(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=as_dev(post_var),
            posterior_log_variance_clipped=as_dev(post_logvar_clipped),
            posterior_mean_coef1=as_dev(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=as_dev((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            log_betas=as_dev(np.log(betas)),
            fixed_large_variance=as_dev(fixed_large_var),
            fixed_large_log_variance=as_dev(np.log(fixed_large_var)),
            num_timesteps=T,
            name=name,
            betas_host=betas,
        )


def ddim_timestep_sequence(total_timesteps: int, ddim_timesteps: int) -> np.ndarray:
    """Evenly spaced DDIM timestep subset, descending (high noise -> low).

    Matches the canonical respacing logic of the reference eval harness
    (`test_inpainting_better.py:395-408`): stride ``T // K`` from 0, append the
    final timestep ``T-1`` if not already included, then reverse.
    """
    c = total_timesteps // ddim_timesteps
    seq = np.asarray(list(range(0, total_timesteps, c)))
    if seq[-1] != total_timesteps - 1:
        seq = np.append(seq, total_timesteps - 1)
    return seq[::-1].copy()


def timestep_sequence(
    total_timesteps: int,
    num_steps: int,
    spacing: str = "uniform",
    alphas_cumprod: np.ndarray | None = None,
) -> np.ndarray:
    """Descending timestep subset under a named spacing strategy.

    - "uniform": the reference eval-harness respacing
      (`test_inpainting_better.py:395-408`) via `ddim_timestep_sequence`.
    - "trailing": steps anchored at T-1 with even stride T/K, never visiting
      t=0's neighborhood twice (the "trailing" rule of arXiv:2305.08891,
      common in modern samplers; slightly better than "uniform" at low K).
    - "lambda": uniform in half-log-SNR lambda = 0.5*log(acp/(1-acp)) between
      t=T-1 and t=0 — the spacing DPM-Solver's error bounds assume
      (arXiv:2206.00927 §3.4); requires `alphas_cumprod`.
    - "karras": the rho=7 sigma schedule of Karras et al. 2022
      (arXiv:2206.00364 eq. 5) on the VP noise scale
      sigma = sqrt((1-acp)/acp), mapped to the nearest discrete timesteps —
      denser near sigma_min than "lambda", the standard few-step spacing in
      modern samplers; requires `alphas_cumprod`.
    """
    T, K = total_timesteps, num_steps
    if spacing == "uniform":
        return ddim_timestep_sequence(T, K)
    if spacing == "trailing":
        seq = np.round(np.arange(T, 0, -T / K)).astype(np.int64) - 1
        return np.unique(seq)[::-1].copy()
    if spacing in ("lambda", "karras"):
        if alphas_cumprod is None:
            raise ValueError(f"{spacing} spacing requires alphas_cumprod")
        if K > T:
            raise ValueError(f"num_steps {K} > total_timesteps {T}")
        acp = np.asarray(alphas_cumprod, np.float64)
        if spacing == "lambda":
            # uniform in half-log-SNR, from the noisiest level to the cleanest
            scale = 0.5 * (np.log(acp) - np.log1p(-acp))
            targets = np.linspace(scale[T - 1], scale[0], K)
        else:
            # Karras rho=7: uniform in sigma^(1/rho), descending sigma.
            # scale is monotone in t the same way as lambda (ascending as t
            # falls), so the same nearest-index mapping applies on -sigma.
            rho = 7.0
            sigma = np.sqrt((1.0 - acp) / acp)
            ramp = np.linspace(0.0, 1.0, K)
            s_max, s_min = sigma[T - 1], sigma[0]
            targets_sigma = (
                s_max ** (1 / rho) + ramp * (s_min ** (1 / rho) - s_max ** (1 / rho))
            ) ** rho
            scale = -sigma
            targets = -targets_sigma
        idx = np.abs(scale[None, :] - targets[:, None]).argmin(axis=1)
        # nearest-index picks can collide where the scale moves fast; force a
        # strictly descending grid of exactly K steps (idx is descending in
        # t: targets run from the t=T-1 level to the t=0 level)
        out = np.empty(K, dtype=np.int64)
        prev = T
        for j, i in enumerate(idx):
            i = min(int(i), prev - 1)   # strictly below the previous step
            i = max(i, K - 1 - j)       # leave room for the remaining steps
            out[j] = i
            prev = i
        return out
    raise ValueError(f"unknown spacing: {spacing}")
