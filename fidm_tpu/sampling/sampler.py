"""Unified on-device DDPM/DDIM inpainting sampler as a single `lax.scan`.

TPU-native replacement for BOTH the reference library loops
(`/root/reference/code/gaussian_diffusion.py:357-538`) and the canonical
accelerated eval loops (`test_inpainting_better.py:410-586`):

- Timestep respacing (DDIM-K subsets, `test_inpainting_better.py:395-408`) is
  precomputed on the host in float64 and baked into per-step coefficient
  tables that ride through the scan as `xs` — no per-step host scalar
  construction (the reference builds `torch.tensor(alpha)` on every step,
  `test_inpainting_better.py:543-544`, a host->device sync we eliminate).
- Known-region injection and mask compositing are fused into the scan body,
  and the final blend (`test_inpainting_better.py:708-712`) is the epilogue.
- The whole K-step loop jits into one XLA program: zero host round-trips.

RNG contract: all noise comes from a single `key`. Injection noise is keyed
by `fold_in(inject_key, timestep)` which reproduces the reference's GT-noise
cache semantics (`gaussian_diffusion.py:85-108`) — reusing the same key across
calls yields identical noise at identical timesteps ("cumulative" mode), a
fresh key yields fresh noise.

Both injection placements are supported:
- "post" (default): inject AFTER the update step at the next noise level —
  the flagship eval-script behavior (`test_inpainting_better.py:456-474,569-584`).
- "pre": inject BEFORE the model call at the current level — the library
  behavior (`gaussian_diffusion.py:368-376,454-462`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import gaussian as gd
from ..diffusion.schedules import (
    DiffusionSchedule,
    get_named_beta_schedule,
    timestep_sequence,
)

__all__ = ["SamplerConfig", "inpaint_sample", "sample", "host_alphas_cumprod",
           "repaint_level_sequence"]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    # ddim | ddpm | dpm++2m | dpm++2m-sde | dpm++3m | unipc | repaint |
    # consistency
    method: str = "ddim"
    num_steps: Optional[int] = 100       # DDIM subset size; None = all T
    # explicit descending timestep grid (overrides num_steps) — used e.g.
    # to sample progressive-distillation students on their training grid
    timesteps: Optional[tuple] = None
    # how num_steps are placed on the T-step chain: "uniform" (reference
    # parity), "trailing" (arXiv:2305.08891), "lambda" (uniform in
    # log-SNR, the spacing DPM-Solver's error bounds assume), or "karras"
    # (rho=7 sigma ramp, arXiv:2206.00364 — denser near sigma_min)
    time_spacing: str = "uniform"
    eta: float = 0.0
    clip_denoised: bool = True
    injection: bool = True
    injection_point: str = "post"        # "post" (eval-script) | "pre" (library)
    injection_schedule: str = "all"      # "all" | "high" | "low"
    final_blend: bool = True
    mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON
    var_type: gd.ModelVarType = gd.ModelVarType.LEARNED_RANGE
    # Encoder-feature reuse across steps ("Faster Diffusion"/DeepCache-style):
    # run the UNet encoder+middle only every k-th step, reusing the cached
    # skip features (fresh timestep embedding) in between. 1 = off (exact).
    # Trades a small quality delta for skipping the encoder's ~22% of
    # per-step time on the non-key steps; requires a cache-capable model.
    encoder_cache_period: int = 1
    # Always run the full model on the last N steps regardless of period —
    # caching hurts most near t=0 where fine detail is resolved.
    encoder_cache_tail: int = 0
    # What the cache holds on non-key steps (only meaningful with
    # encoder_cache_period > 1):
    #   0  — encoder mode: cache encoder+middle features, recompute the
    #        full decoder (saves the encoder's ~22% of a step);
    #   b>0 — deep-trunk mode (DeepCache, arXiv:2312.00858): cache the
    #        decoder feature at branch depth b and recompute ONLY UNet
    #        levels 0..b-1 (both sides) on non-key steps. At the same
    #        period this skips strictly more compute than encoder mode
    #        (everything at/below level b instead of just encoder+middle)
    #        AND keeps the full-resolution skip features fresh — encoder
    #        mode freezes those, which is where the fine detail lives.
    #        FLOPs concentrate in the full-res levels here, so use b=1.
    #   -1 — output-reuse mode: skip the model ENTIRELY on non-key steps,
    #        replaying the previous raw output (eps + variance channels)
    #        through fresh per-step coefficients and injection. Zero
    #        model cost per skipped step — the cheapest and coarsest
    #        point on the caching frontier (the "skip" baseline of the
    #        step-caching literature; DeepCache arXiv:2312.00858 §5
    #        ablates against it). Needs no cache-capable model.
    cache_branch: int = 0
    # Explicit cache schedule: strictly ascending 0-based indices into the
    # respaced step grid that run the FULL model; every other step consumes
    # the cache. Replaces the periodic (encoder_cache_period) + tail gate —
    # encoder_cache_period > 1 is still required (it is the caching enable
    # switch), but the period/tail values are then ignored. Step 0 MUST be
    # in the grid (the zero-initialized cache would otherwise be consumed
    # before it is ever filled). Budget-matched non-uniform grids come from
    # `nonuniform_keysteps` — the generalized form of DeepCache's
    # non-uniform 1:N strategy (arXiv:2312.00858 §4.2: concentrate full
    # evaluations where features change fastest instead of uniformly).
    cache_keysteps: Optional[Tuple[int, ...]] = None
    # Emit intermediate frames every k-th step (0 = off). When > 0, the
    # sampler returns `(final, trajectory)` where trajectory is
    # [N, B, H, W, C] f32 holding the post-update (post-injection) state
    # after steps k-1, 2k-1, ... plus always the last step; N =
    # (K-1)//k + 1. Frames are PRE-final-blend. This is the progressive
    # API of the reference (`gaussian_diffusion.py:415-445,508-538` —
    # `*_sample_loop_progressive` yield every step), done scan-native: the
    # frames live in a fixed device buffer updated in place, so memory is
    # N frames, not K. trajectory_every=1 records every step.
    trajectory_every: int = 0
    # Refinement / partial diffusion (SDEdit, arXiv:2108.01073): run only
    # the last round(strength * K) steps of the grid, starting from the
    # CLEAN input q_sampled to the truncated grid's first timestep instead
    # of pure noise. strength=1 (default) is ordinary sampling; small
    # strengths harmonize existing hole content (a cheap fill, a previous
    # sample, a user edit) at a fraction of the model evaluations —
    # `pipe.inpaint(composite, mask, key, strength=0.3)`. The clean init is
    # `x_init` when given, else `gt` (which must then carry real hole
    # content, not zeros). Defined for ddim/ddpm/dpm methods.
    strength: float = 1.0
    # UniPC (method="unipc", arXiv:2302.04867): unified predictor-corrector
    # multistep solver in data-prediction form, B(h) = e^h - 1 variant
    # ("bh2" — chosen so the order-2 predictor coincides exactly with
    # DPM-Solver++(2M) on any grid; tested). unipc_order p = 2 or 3 is the
    # PREDICTOR order; the corrector reuses the model evaluation made at
    # each new point to apply a (p+1)-order-accurate correction at zero
    # extra model cost. Default order 2: on the analytic-ODE landscape
    # (tests/test_unipc.py) order 2 + corrector beats dpm++2m at every
    # K >= 8 on both uniform and lambda spacing, while order 3 is erratic
    # exactly like dpm++3m (large-h extrapolation). unipc_corrector=False
    # runs the bare UniP predictor (then order 2 == dpm++2m bitwise).
    # Deterministic; `eta` is ignored.
    unipc_order: int = 2
    unipc_corrector: bool = True
    # RePaint time-travel resampling (method="repaint", arXiv:2201.09865).
    # The reference's injection mechanism IS RePaint's conditioning step
    # (`gaussian_diffusion.py:114-157`); these add the resampling loop it
    # lacks: after each `jump_length` chain levels, jump back up
    # `jump_length` levels (forward diffusion) and re-denoise, for
    # `jump_n_sample` total passes per segment — harmonizing hole content
    # with the known region at ~jump_n_sample x the model evaluations.
    # jump_n_sample <= 1 degenerates to plain (respaced) DDPM.
    jump_length: int = 10
    jump_n_sample: int = 10
    # Final-image dtype, applied INSIDE the compiled program (zero extra
    # dispatch — on tunneled/DCN-attached hosts the f32 result download is
    # the dominant serving phase, ~85% of fast-tier latency; uint8 cuts
    # that transfer 4x). "uint8" reproduces the reference's toU8 exactly
    # (`test_inpainting_better.py:39-48`): ((x+1)*127.5).clamp(0,255) then
    # a truncating cast — bit-parity vs the torch oracle is tested.
    # Trajectory frames (trajectory_every > 0) stay f32 — they are a
    # debugging surface. "float32" (default) is the exact sampler output.
    output_dtype: str = "float32"


def host_alphas_cumprod(sched: DiffusionSchedule) -> np.ndarray:
    """Float64 cumulative alphas, recomputed on host for coefficient tables.

    Prefers the schedule's retained f64 host betas; named schedules can be
    regenerated; only a hand-built schedule lacking both falls back to the
    f32-rounded device table (last resort — T-step cumprods amplify the
    rounding)."""
    if getattr(sched, "betas_host", None) is not None:
        betas = np.asarray(sched.betas_host, dtype=np.float64)
    elif sched.name:
        betas = get_named_beta_schedule(sched.name, sched.num_timesteps)
    else:
        betas = np.asarray(sched.betas, dtype=np.float64)
    return np.cumprod(1.0 - betas, axis=0)


def _injection_gate(ts: np.ndarray, schedule: str, T: int) -> np.ndarray:
    if schedule == "all":
        return np.ones_like(ts, dtype=np.float64)
    half = T // 2
    if schedule == "high":
        return (ts >= half).astype(np.float64)
    if schedule == "low":
        return (ts < half).astype(np.float64)
    raise ValueError(f"unknown injection_schedule: {schedule}")


def _cache_keymask(cfg: SamplerConfig, K: int) -> np.ndarray:
    """Host boolean mask over the K scan steps: True = run the full model.

    Default is the periodic + tail gate (`step % period == 0` or the last
    `encoder_cache_tail` steps); `cfg.cache_keysteps` replaces it with an
    explicit grid, validated here at trace time (strictly ascending, in
    range, containing step 0 — the zero-initialized cache carry must be
    filled before any cached step consumes it)."""
    if cfg.cache_keysteps is None:
        steps = np.arange(K)
        return (steps % cfg.encoder_cache_period == 0) | (
            steps >= K - cfg.encoder_cache_tail)
    ks = np.asarray(cfg.cache_keysteps, dtype=np.int64)
    if ks.ndim != 1 or ks.size == 0 or (np.diff(ks) <= 0).any():
        raise ValueError(
            "cache_keysteps must be a non-empty strictly ascending tuple, "
            f"got {cfg.cache_keysteps!r}")
    if ks[0] != 0:
        raise ValueError(
            "cache_keysteps must include step 0: the feature cache is "
            "zero-initialized and must be written before it is read")
    if ks[-1] >= K:
        raise ValueError(
            f"cache_keysteps out of range: max index {int(ks[-1])} vs "
            f"{K} steps in this grid")
    mask = np.zeros(K, dtype=bool)
    mask[ks] = True
    return mask


def nonuniform_keysteps(K: int, n_key: int, *, center: float = 0.5,
                        power: float = 1.2) -> Tuple[int, ...]:
    """A non-uniform full-evaluation grid for `SamplerConfig.cache_keysteps`.

    Generalizes DeepCache's non-uniform 1:N strategy (arXiv:2312.00858
    §4.2): instead of one full evaluation every k steps, place the n_key
    full evaluations with a power-law density around `center` (a fraction
    of the chain: 0 = start / high noise, 1 = end / fine detail).
    power > 1 concentrates key steps NEAR the center; power < 1 pushes
    them toward the ends. center=0.5, power=1 is approximately uniform.

    Step 0 is always included (the cache must be filled first) and
    duplicates from rounding are dropped, so the returned grid can be
    shorter than n_key — compare schedules by len(grid) (the real
    model-evaluation budget), not by the requested n_key.
    """
    if not 1 <= n_key <= K:
        raise ValueError(f"n_key must be in [1, {K}], got {n_key}")
    if not 0.0 <= center <= 1.0:
        raise ValueError(f"center must be in [0, 1], got {center}")
    if power <= 0:
        raise ValueError(f"power must be positive, got {power}")
    u = np.linspace(-1.0, 1.0, n_key)
    c = center * (K - 1)
    radius = max(c, (K - 1) - c)
    idx = np.round(c + np.sign(u) * np.abs(u) ** power * radius)
    idx = np.clip(idx, 0, K - 1).astype(np.int64)
    idx = np.unique(np.concatenate(([0], idx)))
    return tuple(int(i) for i in idx)


def keysteps_from_spec(spec: str, K: int) -> Tuple[int, ...]:
    """Parse a CLI cache-schedule spec against a K-step chain.

    Two forms: an explicit comma list of ascending step indices
    ('0,3,7,12') used verbatim, or 'N@center:power' generating an
    N-evaluation `nonuniform_keysteps` grid (':power' optional,
    default 1.2) — e.g. '17@1.0:2.0' places 17 full evaluations
    concentrated at the low-noise end of the chain."""
    spec = spec.strip()
    if "@" in spec:
        n, _, cp = spec.partition("@")
        c, _, p = cp.partition(":")
        return nonuniform_keysteps(K, int(n), center=float(c),
                                   power=float(p) if p else 1.2)
    return tuple(int(s) for s in spec.split(","))


def _respaced_seq(sched: DiffusionSchedule, cfg: SamplerConfig,
                  acp: np.ndarray) -> np.ndarray:
    """The descending timestep grid for this config (explicit > spaced > full).

    cfg.strength < 1 keeps only the LAST round(strength * K) entries — the
    SDEdit truncation (the caller q_samples its clean init to the kept
    grid's first timestep, `_strength_init`)."""
    T = sched.num_timesteps
    if cfg.timesteps is not None:
        seq = np.asarray(cfg.timesteps, dtype=np.int64)
        assert (np.diff(seq) < 0).all(), "timesteps must be descending"
    else:
        K = cfg.num_steps or T
        seq = (np.arange(T)[::-1] if K >= T else
               timestep_sequence(T, K, cfg.time_spacing, alphas_cumprod=acp))
    if not 0.0 < cfg.strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {cfg.strength}")
    if cfg.strength < 1.0:
        k = max(1, int(round(cfg.strength * len(seq))))
        seq = seq[len(seq) - k:]
    return seq


def _consistency_seq(sched: DiffusionSchedule, cfg: SamplerConfig) -> tuple:
    """The K-evaluation grid for method="consistency": the first K of
    `distill.consistency_grid`'s K+1 boundaries (the last boundary, 0, is
    only ever a renoise target). An explicit cfg.timesteps wins. K near or
    above T makes the rounded grid collide; duplicates are dropped (keeping
    the chain strictly descending) rather than wasting model evaluations."""
    if cfg.timesteps is not None:
        return cfg.timesteps
    from ..distill.consistency import consistency_grid

    K = cfg.num_steps or sched.num_timesteps
    seq = consistency_grid(sched.num_timesteps, K)[:K]
    seq = seq[np.concatenate(([True], np.diff(seq) < 0))]
    return tuple(int(t) for t in seq)


def _ddim_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-step float64 coefficient tables for the respaced DDIM loop."""
    T = sched.num_timesteps
    acp = host_alphas_cumprod(sched)
    seq = _respaced_seq(sched, cfg, acp)

    a_t = acp[seq]
    a_prev = np.append(acp[seq[1:]], 1.0)  # last step's "previous" is x_0
    sigma = cfg.eta * np.sqrt((1 - a_prev) / (1 - a_t)) * np.sqrt(1 - a_t / a_prev)
    # posterior mean coefficients of the (respaced) chain, used to invert a
    # PREVIOUS_X model's output into pred_x0 (`_x0_eps_from_raw`); mirrors
    # `_predict_xstart_from_xprev` (gaussian_diffusion.py:307-314) on the
    # retained-step chain (SpacedDiffusion recomputes them the same way).
    # At the final step a_prev=1 gives coef1=1, coef2=0 (x0 = xprev).
    betas_r = 1.0 - a_t / a_prev
    post_c1 = betas_r * np.sqrt(a_prev) / (1.0 - a_t)
    post_c2 = (1.0 - a_prev) * np.sqrt(1.0 - betas_r) / (1.0 - a_t)
    return {
        "t": seq.astype(np.int32),
        "sqrt_one_minus_a_t": np.sqrt(1 - a_t),
        "sqrt_a_t": np.sqrt(a_t),
        "sqrt_a_prev": np.sqrt(a_prev),
        "dir_coef": np.sqrt(np.maximum(1 - a_prev - sigma**2, 0.0)),
        "sigma": sigma,
        # stochastic noise only when t > 0 and eta > 0 (test_inpainting_better.py:563)
        "noise_gate": (seq > 0).astype(np.float64) * (1.0 if cfg.eta > 0 else 0.0),
        # inject at the *previous* level after the update, skip at final step.
        # The high/low schedule gates on the CURRENT level (reference
        # semantics: `apply_inpainting_injection` tests the step's own t,
        # gaussian_diffusion.py:131-135) even though the post-injection
        # lands at seq[i+1] — intentional, do not "fix" to the target level
        "inject_gate": (seq > 0).astype(np.float64)
        * _injection_gate(seq, cfg.injection_schedule, T),
        "inject_sqrt_a": np.sqrt(a_prev),
        "inject_sqrt_1ma": np.sqrt(1 - a_prev),
        "inject_t": np.append(seq[1:], 0).astype(np.int32),
        # pre-injection (library mode) uses the *current* level t
        "pre_inject_gate": _injection_gate(seq, cfg.injection_schedule, T),
        "pre_inject_sqrt_a": np.sqrt(a_t),
        "pre_inject_sqrt_1ma": np.sqrt(1 - a_t),
        "xprev_inv_c1": 1.0 / post_c1,
        "xprev_c2c1": post_c2 / post_c1,
        "step": np.arange(len(seq), dtype=np.int32),
    }


def _dpm_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-step tables for DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095).

    Second-order multistep solver of the probability-flow ODE in
    data-prediction (x0) form — the standard way to get DDIM-100-level
    quality in ~20-25 model evaluations, a capability far beyond the
    reference's samplers (its only acceleration is first-order DDIM step
    subsetting, `test_inpainting_better.py:395-408`).

    With lambda = log(alpha/sigma) (log-SNR/2), h_i = lambda_prev - lambda_cur:
        D_hat_i = (1 + c_i) * D_i - c_i * D_{i-1},   c_i = h_i / (2 h_{i-1})
        x_prev  = (sigma_prev/sigma_cur) * x + alpha_prev*(1 - e^{-h_i}) * D_hat_i
    c_0 = 0 (first step = first-order = deterministic DDIM), and the final
    step to alpha_bar_prev = 1 (h = inf) also drops to first order
    (diffusers' `lower_order_final`): there coef_x -> 0, coef_D -> 1, so x
    collapses exactly to the x0 prediction. Deterministic: `eta` is ignored.
    Injection tables are shared with the DDIM loop (same levels).
    """
    base = _ddim_tables(sched, dataclasses.replace(cfg, eta=0.0))
    a_t = base["sqrt_a_t"].astype(np.float64) ** 2
    a_prev = base["sqrt_a_prev"].astype(np.float64) ** 2
    alpha_t, sigma_t = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    alpha_p, sigma_p = np.sqrt(a_prev), np.sqrt(1.0 - a_prev)
    with np.errstate(divide="ignore"):
        lam_t = 0.5 * (np.log(a_t) - np.log1p(-a_t))
        lam_p = 0.5 * (np.log(a_prev) - np.log1p(-a_prev))  # +inf at a_prev=1
    h = lam_p - lam_t
    h_prev = np.concatenate([[np.inf], h[:-1]])  # i=0: c -> 0 (first-order)
    corr = np.where(np.isfinite(h), h / (2.0 * h_prev), 0.0)
    base["corr"] = corr
    base["coef_x"] = sigma_p / sigma_t
    # alpha_p * (1 - exp(-h)) in a form finite at h = inf
    base["coef_D"] = alpha_p - sigma_p * alpha_t / sigma_t
    if cfg.method == "dpm++2m-sde":
        # SDE variant (diffusers' algorithm_type="sde-dpmsolver++", 2nd-order
        # multistep): same D-hat correction, but the linear term contracts by
        # exp(-2h) and fresh noise of matching variance is injected — the
        # stochastic analogue of DDIM eta=1 with 2nd-order accuracy:
        #   x_prev = (sigma_p/sigma_t) e^{-h} x + alpha_p (1-e^{-2h}) D_hat
        #            + sigma_p sqrt(1-e^{-2h}) z
        # exp(-h) = (sigma_p alpha_t)/(sigma_t alpha_p); finite everywhere,
        # -> 0 at the final step (a_prev = 1) where the noise term vanishes.
        exp_mh = np.where(
            a_prev < 1.0, (sigma_p / sigma_t) * (alpha_t / np.maximum(alpha_p, 1e-30)), 0.0
        )
        base["coef_x"] = (sigma_p / sigma_t) * exp_mh
        base["coef_D"] = alpha_p * (1.0 - exp_mh**2)
        base["sde_noise"] = sigma_p * np.sqrt(1.0 - exp_mh**2)
    # DDIM-only entries the dpm update never reads — keep them out of the
    # device xs so the table contract is explicit
    for unused in ("dir_coef", "sigma", "noise_gate", "sqrt_a_prev"):
        del base[unused]
    return base


def _dpm3m_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-step tables for DPM-Solver++(3M) — third-order multistep in
    data-prediction form (arXiv:2211.01095; the update matches diffusers'
    `multistep_dpm_solver_third_order_update`, algorithm_type
    "dpmsolver++", solver_order=3).

    With lambda = log(alpha/sigma), h the current step and h0/h1 the two
    previous steps (denoising direction), r0 = h0/h, r1 = h1/h and m0/m1/m2
    the last three x0 predictions:
        D1_0 = (m0 - m1)/r0,  D1_1 = (m1 - m2)/r1
        D1   = D1_0 + r0/(r0+r1) * (D1_0 - D1_1)
        D2   = (D1_0 - D1_1) / (r0 + r1)
        x <- (sigma_p/sigma_t) x + alpha_p(1 - e^{-h}) m0
             + alpha_p((e^{-h}-1)/h + 1) D1
             - alpha_p((e^{-h}-1+h)/h^2 - 1/2) D2
    Order warmup mirrors diffusers: step 0 is first-order, step 1 runs the
    2M update (folded in here as c2 = phi1/2, D1 = D1_0), the final step
    to alpha_bar = 1 (h = inf) collapses to first order (x = m0), and with
    fewer than 15 total steps the second-to-last step also drops to the 2M
    update (diffusers' lower_order_second stabilizer).
    Deterministic; `eta` is ignored. Injection tables are shared with the
    DDIM loop (same levels). Third order pays off for smooth (well-trained,
    unguided) models at <= ~15 steps; prefer 2M/SDE otherwise — same
    caveats as docs/TUNING.md §2b.
    """
    base = _ddim_tables(sched, dataclasses.replace(cfg, eta=0.0))
    a_t = base["sqrt_a_t"].astype(np.float64) ** 2
    a_prev = base["sqrt_a_prev"].astype(np.float64) ** 2
    alpha_t, sigma_t = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    alpha_p, sigma_p = np.sqrt(a_prev), np.sqrt(1.0 - a_prev)
    with np.errstate(divide="ignore"):
        lam_t = 0.5 * (np.log(a_t) - np.log1p(-a_t))
        lam_p = 0.5 * (np.log(a_prev) - np.log1p(-a_prev))  # +inf at a_prev=1
    h = lam_p - lam_t
    h0 = np.concatenate([[np.inf], h[:-1]])
    h1 = np.concatenate([[np.inf], h0[:-1]])
    step_i = np.arange(len(h))
    finite = np.isfinite(h)
    ord3 = finite & (step_i >= 2) & np.isfinite(h0) & np.isfinite(h1)
    if len(h) < 15:
        # diffusers' lower_order_second stabilizer: with < 15 total steps
        # the second-to-last step runs the 2M update (the final step is
        # already first-order via h = inf) — third order into the largest
        # log-SNR step near t=0 is the least stable extrapolation
        ord3 &= step_i != len(h) - 2
    ord2 = finite & (step_i >= 1) & np.isfinite(h0) & ~ord3
    h_safe = np.where(finite, h, 1.0)
    exp_mh = np.where(finite, np.exp(-h_safe), 0.0)
    phi1 = alpha_p - sigma_p * alpha_t / sigma_t  # alpha_p(1-e^{-h}), finite
    base["coef_x"] = sigma_p / sigma_t
    base["phi1"] = phi1
    base["c2"] = np.where(
        ord3, alpha_p * ((exp_mh - 1.0) / h_safe + 1.0),
        np.where(ord2, 0.5 * phi1, 0.0),
    )
    base["c3"] = np.where(
        ord3, alpha_p * ((exp_mh - 1.0 + h_safe) / h_safe**2 - 0.5), 0.0
    )
    with np.errstate(invalid="ignore"):
        base["inv_r0"] = np.where(ord2 | ord3, h_safe / h0, 0.0)  # 1/r0
        base["inv_r1"] = np.where(ord3, h_safe / h1, 0.0)         # 1/r1
        base["w"] = np.where(ord3, h0 / (h0 + h1), 0.0)     # r0/(r0+r1)
        base["inv_r01"] = np.where(ord3, h_safe / (h0 + h1), 0.0)
    for unused in ("dir_coef", "sigma", "noise_gate", "sqrt_a_prev"):
        del base[unused]
    return base


def _unipc_b_coeffs(h: float, order: int) -> np.ndarray:
    """The UniPC right-hand side b_k = h*phi_{k+1}(-h) * k! / B(h), k=1..order
    (arXiv:2302.04867 eq. 14-16, data-prediction form, B(h) = e^{-h} - 1 in
    the hh = -h convention — the "bh2" variant). Computed with the expm1
    recurrence phi_{k+1}(z) = (phi_k(z) - 1/k!) / z to avoid cancellation."""
    hh = -h
    h_phi_1 = np.expm1(hh)
    B_h = h_phi_1  # bh2
    b = np.empty(order)
    h_phi_k = h_phi_1 / hh - 1.0
    fact = 1.0
    for i in range(1, order + 1):
        b[i - 1] = h_phi_k * fact / B_h
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    return b


def _unipc_rhos(rks: np.ndarray, h: float, order: int,
                corrector: bool) -> np.ndarray:
    """Solve the UniPC Vandermonde system R rho = b in float64.

    rks has `order` entries: the order-1 normalized previous-point offsets
    r_j = (lambda_j - lambda_0)/h plus a trailing 1.0 for the new point.
    The predictor (UniP) drops the new point (solves the top-left
    (order-1)^2 block); the corrector (UniC) solves the full system. The
    low-order special cases match diffusers' UniPCMultistepScheduler
    (predictor order 2 -> [0.5], corrector order 1 -> [0.5]) — which is
    also what the B(h) system yields in the h -> 0 limit."""
    R = np.vstack([rks ** k for k in range(order)])
    b = _unipc_b_coeffs(h, order)
    if corrector:
        if order == 1:
            return np.array([0.5])
        return np.linalg.solve(R, b)
    if order == 2:
        return np.array([0.5])
    return np.linalg.solve(R[:-1, :-1], b[:-1])


def _unipc_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-step tables for UniPC (arXiv:2302.04867), data-prediction form.

    Each scan step i makes ONE model evaluation at (x_i, t_i), converts it
    to an x0 prediction m_new, then:
      corrector (i >= 1): rebuild the sample at t_i from the sample the
        previous predictor stepped FROM (last_x, at t_{i-1}) using the
        history AND m_new — the UniC-p update, one order higher than the
        predictor that produced x_i, at zero extra model cost;
      predictor: step the corrected x_i to t_{i+1} with the UniP-p update
        over {m_new} + history.
    All D1 divisions by r_j are folded into the coefficients, so the scan
    consumes plain linear combinations:
      x_corr = c_coef_x*last_x + c_coef_m0*hist0
               + sum_j c_c[j]*(hist_j - hist0) + c_new*(m_new - hist0)
      x_next = p_coef_x*x_corr + p_coef_m0*m_new
               + sum_j p_c[j]*(hist_j - m_new)
    Order warmup: predictor order min(unipc_order, i+1, K-i) (ramp-up +
    diffusers' lower_order_final: the terminal step to alpha_bar=1 has
    h = inf and collapses to x = m_new); the corrector at step i uses the
    order of the predictor that produced x_i (step i-1's).
    """
    order = int(cfg.unipc_order)
    if not 1 <= order <= 3:
        raise ValueError(f"unipc_order must be 1, 2, or 3, got {order}")
    base = _ddim_tables(sched, dataclasses.replace(cfg, eta=0.0))
    a_t = base["sqrt_a_t"].astype(np.float64) ** 2
    a_prev = base["sqrt_a_prev"].astype(np.float64) ** 2
    alpha_t, sigma_t = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    alpha_p, sigma_p = np.sqrt(a_prev), np.sqrt(1.0 - a_prev)
    with np.errstate(divide="ignore"):
        lam = 0.5 * (np.log(a_t) - np.log1p(-a_t))
        lam_p = 0.5 * (np.log(a_prev) - np.log1p(-a_prev))  # +inf at a_prev=1
    K = len(lam)
    D = max(order - 1, 1)  # history depth consumed by the predictor
    p_c = np.zeros((K, D))
    c_c = np.zeros((K, D))
    c_new = np.zeros(K)
    c_on = np.zeros(K)
    c_coef_x = np.zeros(K)
    c_coef_m0 = np.zeros(K)
    p_order = np.zeros(K, dtype=np.int64)
    for i in range(K):
        p_order[i] = min(order, i + 1, K - i)
    # predictor coefficients, step i -> i+1 (h may be inf on the last step)
    h = lam_p - lam
    finite = np.isfinite(h)
    h_safe = np.where(finite, h, 1.0)
    exp_mh = np.where(finite, np.exp(-h_safe), 0.0)
    p_coef_x = np.where(finite, sigma_p / sigma_t, 0.0)
    p_coef_m0 = alpha_p * (1.0 - exp_mh)
    B_h = exp_mh - 1.0  # bh2: B(hh) = expm1(hh), hh = -h
    for i in range(K):
        p = int(p_order[i])
        if p < 2 or not finite[i]:
            continue
        rks = np.array([(lam[i - j] - lam[i]) / h[i] for j in range(1, p)]
                       + [1.0])
        rhos = _unipc_rhos(rks, h[i], p, corrector=False)
        for j in range(p - 1):
            p_c[i, j] = -alpha_p[i] * B_h[i] * rhos[j] / rks[j]
    # corrector at step i rebuilds the sample at t_i over [t_{i-1}, t_i]
    if cfg.unipc_corrector:
        for i in range(1, K):
            co = int(p_order[i - 1])  # order of the predictor that made x_i
            h_c = lam[i] - lam[i - 1]
            rks = np.array(
                [(lam[i - 1 - j] - lam[i - 1]) / h_c for j in range(1, co)]
                + [1.0])
            rhos = _unipc_rhos(rks, h_c, co, corrector=True)
            c_on[i] = 1.0
            c_coef_x[i] = sigma_t[i] / sigma_t[i - 1]
            c_coef_m0[i] = alpha_t[i] * -np.expm1(-h_c)
            B_hc = np.expm1(-h_c)
            for j in range(co - 1):
                c_c[i, j] = -alpha_t[i] * B_hc * rhos[j] / rks[j]
            c_new[i] = -alpha_t[i] * B_hc * rhos[co - 1]
    base["p_coef_x"] = p_coef_x
    base["p_coef_m0"] = p_coef_m0
    base["c_coef_x"] = c_coef_x
    base["c_coef_m0"] = c_coef_m0
    base["c_new"] = c_new
    base["c_on"] = c_on
    for j in range(D):
        base[f"p_c{j}"] = p_c[:, j]
        base[f"c_c{j}"] = c_c[:, j]
    for unused in ("dir_coef", "sigma", "noise_gate", "sqrt_a_prev"):
        del base[unused]
    return base


def _ddpm_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-step tables for the (optionally respaced) ancestral loop.

    With num_steps < T this is SpacedDiffusion-style DDPM respacing
    (Improved-DDPM): the retained timesteps define a new chain with
    beta'_k = 1 - acp[t_k]/acp[t_{k-1}], and the posterior/variance tables
    are recomputed for that chain — a capability the reference lacks
    entirely (its library loops always iterate all T,
    `gaussian_diffusion.py:429,522`).

    Injection after the update uses the previous retained level
    (`test_inpainting_better.py:456-474`).
    """
    T = sched.num_timesteps
    acp = host_alphas_cumprod(sched)
    seq = _respaced_seq(sched, cfg, acp)

    # respaced chain quantities (equal the originals when seq == arange)
    a_cur = acp[seq]                      # alpha-bar at each retained step
    a_prev = np.append(acp[seq[1:]], 1.0)  # previous retained level
    betas_r = 1.0 - a_cur / a_prev
    post_var = betas_r * (1.0 - a_prev) / (1.0 - a_cur)
    # log-variance clipped like gaussian_diffusion.py:72-74 (first entry
    # replaced by the next one to avoid log(0))
    post_var_for_log = post_var.copy()
    if len(post_var_for_log) > 1:
        post_var_for_log[-1] = post_var_for_log[-2]  # last step ~ t=0
    post_logvar = np.log(np.maximum(post_var_for_log, 1e-20))
    a_inj = a_prev
    return {
        "post_coef1": betas_r * np.sqrt(a_prev) / (1.0 - a_cur),
        "post_coef2": (1.0 - a_prev) * np.sqrt(1.0 - betas_r) / (1.0 - a_cur),
        "post_logvar": post_logvar,
        "log_beta": np.log(np.maximum(betas_r, 1e-20)),
        "sqrt_a_t": np.sqrt(a_cur),
        "sqrt_one_minus_a_t": np.sqrt(1.0 - a_cur),
        "t": seq.astype(np.int32),
        # no noise on the transition that LANDS at x0 (a_prev == 1) — keyed
        # to the target level, not `seq > 0`: under "trailing" spacing the
        # final retained step is t > 0 but its respaced transition is still
        # the terminal, zero-variance one
        "noise_gate": (a_prev < 1.0).astype(np.float64),
        "inject_gate": (seq > 0).astype(np.float64)
        * _injection_gate(seq, cfg.injection_schedule, T),
        "inject_sqrt_a": np.sqrt(a_inj),
        "inject_sqrt_1ma": np.sqrt(1 - a_inj),
        "inject_t": np.append(seq[1:], 0).astype(np.int32),
        "pre_inject_gate": _injection_gate(seq, cfg.injection_schedule, T),
        "pre_inject_sqrt_a": np.sqrt(acp[seq]),
        "pre_inject_sqrt_1ma": np.sqrt(1 - acp[seq]),
        "step": np.arange(len(seq), dtype=np.int32),
    }


def repaint_level_sequence(K: int, jump_length: int,
                           jump_n_sample: int) -> np.ndarray:
    """RePaint time-travel visit order over K retained chain levels.

    Level 0 is the noisiest retained step, K-1 the least noisy. Returns the
    sequence of visited levels: denoising moves +1; at every
    `jump_length`-th level the walk jumps back `jump_length` levels
    (re-noising, one level at a time) and re-denoises, `jump_n_sample - 1`
    extra times per jump site — our index-space equivalent of RePaint's
    schedule-with-jumps (arXiv:2201.09865 §4.2). `jump_n_sample <= 1` or
    `jump_length <= 0` degenerates to `arange(K)` (plain respaced DDPM).
    """
    if jump_length <= 0 or jump_n_sample <= 1 or K <= 1:
        return np.arange(K)
    jumps = {k: jump_n_sample - 1 for k in range(jump_length, K, jump_length)}
    levels = [0]
    k = 0
    while k < K - 1:
        k += 1
        levels.append(k)
        if jumps.get(k, 0) > 0:
            jumps[k] -= 1
            for _ in range(jump_length):
                k -= 1
                levels.append(k)
    return np.asarray(levels, dtype=np.int64)


def _repaint_tables(sched: DiffusionSchedule, cfg: SamplerConfig):
    """Per-transition tables for RePaint (method="repaint").

    Each row is one transition of the time-travel walk: either a *denoise*
    step (one ancestral DDPM step along the respaced chain — row L of
    `_ddpm_tables` encodes exactly the L -> L+1 transition, so those rows
    are reused verbatim; with jump_n_sample <= 1 the tables are identical
    to `_ddpm_tables` and the sampler is bit-equal to method="ddpm") or a
    *renoise* step (one forward q step back up to the previous, noisier
    level: x <- sqrt(acp_tgt/acp_cur) x + sqrt(1 - acp_tgt/acp_cur) z).
    After a renoise, post-injection re-pins the known region at the target
    level, mirroring RePaint's per-visit conditioning.
    """
    T = sched.num_timesteps
    acp = host_alphas_cumprod(sched)
    seq = _respaced_seq(sched, cfg, acp)
    K = len(seq)
    base = _ddpm_tables(sched, cfg)
    levels = repaint_level_sequence(K, cfg.jump_length, cfg.jump_n_sample)
    # transitions between consecutive visited levels, plus the final
    # denoise from level K-1 to x0 (base row K-1; pseudo-level K = x0)
    cur = np.append(levels[:-1], K - 1)
    nxt = np.append(levels[1:], K)
    down = nxt == cur + 1
    up = ~down
    assert (nxt[up] == cur[up] - 1).all(), "walk must move one level at a time"
    N = len(cur)

    rows = {}
    # valid on every row, indexed by the current level
    for k in ("t", "pre_inject_gate", "pre_inject_sqrt_a",
              "pre_inject_sqrt_1ma"):
        rows[k] = np.asarray(base[k])[cur]
    # denoise-only fields (zeros on renoise rows; the lax.cond branch that
    # would read them is never taken there)
    for k in ("post_coef1", "post_coef2", "post_logvar", "log_beta",
              "sqrt_a_t", "sqrt_one_minus_a_t", "noise_gate",
              "inject_gate", "inject_sqrt_a", "inject_sqrt_1ma", "inject_t"):
        v = np.asarray(base[k])
        out = np.zeros(N, dtype=v.dtype)
        out[down] = v[cur[down]]
        rows[k] = out
    # renoise rows: one forward q step to the noisier target level
    a_cur = acp[seq[cur[up]]]
    a_tgt = acp[seq[nxt[up]]]
    ratio = a_tgt / a_cur
    keep_ = np.zeros(N)
    std_ = np.zeros(N)
    keep_[up] = np.sqrt(ratio)
    std_[up] = np.sqrt(1.0 - ratio)
    rows["renoise_keep"] = keep_
    rows["renoise_std"] = std_
    # post-injection after a renoise pins the known region at the target
    # level (always t > 0 there, so no t=0 gate needed)
    t_tgt = seq[nxt[up]]
    rows["inject_gate"][up] = _injection_gate(t_tgt, cfg.injection_schedule, T)
    rows["inject_sqrt_a"][up] = np.sqrt(a_tgt)
    rows["inject_sqrt_1ma"][up] = np.sqrt(1.0 - a_tgt)
    rows["inject_t"][up] = t_tgt
    rows["is_denoise"] = down.astype(np.int32)
    rows["step"] = np.arange(N, dtype=np.int32)
    return rows


def _to_device_xs(tables, dtype=jnp.float32):
    return {
        k: jnp.asarray(v, dtype=jnp.int32 if v.dtype.kind == "i" else dtype)
        for k, v in tables.items()
    }


def _x0_eps_from_raw(raw, x, s, cfg: SamplerConfig):
    """(pred_x0, eps) from the model's raw 3-channel output per mean_type.

    EPSILON keeps the reference behavior exactly: the DDIM direction term
    uses the raw eps, NOT an eps re-derived from the clipped x0
    (`test_inpainting_better.py:547-567`).
    """
    if cfg.mean_type == gd.ModelMeanType.EPSILON:
        pred_x0 = (x - s["sqrt_one_minus_a_t"] * raw) / s["sqrt_a_t"]
        return pred_x0, raw
    if cfg.mean_type == gd.ModelMeanType.VELOCITY:
        pred_x0 = s["sqrt_a_t"] * x - s["sqrt_one_minus_a_t"] * raw
    elif cfg.mean_type == gd.ModelMeanType.START_X:
        pred_x0 = raw
    elif cfg.mean_type == gd.ModelMeanType.PREVIOUS_X:
        # invert the posterior mean: the model's x_{t-1} prediction maps to
        # pred_x0 via the respaced-chain coefficients baked into the tables
        # (`_predict_xstart_from_xprev`, gaussian_diffusion.py:307-314) —
        # this closes the scan-sampler xprev hole: ddim/dpm/consistency all
        # flow through here
        pred_x0 = s["xprev_inv_c1"] * raw - s["xprev_c2c1"] * x
    else:
        raise NotImplementedError(cfg.mean_type)
    eps = (x - s["sqrt_a_t"] * pred_x0) / s["sqrt_one_minus_a_t"]
    return pred_x0, eps


def _ddpm_mean_logvar(out, x, s, cfg: SamplerConfig):
    """Posterior mean and log-variance from the model output, using the
    (possibly respaced) per-step tables — the in-scan equivalent of
    `p_mean_variance` (gaussian_diffusion.py:213-298)."""
    raw, var_values = gd.split_model_output(out, cfg.var_type)
    if cfg.mean_type == gd.ModelMeanType.PREVIOUS_X:
        # model predicts x_{t-1} directly (gaussian_diffusion.py:274-278)
        mean = raw
        return mean, _ddpm_logvar(var_values, x, s, cfg)
    pred_x0, _ = _x0_eps_from_raw(raw, x, s, cfg)
    if cfg.clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    mean = s["post_coef1"] * pred_x0 + s["post_coef2"] * x
    return mean, _ddpm_logvar(var_values, x, s, cfg)


def _ddpm_logvar(var_values, x, s, cfg: SamplerConfig):
    if cfg.var_type == gd.ModelVarType.LEARNED_RANGE:
        frac = (var_values + 1.0) / 2.0
        return frac * s["log_beta"] + (1.0 - frac) * s["post_logvar"]
    if cfg.var_type == gd.ModelVarType.LEARNED:
        return var_values
    if cfg.var_type == gd.ModelVarType.FIXED_LARGE:
        # variance beta_t (the t=0 entry differs in the reference but is
        # multiplied by a zero noise gate there)
        return jnp.broadcast_to(s["log_beta"], x.shape)
    # FIXED_SMALL
    return jnp.broadcast_to(s["post_logvar"], x.shape)


def _guide_eps(cond_fn, x, s, B, pred_x0):
    """`condition_score` inside the scan (gaussian_diffusion.py:339-355):
    eps from the (possibly clipped) x0 prediction, shifted by
    -sqrt(1-alpha_bar) * grad log p(y|x_t), x0 re-derived (no re-clip)."""
    t_full = jnp.full((B,), s["t"], jnp.int32)
    grad = cond_fn(x, t_full)
    eps = (x - s["sqrt_a_t"] * pred_x0) / s["sqrt_one_minus_a_t"]
    eps = eps - s["sqrt_one_minus_a_t"] * grad
    pred_x0 = (x - s["sqrt_one_minus_a_t"] * eps) / s["sqrt_a_t"]
    return pred_x0, eps


def _guide_mean(cond_fn, x, s, B, mean, logvar):
    """`condition_mean` inside the scan (gaussian_diffusion.py:326-337):
    posterior mean shifted by variance * grad log p(y|x_t)."""
    t_full = jnp.full((B,), s["t"], jnp.int32)
    return mean + jnp.exp(logvar) * cond_fn(x, t_full)


def _is_batched_key(key) -> bool:
    """True for PER-SAMPLE key arrays: [B] typed keys or [B, 2] raw uint32.

    With a batched key, every noise draw in the sampler is made
    per-sample-independently (vmap over the key rows), so row i of a
    batched run equals the batch-1 run with key i exactly — results no
    longer depend on batch composition. This is the serving determinism
    contract (serving/server.py builds one key per request); a plain
    single key keeps the historical whole-batch draws bit-for-bit."""
    if isinstance(key, (tuple, list)):
        return False
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def _key_split(key, n):
    """jax.random.split handling batched per-sample keys (see _is_batched_key)."""
    if _is_batched_key(key):
        ks = jax.vmap(lambda k: jax.random.split(k, n))(key)
        return tuple(ks[:, i] for i in range(n))
    ks = jax.random.split(key, n)
    return tuple(ks[i] for i in range(n))


def _key_fold(key, data):
    if _is_batched_key(key):
        return jax.vmap(lambda k: jax.random.fold_in(k, data))(key)
    return jax.random.fold_in(key, data)


def _key_normal(key, shape, dtype=jnp.float32):
    """Standard-normal draw of `shape`; batched keys draw row i from key i."""
    if _is_batched_key(key):
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(key)
    return jax.random.normal(key, shape, dtype)


def _check_key_batch(key, B: int):
    if _is_batched_key(key) and key.shape[0] != B:
        raise ValueError(
            f"per-sample key batch {key.shape[0]} != input batch {B} "
            "(pass one key per sample, or a single unbatched key)")


def _strength_init(sched, cfg: SamplerConfig, clean, init_key):
    """SDEdit init: q_sample `clean` to the truncated grid's first timestep.

    Raises for methods whose grids don't truncate (repaint's time-travel
    ladder, consistency's boundary grid)."""
    if cfg.method in ("repaint", "consistency"):
        raise ValueError(
            f"strength < 1 is defined for ddim/ddpm/dpm methods, not "
            f"{cfg.method!r}")
    acp = host_alphas_cumprod(sched)
    seq = _respaced_seq(sched, cfg, acp)
    a0 = float(acp[int(seq[0])])
    noise = _key_normal(init_key, clean.shape, jnp.float32)
    return np.sqrt(a0) * clean.astype(jnp.float32) + np.sqrt(1.0 - a0) * noise


def _gt_noise(inject_key, timestep, shape, dtype):
    """Injection noise keyed by timestep — the cache contract (see module doc)."""
    return _key_normal(_key_fold(inject_key, timestep), shape, dtype)


def _maybe_pre_inject(x, xs, gt, keep, inject_key, enabled):
    if not enabled:
        return x
    noise = _gt_noise(inject_key, xs["t"], gt.shape, gt.dtype)
    noised = xs["pre_inject_sqrt_a"] * gt + xs["pre_inject_sqrt_1ma"] * noise
    injected = keep * noised + (1.0 - keep) * x
    return x + xs["pre_inject_gate"] * (injected - x)


def _maybe_post_inject(x, xs, gt, keep, inject_key, enabled):
    if not enabled:
        return x
    noise = _gt_noise(inject_key, xs["inject_t"], gt.shape, gt.dtype)
    noised = xs["inject_sqrt_a"] * gt + xs["inject_sqrt_1ma"] * noise
    injected = (1.0 - keep) * x + keep * noised
    return x + xs["inject_gate"] * (injected - x)


def _traj_recorder(cfg: SamplerConfig, K: int, x):
    """(traj0, record) implementing cfg.trajectory_every (see its doc).

    traj0 is the zero-initialized [N, *x.shape] frame buffer carried through
    the scan; `record(traj, x, s)` conditionally writes x into slot
    s["step"] // k (`lax.cond` + in-place dynamic_update_slice — non-emit
    steps touch nothing). With trajectory off both are no-ops (traj0=None)."""
    k = cfg.trajectory_every
    if k <= 0:
        return None, lambda traj, x, s: traj
    if K <= 0:
        raise ValueError("trajectory_every > 0 needs at least one step")
    n = (K - 1) // k + 1
    traj0 = jnp.zeros((n,) + tuple(x.shape), jnp.float32)

    def record(traj, x, s):
        emit = (((s["step"] + 1) % k) == 0) | (s["step"] == K - 1)
        return jax.lax.cond(
            emit,
            lambda tr: jax.lax.dynamic_update_slice_in_dim(
                tr, x[None].astype(tr.dtype), s["step"] // k, axis=0),
            lambda tr: tr,
            traj,
        )

    return traj0, record


def _shared_update(sched, cfg, x, step_key, B, cond_fn, extract_raw):
    """(xs, aux0, update) for the methods whose per-step update is identical
    between `inpaint_sample` and `sample` — everything except DDIM, whose
    eps derivation deliberately differs (eval-script vs library semantics)
    and which stays in each entry point. `extract_raw(out)` is the only
    caller-specific part (inpaint slices `out[..., :3]`; the library path
    splits learned variance off via `gd.split_model_output`)."""
    if cfg.method == "ddpm":
        xs = _to_device_xs(_ddpm_tables(sched, cfg))

        def update(x, aux, s, out):
            mean, logvar = _ddpm_mean_logvar(out, x, s, cfg)
            if cond_fn is not None:
                mean = _guide_mean(cond_fn, x, s, B, mean, logvar)
            noise = _key_normal(_key_fold(step_key, s["step"]),
                                x.shape, x.dtype)
            return mean + s["noise_gate"] * jnp.exp(0.5 * logvar) * noise, aux

        return xs, None, update

    if cfg.method in ("dpm++2m", "dpm++2m-sde"):
        xs = _to_device_xs(_dpm_tables(sched, cfg))
        sde = cfg.method == "dpm++2m-sde"

        def update(x, prev_x0, s, out):
            pred_x0, _ = _x0_eps_from_raw(extract_raw(out), x, s, cfg)
            if cfg.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            d_hat = (1.0 + s["corr"]) * pred_x0 - s["corr"] * prev_x0
            x_new = s["coef_x"] * x + s["coef_D"] * d_hat
            if sde:
                noise = _key_normal(_key_fold(step_key, s["step"]),
                                    x.shape, x.dtype)
                x_new = x_new + s["sde_noise"] * noise
            return x_new, pred_x0

        # aux: previous x0 prediction, consumed only when corr > 0 (never
        # at step 0)
        return xs, jnp.zeros_like(x), update

    if cfg.method == "dpm++3m":
        xs = _to_device_xs(_dpm3m_tables(sched, cfg))

        def update(x, aux, s, out):
            m1, m2 = aux
            pred_x0, _ = _x0_eps_from_raw(extract_raw(out), x, s, cfg)
            if cfg.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            d1_0 = s["inv_r0"] * (pred_x0 - m1)
            d1_1 = s["inv_r1"] * (m1 - m2)
            d1 = d1_0 + s["w"] * (d1_0 - d1_1)
            d2 = s["inv_r01"] * (d1_0 - d1_1)
            x_new = (s["coef_x"] * x + s["phi1"] * pred_x0
                     + s["c2"] * d1 - s["c3"] * d2)
            return x_new, (pred_x0, m1)

        # carry the last two x0 predictions; zeros are never consumed
        # (inv_r0/inv_r1 gate them to 0 during the order warmup)
        return xs, (jnp.zeros_like(x), jnp.zeros_like(x)), update

    if cfg.method == "unipc":
        xs = _to_device_xs(_unipc_tables(sched, cfg))
        depth = max(int(cfg.unipc_order), 1)   # history entries carried
        width = max(int(cfg.unipc_order) - 1, 1)  # coefficient slots

        def update(x, aux, s, out):
            last_x, hist = aux
            m_new, _ = _x0_eps_from_raw(extract_raw(out), x, s, cfg)
            if cfg.clip_denoised:
                m_new = jnp.clip(m_new, -1.0, 1.0)
            # UniC: rebuild the sample at this level from last_x using the
            # evaluation just made (c_on = 0 at step 0 -> keep x)
            x_c = (s["c_coef_x"] * last_x + s["c_coef_m0"] * hist[0]
                   + s["c_new"] * (m_new - hist[0]))
            for j in range(width):
                if j + 1 < depth:
                    x_c = x_c + s[f"c_c{j}"] * (hist[j + 1] - hist[0])
            x = x + s["c_on"] * (x_c - x)
            # UniP: step the corrected sample to the next level
            x_next = s["p_coef_x"] * x + s["p_coef_m0"] * m_new
            for j in range(width):
                x_next = x_next + s[f"p_c{j}"] * (hist[j] - m_new)
            return x_next, (x, (m_new,) + hist[:-1])

        # aux: (the sample each predictor steps FROM, x0-prediction history
        # newest-first). Zero entries are never consumed: the warmup orders
        # gate their coefficients to 0.
        hist0 = tuple(jnp.zeros_like(x) for _ in range(depth))
        return xs, (jnp.zeros_like(x), hist0), update

    if cfg.method == "consistency":
        # multistep consistency sampling (Song et al. 2023, Alg. 1, VP
        # form) for consistency students (distill/consistency.py): each
        # step maps straight to x0 under the student's mean-type, then
        # renoises to the next grid level. The DDIM tables already carry
        # both coefficients — sqrt_a_prev for the renoise scale and
        # sqrt(1 - a_prev) (= inject_sqrt_1ma) for its std, which is 0 on
        # the final step so the scan ends exactly at the x0 prediction.
        # num_steps=K means exactly K model evaluations on the first K
        # consistency_grid boundaries (NOT uniform DDIM respacing, which
        # appends an extra t=0 row the student never trains on).
        xs = _to_device_xs(
            _ddim_tables(sched, dataclasses.replace(
                cfg, eta=0.0, timesteps=_consistency_seq(sched, cfg))))

        def update(x, aux, s, out):
            pred_x0, _ = _x0_eps_from_raw(extract_raw(out), x, s, cfg)
            if cfg.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            noise = _key_normal(_key_fold(step_key, s["step"]),
                                x.shape, x.dtype)
            return (s["sqrt_a_prev"] * pred_x0
                    + s["inject_sqrt_1ma"] * noise), aux

        return xs, None, update

    raise ValueError(f"unknown method: {cfg.method}")


def _finalize_output(x, cfg: SamplerConfig):
    """Apply cfg.output_dtype to the final images, inside the traced
    program. "uint8" is the reference's toU8 bit-for-bit
    (`test_inpainting_better.py:39-48`): ((x+1)*127.5).clamp(0,255)
    followed by a truncating float->uint8 cast (torch `.to(torch.uint8)`
    truncates toward zero; XLA's convert_element_type does the same)."""
    if cfg.output_dtype == "float32":
        return x
    if cfg.output_dtype == "uint8":
        return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)
    raise ValueError(
        f"output_dtype must be 'float32' or 'uint8', got {cfg.output_dtype!r}")


def inpaint_sample(
    apply_fn: Callable,
    sched: DiffusionSchedule,
    cfg: SamplerConfig,
    *,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    x_init: Optional[jnp.ndarray] = None,
    cache_apply: Optional[tuple] = None,
    cond_fn: Optional[Callable] = None,
):
    """Run the full inpainting reverse process on-device.

    Args:
      apply_fn: (x, t[B], masked_image, mask) -> model output (NHWC).
      gt: ground-truth images [B,H,W,3] in [-1,1].
      mask: [B,H,W,1], 1 = inpaint (hole), 0 = keep — the data-pipeline
        convention (`data/dataset.py:136-142`).
      key: PRNG key for init noise, per-step noise, and injection noise.
        Either ONE key (whole-batch draws, the historical bit-exact
        behavior) or PER-SAMPLE keys ([B, 2] raw / [B] typed): then every
        draw is made independently per sample, so row i equals the
        batch-1 run with key i regardless of what else is in the batch —
        the serving determinism contract (tests/test_batched_keys.py).
      x_init: optional starting state (defaults to N(0,1)); with
        cfg.strength < 1 it is instead the CLEAN image to refine (noised
        internally to the truncated grid's first timestep).
      cache_apply: required when cfg.encoder_cache_period > 1 — a pair
        (full_fn, cached_fn) where full_fn(x, t, mi, m) -> (out, cache)
        also returns the encoder features, and cached_fn(x, t, mi, m, cache)
        -> out runs the decoder against cached features. Key steps
        (step % period == 0) publish a fresh cache via lax.cond; the steps
        in between skip the encoder entirely.
      cond_fn: optional classifier guidance, (x, t[B]) -> grad log p(y|x_t)
        (same shape as x). Applied inside the scan with the reference's
        semantics (`gaussian_diffusion.py:326-388`): DDPM shifts the
        posterior mean by variance * grad (`condition_mean`); DDIM shifts
        eps by -sqrt(1-alpha_bar) * grad and re-derives x0
        (`condition_score`). Supported for methods ddim/ddpm/repaint.

    Returns:
      Inpainted images [B,H,W,3]; known pixels exactly equal `gt` when
      cfg.final_blend (the property test anchors this). With
      cfg.trajectory_every > 0 returns `(images, trajectory)` instead —
      trajectory is [N,B,H,W,3] f32 intermediate (pre-final-blend) states,
      one every k-th step plus the last (see SamplerConfig.trajectory_every;
      the reference's progressive loops, gaussian_diffusion.py:415-445).
    """
    B = gt.shape[0]
    if cond_fn is not None and cfg.method in ("dpm++2m", "dpm++2m-sde",
                                          "dpm++3m", "unipc", "consistency"):
        raise ValueError(
            "classifier guidance (cond_fn) is defined for ddim/ddpm/repaint; "
            "the DPM-Solver++/UniPC/consistency updates have no "
            "reference-guided form")
    keep = (1.0 - mask).astype(gt.dtype)
    masked_image = gt * keep  # model conditioning (test_inpainting_better.py:387-390)

    _check_key_batch(key, B)
    init_key, step_key, inject_key = _key_split(key, 3)
    if cfg.strength < 1.0:
        # refinement: noise the CLEAN init (x_init, else gt's existing
        # content) to the truncated grid's first step — SDEdit
        x = _strength_init(sched, cfg,
                           x_init if x_init is not None else gt, init_key)
    else:
        x = x_init if x_init is not None else _key_normal(init_key, gt.shape,
                                                          gt.dtype)
    # the coefficient tables are strong f32: a lower-precision carry (bf16
    # gt/x_init) would change dtype across the scan body and fail to trace.
    # Sampler math runs in f32 regardless; the model casts internally.
    x = x.astype(jnp.float32)

    pre = cfg.injection and cfg.injection_point == "pre"
    post = cfg.injection and cfg.injection_point == "post"

    # validate before any method branch: the repaint branch returns early,
    # and a cache_keysteps grid silently ignored there (period<=1) would
    # hide a config error from direct library callers (the pipeline also
    # checks at config time, but this is the documented entry point)
    if cfg.cache_keysteps is not None and cfg.encoder_cache_period <= 1:
        raise ValueError(
            "cache_keysteps requires encoder_cache_period > 1 (the period "
            "enables caching; the explicit grid then replaces the gate)")

    if cfg.method == "repaint":
        # time-travel walk: its own body — renoise transitions skip the
        # model call entirely (lax.cond), so a jump costs only jump_length
        # cheap q-steps, not model evaluations
        if cfg.encoder_cache_period > 1:
            raise ValueError(
                "encoder_cache_period is not supported with method='repaint'"
            )
        xs = _to_device_xs(_repaint_tables(sched, cfg))
        traj0, record = _traj_recorder(cfg, int(xs["step"].shape[0]), x)

        def repaint_body(carry, s):
            x, traj = carry
            x = _maybe_pre_inject(x, s, gt, keep, inject_key, pre)

            def denoise(xx):
                t_full = jnp.full((B,), s["t"], jnp.int32)
                out = apply_fn(xx, t_full, masked_image, mask)
                mean, logvar = _ddpm_mean_logvar(out, xx, s, cfg)
                if cond_fn is not None:
                    mean = _guide_mean(cond_fn, xx, s, B, mean, logvar)
                noise = _key_normal(_key_fold(step_key, s["step"]),
                                    xx.shape, xx.dtype)
                return mean + s["noise_gate"] * jnp.exp(0.5 * logvar) * noise

            def renoise(xx):
                noise = _key_normal(_key_fold(step_key, s["step"]),
                                    xx.shape, xx.dtype)
                return s["renoise_keep"] * xx + s["renoise_std"] * noise

            x = jax.lax.cond(s["is_denoise"] > 0, denoise, renoise, x)
            x = _maybe_post_inject(x, s, gt, keep, inject_key, post)
            return (x, record(traj, x, s)), None

        (x, traj), _ = jax.lax.scan(repaint_body, (x, traj0), xs)
        if cfg.final_blend:
            x = x * mask + gt * keep
        x = _finalize_output(x, cfg)
        return (x, traj) if cfg.trajectory_every > 0 else x

    aux0 = None  # extra per-method carry (dpm++2m: previous x0 prediction)
    if cfg.method == "ddim":
        xs = _to_device_xs(_ddim_tables(sched, cfg))

        def update(x, aux, s, out):
            raw = out[..., :3]  # learned variance ignored for DDIM (":523-529")
            pred_x0, eps = _x0_eps_from_raw(raw, x, s, cfg)
            if cfg.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
                if cfg.mean_type != gd.ModelMeanType.EPSILON:
                    eps = (x - s["sqrt_a_t"] * pred_x0) / s["sqrt_one_minus_a_t"]
            if cond_fn is not None:
                pred_x0, eps = _guide_eps(cond_fn, x, s, B, pred_x0)
            noise = _key_normal(_key_fold(step_key, s["step"]),
                                x.shape, x.dtype)
            return (
                s["sqrt_a_prev"] * pred_x0
                + s["dir_coef"] * eps
                + s["noise_gate"] * s["sigma"] * noise
            ), aux

    else:
        # ddpm / dpm++2m(-sde) / dpm++3m / consistency: identical update in
        # both entry points — built once in _shared_update
        xs, aux0, update = _shared_update(
            sched, cfg, x, step_key, B, cond_fn,
            extract_raw=lambda out: out[..., :3],  # ":523-529"
        )

    period = cfg.encoder_cache_period  # cache_keysteps validated above
    traj0, record = _traj_recorder(cfg, int(xs["step"].shape[0]), x)
    if period <= 1:
        def body(carry, s):
            x, aux, traj = carry
            t_full = jnp.full((B,), s["t"], jnp.int32)
            x = _maybe_pre_inject(x, s, gt, keep, inject_key, pre)
            out = apply_fn(x, t_full, masked_image, mask)
            x, aux = update(x, aux, s, out)
            x = _maybe_post_inject(x, s, gt, keep, inject_key, post)
            return (x, aux, record(traj, x, s)), None

        (x, _, traj), _ = jax.lax.scan(body, (x, aux0, traj0), xs)
    elif cfg.cache_branch == -1:
        # output-reuse mode: the "cache" is the previous raw model output;
        # non-key steps run no model at all. Step 0 is a key step
        # (enforced by _cache_keymask) so the zero init is never consumed.
        t_probe = jnp.zeros((B,), jnp.int32)
        out_struct = jax.eval_shape(
            lambda a, b: apply_fn(a, b, masked_image, mask), x, t_probe)
        out0 = jnp.zeros(out_struct.shape, out_struct.dtype)

        K = int(xs["step"].shape[0])
        xs["is_key"] = jnp.asarray(_cache_keymask(cfg, K))

        def body(carry, s):
            x, aux, prev, traj = carry
            t_full = jnp.full((B,), s["t"], jnp.int32)
            x = _maybe_pre_inject(x, s, gt, keep, inject_key, pre)
            out = jax.lax.cond(
                s["is_key"],
                lambda xt: apply_fn(xt[0], xt[1], masked_image, mask),
                lambda xt: prev,
                (x, t_full),
            )
            x, aux = update(x, aux, s, out)
            x = _maybe_post_inject(x, s, gt, keep, inject_key, post)
            return (x, aux, out, record(traj, x, s)), None

        (x, _, _, traj), _ = jax.lax.scan(body, (x, aux0, out0, traj0), xs)
    else:
        if cache_apply is None:
            raise ValueError(
                "cfg.encoder_cache_period > 1 requires cache_apply="
                "(full_fn, cached_fn)"
            )
        full_fn, cached_fn = cache_apply
        # zero-init carry with the cache structure; step 0 is a key step so
        # the zeros are never consumed
        t_probe = jnp.zeros((B,), jnp.int32)
        cache_struct = jax.eval_shape(
            lambda a, b, c, d: full_fn(a, b, c, d)[1],
            x, t_probe, masked_image, mask,
        )
        cache0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), cache_struct
        )

        K = int(xs["step"].shape[0])
        xs["is_key"] = jnp.asarray(_cache_keymask(cfg, K))

        def body(carry, s):
            x, aux, cache, traj = carry
            t_full = jnp.full((B,), s["t"], jnp.int32)
            x = _maybe_pre_inject(x, s, gt, keep, inject_key, pre)
            is_key = s["is_key"]
            out, cache = jax.lax.cond(
                is_key,
                lambda xt: full_fn(xt[0], xt[1], masked_image, mask),
                lambda xt: (cached_fn(xt[0], xt[1], masked_image, mask,
                                      cache), cache),
                (x, t_full),
            )
            x, aux = update(x, aux, s, out)
            x = _maybe_post_inject(x, s, gt, keep, inject_key, post)
            return (x, aux, cache, record(traj, x, s)), None

        (x, _, _, traj), _ = jax.lax.scan(body, (x, aux0, cache0, traj0), xs)

    if cfg.final_blend:
        x = x * mask + gt * keep
    x = _finalize_output(x, cfg)
    return (x, traj) if cfg.trajectory_every > 0 else x


def sample(
    apply_fn: Callable,
    sched: DiffusionSchedule,
    cfg: SamplerConfig,
    *,
    shape,
    key: jax.Array,
    x_init: Optional[jnp.ndarray] = None,
    cache_apply: Optional[tuple] = None,
    cond_fn: Optional[Callable] = None,
):
    """Unconditional generation (3-channel base model), library parity.

    Equivalent to `p_sample_loop` / `ddim_sample_loop` without injection
    (`gaussian_diffusion.py:390-538`). Supports the same encoder-feature
    reuse as inpaint_sample: with cfg.encoder_cache_period > 1, pass
    cache_apply = (full_fn(x, t) -> (out, cache), cached_fn(x, t, cache)
    -> out). `cond_fn(x, t) -> grad log p(y|x_t)` enables classifier
    guidance with the reference's `condition_mean`/`condition_score`
    semantics (`gaussian_diffusion.py:326-388`; consumed by `p_sample`/
    `ddim_sample` at :357-485) for methods ddim/ddpm/repaint. `key`
    accepts per-sample batched keys ([B, 2]) with the same row-isolation
    contract as `inpaint_sample`; cfg.strength < 1 refines `x_init`
    (required then — the clean image to harmonize).
    """
    if cond_fn is not None and cfg.method in ("dpm++2m", "dpm++2m-sde",
                                          "dpm++3m", "unipc", "consistency"):
        raise ValueError(
            "classifier guidance (cond_fn) is defined for ddim/ddpm/repaint; "
            "the DPM-Solver++/UniPC/consistency updates have no "
            "reference-guided form")
    _check_key_batch(key, shape[0])
    init_key, step_key = _key_split(key, 2)
    if cfg.strength < 1.0:
        if x_init is None:
            raise ValueError(
                "strength < 1 on the unconditional sampler needs x_init "
                "(the clean image to refine)")
        x = _strength_init(sched, cfg, x_init, init_key)
    else:
        x = x_init if x_init is not None else _key_normal(init_key, shape)
    x = x.astype(jnp.float32)  # f32 carry vs strong-f32 tables (see above)
    B = shape[0]

    # validate before the early-returning repaint branch (see inpaint_sample)
    if cfg.cache_keysteps is not None and cfg.encoder_cache_period <= 1:
        raise ValueError(
            "cache_keysteps requires encoder_cache_period > 1 (the period "
            "enables caching; the explicit grid then replaces the gate)")

    if cfg.method == "repaint":
        if cfg.encoder_cache_period > 1:
            raise ValueError(
                "encoder_cache_period is not supported with method='repaint'"
            )
        xs = _to_device_xs(_repaint_tables(sched, cfg))
        traj0, record = _traj_recorder(cfg, int(xs["step"].shape[0]), x)

        def repaint_body(carry, s):
            x, traj = carry

            def denoise(xx):
                out = apply_fn(xx, jnp.full((B,), s["t"], jnp.int32))
                mean, logvar = _ddpm_mean_logvar(out, xx, s, cfg)
                if cond_fn is not None:
                    mean = _guide_mean(cond_fn, xx, s, B, mean, logvar)
                noise = _key_normal(_key_fold(step_key, s["step"]),
                                    xx.shape, xx.dtype)
                return mean + s["noise_gate"] * jnp.exp(0.5 * logvar) * noise

            def renoise(xx):
                noise = _key_normal(_key_fold(step_key, s["step"]),
                                    xx.shape, xx.dtype)
                return s["renoise_keep"] * xx + s["renoise_std"] * noise

            x = jax.lax.cond(s["is_denoise"] > 0, denoise, renoise, x)
            return (x, record(traj, x, s)), None

        (x, traj), _ = jax.lax.scan(repaint_body, (x, traj0), xs)
        x = _finalize_output(x, cfg)
        return (x, traj) if cfg.trajectory_every > 0 else x

    aux0 = None
    if cfg.method == "ddim":
        xs = _to_device_xs(_ddim_tables(sched, cfg))

        def update(x, aux, s, out):
            raw, _ = gd.split_model_output(out, cfg.var_type)
            pred_x0, _ = _x0_eps_from_raw(raw, x, s, cfg)
            if cfg.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            # recompute eps from the (possibly clipped) x0 — library parity
            # (gaussian_diffusion.py:470)
            eps = (x - s["sqrt_a_t"] * pred_x0) / s["sqrt_one_minus_a_t"]
            if cond_fn is not None:
                pred_x0, eps = _guide_eps(cond_fn, x, s, B, pred_x0)
            noise = _key_normal(_key_fold(step_key, s["step"]),
                                x.shape, x.dtype)
            return (
                s["sqrt_a_prev"] * pred_x0
                + s["dir_coef"] * eps
                + s["noise_gate"] * s["sigma"] * noise
            ), aux

    else:
        # shared with inpaint_sample; the library path splits learned
        # variance channels off explicitly
        xs, aux0, update = _shared_update(
            sched, cfg, x, step_key, B, cond_fn,
            extract_raw=lambda out: gd.split_model_output(
                out, cfg.var_type)[0],
        )

    period = cfg.encoder_cache_period  # cache_keysteps validated above
    traj0, record = _traj_recorder(cfg, int(xs["step"].shape[0]), x)
    if period <= 1:
        def body(carry, s):
            x, aux, traj = carry
            t_full = jnp.full((B,), s["t"], jnp.int32)
            out = apply_fn(x, t_full)
            x, aux = update(x, aux, s, out)
            return (x, aux, record(traj, x, s)), None

        (x, _, traj), _ = jax.lax.scan(body, (x, aux0, traj0), xs)
        x = _finalize_output(x, cfg)
        return (x, traj) if cfg.trajectory_every > 0 else x

    if cfg.cache_branch == -1:
        # output-reuse mode (see inpaint_sample): non-key steps replay the
        # previous raw output — no model call, no cache_apply needed.
        out_struct = jax.eval_shape(
            lambda a, b: apply_fn(a, b), x, jnp.zeros((B,), jnp.int32))
        out0 = jnp.zeros(out_struct.shape, out_struct.dtype)

        K = int(xs["step"].shape[0])
        xs["is_key"] = jnp.asarray(_cache_keymask(cfg, K))

        def body(carry, s):
            x, aux, prev, traj = carry
            t_full = jnp.full((B,), s["t"], jnp.int32)
            out = jax.lax.cond(
                s["is_key"],
                lambda xt: apply_fn(xt[0], xt[1]),
                lambda xt: prev,
                (x, t_full),
            )
            x, aux = update(x, aux, s, out)
            return (x, aux, out, record(traj, x, s)), None

        (x, _, _, traj), _ = jax.lax.scan(body, (x, aux0, out0, traj0), xs)
        x = _finalize_output(x, cfg)
        return (x, traj) if cfg.trajectory_every > 0 else x

    if cache_apply is None:
        raise ValueError(
            "cfg.encoder_cache_period > 1 requires cache_apply="
            "(full_fn, cached_fn)"
        )
    full_fn, cached_fn = cache_apply
    cache_struct = jax.eval_shape(
        lambda a, b: full_fn(a, b)[1], x, jnp.zeros((B,), jnp.int32)
    )
    cache0 = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), cache_struct
    )

    K = int(xs["step"].shape[0])
    xs["is_key"] = jnp.asarray(_cache_keymask(cfg, K))

    def body(carry, s):
        x, aux, cache, traj = carry
        t_full = jnp.full((B,), s["t"], jnp.int32)
        is_key = s["is_key"]
        out, cache = jax.lax.cond(
            is_key,
            lambda xt: full_fn(xt[0], xt[1]),
            lambda xt: (cached_fn(xt[0], xt[1], cache), cache),
            (x, t_full),
        )
        x, aux = update(x, aux, s, out)
        return (x, aux, cache, record(traj, x, s)), None

    (x, _, _, traj), _ = jax.lax.scan(body, (x, aux0, cache0, traj0), xs)
    x = _finalize_output(x, cfg)
    return (x, traj) if cfg.trajectory_every > 0 else x
