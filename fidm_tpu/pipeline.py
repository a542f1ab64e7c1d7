"""High-level pipeline: model + schedule + sampler presets.

TPU-native equivalent of the reference factory
(`train_inpainting.py:199-262`: canonical FFHQ-256 UNet + 1000-step
quadratic learned-sigma diffusion; `train_inpainting_ddpm.py:249-251`:
500-step linear variant) and of the six forked eval scripts' presets
(ddpm-1000, ddim-{30,50,100}, eta in {0.0, 0.75, 0.9} — SURVEY.md §2).

One typed config replaces the reference's hard-coded hyperparameters and
per-script argparse forks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .diffusion import DiffusionSchedule, ModelMeanType
from .models import InpaintingUNet, UNetConfig, ffhq256_config
from .sampling import SamplerConfig, inpaint_sample

__all__ = [
    "PipelineConfig",
    "InpaintingPipeline",
    "SAMPLER_PRESETS",
    "create_model_and_schedule",
]

# Eval presets replacing the six forked test_*.py scripts.
SAMPLER_PRESETS = {
    # tes_ddpm.py: DDPM-1000 with injection
    "ddpm-1000": SamplerConfig(method="ddpm", num_steps=None, injection=True),
    # SpacedDiffusion-style respaced DDPM (Improved-DDPM standard; the
    # reference has no DDPM respacing at all)
    "ddpm-250": SamplerConfig(method="ddpm", num_steps=250, injection=True),
    "ddpm-100": SamplerConfig(method="ddpm", num_steps=100, injection=True),
    # test_ddim_30_cos.py defaults: 30 steps, eta 0.9
    "ddim-30": SamplerConfig(method="ddim", num_steps=30, eta=0.9, injection=True),
    # test_inp_ddim_100.py defaults (50 steps, eta 0.75 despite the name)
    "ddim-50-eta0.75": SamplerConfig(method="ddim", num_steps=50, eta=0.75,
                                     injection=True),
    "ddim-50": SamplerConfig(method="ddim", num_steps=50, eta=0.9, injection=True),
    # test_inpainting_better.py flagship defaults: DDIM-100, eta 0.9
    "ddim-100": SamplerConfig(method="ddim", num_steps=100, eta=0.9,
                              injection=True),
    # quality-qualified fast flagship, RE-KEYED at canonical depth (round-4
    # 6-level study) and RE-QUALIFIED AT PRODUCTION WIDTH 128 (round-5,
    # examples/canonical_frontier.py --width 128 --presets_only): branch 2
    # / period 3 / tail 10 costs -0.93 dB (box) / -0.48 dB (brush)
    # hole-PSNR vs exact DDIM-100 on the trained width-128 6-level model,
    # with hole-SSIM AT OR ABOVE exact (0.9014 vs 0.8598 box) and
    # LPIPS-proxy unchanged — the PSNR delta is averaging, not perceptual
    # damage. Alternatives stay dominated at width 128: branch 1 -5.40/
    # -2.89 dB, encoder mode -9.97/-9.62 dB. (Width-64 numbers: -0.28/
    # -0.39; the ordering is width-stable, the magnitude is not.)
    # Measured tables in BENCH.md "Width-128 requalification".
    "ddim-100-deep": SamplerConfig(method="ddim", num_steps=100, eta=0.9,
                                   injection=True, encoder_cache_period=3,
                                   cache_branch=2, encoder_cache_tail=10),
    # speed-first variant: branch 1, no exact tail (the tail buys no
    # quality at canonical depth — t=10 and t=0 measured identical at
    # width 64) — 1.40x exact. Width-128 requalification: branch 1 costs
    # -5.40 dB (box) / -2.89 dB (brush) at t=10, MUCH steeper than the
    # width-64 -1.9 to -2.3 dB — strictly a draft/preview tier on the
    # production model; prefer ddim-100-deep for anything user-facing.
    "ddim-100-turbo": SamplerConfig(method="ddim", num_steps=100, eta=0.9,
                                    injection=True, encoder_cache_period=3,
                                    cache_branch=1),
    "ddim-100-det": SamplerConfig(method="ddim", num_steps=100, eta=0.0,
                                  injection=True),
    # test_quant.py "fast mode" preset (apply_speed_optimizations, :758-778:
    # DDIM-20), plus deep-trunk reuse — RE-KEYED at canonical depth: the
    # old encoder-mode cache (b=0 p=2) measured -4.9 to -5.2 dB and was
    # SLOWER than branch 1; b=1 p=2 tail=4 is 1.19x exact at -1.3 dB
    # (examples/canonical_frontier.py). Width-128 requalification: the
    # pick holds (encoder mode collapses to -9.0/-9.4 dB and stays
    # slower; b=1 p=2 t=4 is 1.25x exact) but costs -3.43/-2.41 dB there
    # — at 20 steps prefer the uncached exact DDIM-20 (-0.68/-0.12 vs
    # DDIM-100!) unless the last 25% of speed matters.
    "ddim-20-fast": SamplerConfig(method="ddim", num_steps=20, eta=0.9,
                                  injection=True, encoder_cache_period=2,
                                  cache_branch=1, encoder_cache_tail=4),
    # DPM-Solver++(2M): second-order ODE solver — DDIM-100-level integrator
    # accuracy at ~4x fewer model evaluations (no reference equivalent; its
    # only acceleration is first-order step subsetting)
    "dpm-25": SamplerConfig(method="dpm++2m", num_steps=25, injection=True),
    "dpm-20": SamplerConfig(method="dpm++2m", num_steps=20, injection=True),
    # stochastic variant (diffusers' sde-dpmsolver++): 2nd-order accuracy
    # with DDIM-eta=1-style fresh noise each step — the analogue of the
    # reference's preferred eta=0.9 sampling for inpainting harmonization.
    # The serve default: at CANONICAL depth it beats exact DDIM-100 at 4x
    # fewer evals on both mask protocols — width 64: +0.27/+1.18 dB;
    # width 128 (round-5 requalification): +1.34/+1.02 dB with the best
    # LPIPS-proxy in the study (examples/canonical_solver_quality.py).
    "dpm-25-sde": SamplerConfig(method="dpm++2m-sde", num_steps=25,
                                injection=True),
    # deep-trunk (b=1) like ddim-20-fast: encoder-mode caching collapses
    # at canonical depth (the DDIM-20 measurement; the cache mechanics are
    # method-independent)
    "dpm-20-fast": SamplerConfig(method="dpm++2m", num_steps=20,
                                 injection=True, encoder_cache_period=2,
                                 cache_branch=1, encoder_cache_tail=4),
    # third-order multistep (diffusers' solver_order=3): tighter ODE
    # tracking at very few steps for smooth well-trained models; order
    # warmup 1->2->3 and a first-order final step (sampler._dpm3m_tables)
    "dpm3-20": SamplerConfig(method="dpm++3m", num_steps=20, injection=True),
    "dpm3-12": SamplerConfig(method="dpm++3m", num_steps=12, injection=True),
    # UniPC (arXiv:2302.04867, bh2): predictor-corrector multistep — the
    # corrector reuses each step's model evaluation for an extra order of
    # accuracy at zero extra model cost: beats dpm++2m at every K >= 8 on
    # the analytic ODE's closed-form solution (tests/test_unipc.py;
    # default order 2 — order 3 is erratic like dpm3)
    "unipc-20": SamplerConfig(method="unipc", num_steps=20, injection=True),
    "unipc-10": SamplerConfig(method="unipc", num_steps=10, injection=True),
    # consistency-distilled students (distill/consistency.py, trained via
    # `cli.distill --mode consistency`): 1-2 model evaluations per sample —
    # the measured 16x step cut of examples/toy_consistency.py. Only
    # meaningful with consistency-student weights (velocity-parameterized
    # by default). Canonical-depth + production-width quality (round-5,
    # examples/canonical_consistency.py): the student beats naive
    # matched-eval DDIM by +5.4-5.7 dB at 1 eval but sits -7.0/-9.5 dB
    # under exact DDIM-100 — a PREVIEW tier, not a final one (final:
    # dpm-25-sde, which measures ABOVE the DDIM-100 anchor).
    "consistency-2": SamplerConfig(method="consistency", num_steps=2,
                                   injection=True,
                                   mean_type=ModelMeanType.VELOCITY),
    "consistency-1": SamplerConfig(method="consistency", num_steps=1,
                                   injection=True,
                                   mean_type=ModelMeanType.VELOCITY),
    # RePaint time-travel resampling (arXiv:2201.09865): the reference's
    # injection IS RePaint's conditioning step; these presets add the
    # resampling loop it lacks, harmonizing hole content with the known
    # region. repaint-250 is the paper's T=250/j=10/r=10 recipe
    # (~2400 model evals — a quality ceiling, not a speed point);
    # repaint-100-light is a practical ~290-eval middle ground.
    "repaint-250": SamplerConfig(method="repaint", num_steps=250,
                                 jump_length=10, jump_n_sample=10,
                                 injection=True),
    "repaint-100-light": SamplerConfig(method="repaint", num_steps=100,
                                       jump_length=5, jump_n_sample=3,
                                       injection=True),
}


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = dataclasses.field(default_factory=ffhq256_config)
    schedule: str = "quadratic"   # train_inpainting.py:248-255
    num_timesteps: int = 1000
    sampler: SamplerConfig = dataclasses.field(
        default_factory=lambda: SAMPLER_PRESETS["ddim-100"]
    )
    # feed the model float timesteps scaled to [0, 1000) regardless of T —
    # `GaussianDiffusion._scale_timesteps` (gaussian_diffusion.py:321-324)
    rescale_timesteps: bool = False


def create_model_and_schedule(
    config: Optional[PipelineConfig] = None,
    *,
    checkpoint: Optional[str] = None,
    key: Optional[jax.Array] = None,
):
    """Build (model, variables, schedule); optionally load a torch .pt.

    Mirrors `create_model_and_diffusion` (`train_inpainting.py:199-262`)
    including the pretrained-checkpoint overlay with 3->9 channel expansion.
    """
    config = config or PipelineConfig()
    model = InpaintingUNet(config.unet)
    sched = DiffusionSchedule.create(config.schedule, config.num_timesteps)

    if checkpoint is not None:
        from .models.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(checkpoint, config.unet)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        key = key if key is not None else jax.random.PRNGKey(0)
        c = config.unet
        dummy = (
            jnp.zeros((1, c.image_size, c.image_size, 3)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, c.image_size, c.image_size, 3)),
            jnp.zeros((1, c.image_size, c.image_size, 1)),
        )
        variables = model.init(key, *dummy)
    return model, variables, sched


class InpaintingPipeline:
    """Bind model+params+schedule into a jit-cached inpainting callable.

    Pass `mesh` to shard eval sampling over the batch axis of a device mesh
    (params replicated, XLA collectives over ICI) — the multi-chip eval
    throughput path the reference has no equivalent of.
    """

    def __init__(self, model, variables, sched, config: PipelineConfig,
                 mesh=None, fsdp_params: bool = False,
                 fsdp_min_size: int = 2**18, tp_params: bool = False,
                 shard_spatial: bool = False):
        self.model = model
        self.variables = variables
        self.sched = sched
        self.config = config
        self.mesh = mesh
        self.shard_spatial = shard_spatial
        if tp_params and shard_spatial:
            raise ValueError(
                "tp_params and shard_spatial both use the mesh's 'model' "
                "axis — pick one latency-scaling layout"
            )
        if (tp_params or shard_spatial) and (
            mesh is None or mesh.shape.get("model", 1) <= 1
        ):
            raise ValueError(
                "tp_params/shard_spatial need a mesh with a 'model' axis "
                "(parallel.create_mesh(model=k))"
            )
        # TP/spatial programs cannot partition the opaque Pallas attention
        # custom call; their jit traces run under a scoped XLA-attention
        # override (see _call_sharded) — attention is ~0.2% of a step
        # (BENCH.md), and other models in the process are unaffected.
        self._xla_attention = tp_params or shard_spatial
        if mesh is not None:
            if tp_params:
                # Megatron column/row channel sharding (parallel/tp.py):
                # divides per-forward FLOPs per chip — the latency-scaling
                # layout.
                from .parallel import tp_shard_params

                params, _ = tp_shard_params(
                    self.variables["params"], mesh,
                    fsdp_min_size=fsdp_min_size if fsdp_params else None,
                )
                self.variables = dict(self.variables, params=params)
            elif fsdp_params:
                # ZeRO-3-style parameter sharding for eval: serve models
                # too large to replicate per chip — XLA inserts the
                # all-gathers over ICI inside the sampling program
                from .parallel import shard_params

                params, _ = shard_params(self.variables["params"], mesh,
                                         use_fsdp=True,
                                         min_size=fsdp_min_size)
                self.variables = dict(self.variables, params=params)
            else:
                from .parallel import replicated

                self.variables = jax.device_put(self.variables,
                                                replicated(mesh))
        self._jitted = {}
        # AOT-loaded compiled programs: (batch_shape, cfg) -> executable
        # (see serving/aot.py; exact input shapes/dtypes, cond_fn-free)
        self._aot = {}

    @classmethod
    def create(cls, config: Optional[PipelineConfig] = None,
               checkpoint: Optional[str] = None, key=None, mesh=None,
               fsdp_params: bool = False, fsdp_min_size: int = 2**18,
               tp_params: bool = False, shard_spatial: bool = False):
        config = config or PipelineConfig()
        model, variables, sched = create_model_and_schedule(
            config, checkpoint=checkpoint, key=key
        )
        return cls(model, variables, sched, config, mesh=mesh,
                   fsdp_params=fsdp_params, fsdp_min_size=fsdp_min_size,
                   tp_params=tp_params, shard_spatial=shard_spatial)

    def cast_params(self, dtype=jnp.bfloat16):
        """Cast float params to `dtype` for inference (halves weight HBM
        traffic; normalization statistics still run in fp32). Clears the jit
        cache."""
        self.variables = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            self.variables,
        )
        self._jitted.clear()
        self._aot.clear()  # AOT programs are bound to exact param dtypes
        return self

    def inpaint(self, gt, mask, key, sampler: Optional[SamplerConfig] = None,
                cond_fn=None, strength: Optional[float] = None):
        """Inpaint a batch: gt [B,H,W,3] in [-1,1], mask [B,H,W,1] (1=hole).

        `cond_fn(x, t) -> grad log p(y|x_t)` enables classifier guidance
        (reference `condition_mean`/`condition_score` semantics inside the
        scan). The jitted program is cached per (shape, config, cond_fn
        identity) — reuse one cond_fn object across calls to avoid
        recompiles.

        `strength` < 1 switches to REFINEMENT (SDEdit): only the last
        round(strength * K) steps run, starting from `gt` q_sampled to
        that noise level — gt's hole region must then carry the content
        to harmonize (a cheap fill, a previous sample, a user edit), not
        zeros. See SamplerConfig.strength.
        """
        cfg = sampler or self.config.sampler
        if strength is not None:
            cfg = dataclasses.replace(cfg, strength=strength)
        self._validate_cache_cfg(cfg)
        if mask.shape[-1] != 1 or mask.shape[:-1] != gt.shape[:-1]:
            raise ValueError(
                f"mask must be [B,H,W,1] matching gt spatial dims; got "
                f"mask {mask.shape} vs gt {gt.shape}"
            )
        # one input contract for BOTH dispatch paths: f32 gt/mask (the AOT
        # executables are compiled for f32, and the jit path must produce
        # identical numerics whether or not a cached program is installed)
        gt = jnp.asarray(gt, jnp.float32)
        mask = jnp.asarray(mask, jnp.float32)
        cache_key = (gt.shape, cfg,
                     id(cond_fn) if cond_fn is not None else None)
        if cond_fn is not None and cache_key not in self._jitted:
            # bound the cond_fn-keyed programs: each fresh closure is a
            # full recompile, and a long-lived process constructing one
            # lambda per call would otherwise grow program memory without
            # limit — evict the oldest guided program beyond 4
            guided = [k for k in self._jitted if k[2] is not None]
            if len(guided) >= 4:
                del self._jitted[guided[0]]
        if cond_fn is None:
            from .sampling.sampler import _is_batched_key

            # AOT executables are bound to exact input shapes — a program
            # compiled for a single key cannot take per-sample keys
            aot = self._aot.get((tuple(gt.shape), cfg,
                                 _is_batched_key(key)))
            if aot is not None:
                return aot(self.variables, gt, mask, key)
        if cache_key not in self._jitted:
            # store cond_fn alongside the program: the key uses id(cond_fn),
            # and ids are reused after GC — a dead closure's id matching a
            # NEW closure would silently return the OLD compiled guidance.
            # Pinning the closure for the cache entry's lifetime makes the
            # id collision impossible.
            self._jitted[cache_key] = (self._make_jit(cfg, cond_fn), cond_fn)
        fn, _ = self._jitted[cache_key]
        if self._xla_attention:
            from .ops.registry import pallas_override

            with pallas_override(False, "attention"):  # scoped to the trace
                return fn(self.variables, gt, mask, key)
        return fn(self.variables, gt, mask, key)

    def _validate_cache_cfg(self, cfg: SamplerConfig):
        """Config-time DeepCache validation: a cache_branch that is silently
        ignored (period <= 1) or out of range would otherwise only surface
        deep inside the jitted UNet trace (or not at all)."""
        if cfg.cache_keysteps is not None and cfg.encoder_cache_period <= 1:
            raise ValueError(
                f"cache_keysteps={cfg.cache_keysteps} has no effect with "
                f"encoder_cache_period={cfg.encoder_cache_period}; set "
                "encoder_cache_period > 1 (it enables caching; the explicit "
                "grid then replaces the periodic gate)"
            )
        if cfg.cache_branch:
            if cfg.encoder_cache_period <= 1:
                raise ValueError(
                    f"cache_branch={cfg.cache_branch} has no effect with "
                    f"encoder_cache_period={cfg.encoder_cache_period}; set "
                    "encoder_cache_period > 1 (or drop cache_branch)"
                )
            n_levels = len(self.config.unet.channel_mult)
            if cfg.cache_branch != -1 and not 1 <= cfg.cache_branch < n_levels:
                raise ValueError(
                    f"cache_branch must be -1 (output reuse) or in "
                    f"[1, {n_levels - 1}] for "
                    f"channel_mult={self.config.unet.channel_mult}; got "
                    f"{cfg.cache_branch}"
                )

    def _make_jit(self, cfg: SamplerConfig, cond_fn=None):
        """The jitted sampling program for one SamplerConfig (+ optional
        guidance closure); shape-polymorphic until traced."""
        t_scale = (
            1000.0 / self.config.num_timesteps
            if self.config.rescale_timesteps else None
        )

        def run(variables, gt, mask, key):
            def scale_t(t):
                if t_scale is not None:
                    return t.astype(jnp.float32) * t_scale
                return t

            def apply_fn(x, t, mi, m):
                return self.model.apply(variables, x, scale_t(t), mi, m)

            cache_apply = None
            # output-reuse mode (cache_branch == -1) carries the previous
            # raw output inside the scan — no cache-capable model needed
            if cfg.encoder_cache_period > 1 and cfg.cache_branch != -1:
                depth = cfg.cache_branch or None  # 0 = encoder mode
                cache_apply = (
                    lambda x, t, mi, m: self.model.apply(
                        variables, x, scale_t(t), mi, m, return_cache=True,
                        cache_depth=depth),
                    lambda x, t, mi, m, cache: self.model.apply(
                        variables, x, scale_t(t), mi, m, cache=cache,
                        cache_depth=depth),
                )

            return inpaint_sample(apply_fn, self.sched, cfg,
                                  gt=gt, mask=mask, key=key,
                                  cache_apply=cache_apply,
                                  cond_fn=cond_fn)

        if self.mesh is not None:
            from .parallel import batch_sharding, replicated, spatial_sharding

            if self.shard_spatial:
                # GSPMD spatial partitioning: images sharded along H over
                # the "model" axis (XLA inserts conv halo exchanges); batch
                # still sharded over data(+fsdp). See parallel/tp.py.
                bs = spatial_sharding(self.mesh)
            else:
                bs = batch_sharding(self.mesh)
            # with trajectory_every the program returns (images, frames);
            # frames carry batch on axis 1, so leave their layout to XLA
            out_s = (bs, None) if cfg.trajectory_every > 0 else bs
            return jax.jit(
                run,
                in_shardings=(None, bs, bs, replicated(self.mesh)),
                out_shardings=out_s,
            )
        return jax.jit(run)

    def example_inputs(self, batch: int, batched_key: bool = False):
        """abstract (gt, mask, key) specs for a batch-`batch` program.

        `batched_key` compiles for per-sample keys ([batch, 2] raw uint32
        — the serving layer's per-request isolation layout) instead of one
        whole-batch key."""
        S = self.config.unet.image_size
        return (
            jax.ShapeDtypeStruct((batch, S, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, S, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, 2), jnp.uint32) if batched_key
            else jax.eval_shape(lambda: jax.random.PRNGKey(0)),
        )

    def compile_batch(self, batch: int,
                      sampler: Optional[SamplerConfig] = None,
                      batched_key: bool = False):
        """AOT-compile the sampling program for one batch size (no
        execution) — feed to `serving.aot.save_programs` for persistence."""
        cfg = sampler or self.config.sampler
        gt, mask, key = self.example_inputs(batch, batched_key)
        if self._xla_attention:
            from .ops.registry import pallas_override

            with pallas_override(False, "attention"):
                return self._make_jit(cfg).lower(self.variables, gt, mask,
                                                 key).compile()
        return self._make_jit(cfg).lower(self.variables, gt, mask,
                                         key).compile()

    def install_program(self, batch: int, cfg: SamplerConfig, program,
                        batched_key: bool = False):
        """Register a (deserialized) compiled executable for exact-shape
        dispatch; `inpaint` prefers it over the jit cache. `batched_key`
        must match how the program was compiled (key input [batch, 2] vs a
        single key)."""
        S = self.config.unet.image_size
        self._aot[((batch, S, S, 3), cfg, batched_key)] = program

    def uninstall_program(self, batch: int, cfg: SamplerConfig,
                          batched_key: bool = False) -> bool:
        """Drop an installed AOT executable (e.g. one that deserialized but
        cannot execute); subsequent calls fall back to the jit path."""
        S = self.config.unet.image_size
        return self._aot.pop(((batch, S, S, 3), cfg, batched_key),
                             None) is not None
