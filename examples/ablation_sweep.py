"""Scheduler/sampler ablation sweep (BASELINE.json config #5).

Replaces the reference's fork-a-script-per-setting workflow (six test_*.py
files + editing `create_model_and_diffusion` by hand, SURVEY.md §2/§5
"config" note) with one loop over named presets x beta schedules. Uses a
random-init model on synthetic data by default (wire --checkpoint and real
data dirs for actual ablations).

Run: python examples/ablation_sweep.py [--steps 30 50 100] [--image_size 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.metrics import psnr, ssim
from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.sampling import SamplerConfig, inpaint_sample


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--schedules", nargs="+",
                   default=["linear", "cosine", "quadratic"])
    p.add_argument("--steps", nargs="+", type=int, default=[30, 50, 100])
    p.add_argument("--etas", nargs="+", type=float, default=[0.0, 0.9])
    p.add_argument("--methods", nargs="+", default=["ddim"],
                   choices=["ddim", "ddpm", "dpm++2m", "dpm++2m-sde", "dpm++3m"])
    p.add_argument("--time_spacing", default="uniform",
                   choices=["uniform", "trailing", "lambda"])
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    args = p.parse_args()

    S = args.image_size
    cfg = UNetConfig(
        image_size=S, in_channels=9, model_channels=64, out_channels=6,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2, 4),
        num_heads=2, num_head_channels=32,
    )
    model = InpaintingUNet(cfg)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(np.clip(rng.standard_normal((args.batch, S, S, 3)), -1, 1),
                     jnp.float32) * 0.5
    mask = jnp.zeros((args.batch, S, S, 1)).at[:, S // 4: 3 * S // 4,
                                               S // 4: 3 * S // 4].set(1.0)
    variables = model.init(jax.random.PRNGKey(0), gt[:1],
                           jnp.zeros((1,), jnp.int32), gt[:1], mask[:1])

    print(f"{'schedule':>10} {'method':>11} {'steps':>6} {'eta':>5} "
          f"{'s/sample':>9} {'SSIM':>7} {'PSNR':>7}")
    for schedule in args.schedules:
        sched = DiffusionSchedule.create(schedule, args.diffusion_steps)
        for method in args.methods:
            for steps in args.steps:
                # eta only affects ddim; run the other methods once
                for eta in (args.etas if method == "ddim" else args.etas[:1]):
                    scfg = SamplerConfig(method=method, num_steps=steps,
                                         eta=eta, injection=True,
                                         time_spacing=args.time_spacing)

                    @jax.jit
                    def run(v, key):
                        def afn(x, t, mi, m):
                            return model.apply(v, x, t, mi, m)

                        return inpaint_sample(afn, sched, scfg, gt=gt,
                                              mask=mask, key=key)

                    out = run(variables, jax.random.PRNGKey(1))
                    float(out[0, 0, 0, 0].sum())  # sync (compile)
                    t0 = time.perf_counter()
                    out = run(variables, jax.random.PRNGKey(2))
                    float(out[0, 0, 0, 0].sum())  # sync
                    dt = (time.perf_counter() - t0) / args.batch
                    g01 = (gt + 1) / 2
                    o01 = (jnp.clip(out, -1, 1) + 1) / 2
                    print(f"{schedule:>10} {method:>11} {steps:>6} "
                          f"{eta:>5.2f} {dt:>9.4f} "
                          f"{float(np.mean(np.asarray(ssim(g01, o01)))):>7.4f} "
                          f"{float(np.mean(np.asarray(psnr(g01, o01)))):>7.2f}",
                          flush=True)


if __name__ == "__main__":
    main()
