"""Training-step throughput on one chip: FFHQ-256 inpainting fine-tuning.

The reference never reports training throughput (its loop is a plain
single-GPU torch loop, `train_inpainting.py:15-79`); this measures ours so
the production-training claim has a number: full jitted train step
(q_sample + injection + 9-ch UNet fwd/bwd + AdamW + grad clip), bf16
compute / fp32 params, synthetic data (throughput is weight-independent).

Run (TPU):  python examples/bench_train.py [--batch 8] [--remat] [--steps 20]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--remat", action="store_true",
                   help="activation checkpointing (bigger batches)")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "convs"],
                   help="full = recompute everything; convs = selective "
                        "(save conv/attn outputs, recompute the cheap glue)")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches")
    p.add_argument("--loss_weight", default="none",
                   choices=["none", "min_snr", "p2"],
                   help="timestep loss weighting (expected throughput-free:"
                        " one gather + per-sample multiply)")
    args = p.parse_args()

    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.models import InpaintingUNet, ffhq256_config
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step
    from fidm_tpu.training.lr import make_lr_schedule

    cfg = ffhq256_config(image_size=args.image_size, remat=args.remat,
                         remat_policy=args.remat_policy)
    model = InpaintingUNet(cfg)
    sched = DiffusionSchedule.create("quadratic", 1000)

    B, S = args.batch, args.image_size
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32) * 0.5
    mask = jnp.zeros((B, S, S, 1), jnp.float32)
    mask = mask.at[:, S // 4: 3 * S // 4, S // 4: 3 * S // 4].set(1.0)
    batch = {"image": image, "masked_image": image * (1 - mask), "mask": mask}

    key = jax.random.PRNGKey(0)
    variables = model.init(key, image[:1], jnp.zeros((1,), jnp.int32),
                           image[:1], mask[:1])
    tx = make_optimizer(make_lr_schedule("cosine", 5e-5, 10_000, 500))
    state = TrainState.create(
        apply_fn=lambda v, *a: model.apply(v, *a),
        params=variables["params"], tx=tx,
    )
    step = make_train_step(sched, accum_steps=args.accum,
                           loss_weight=args.loss_weight)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    loss0 = float(metrics["loss"])  # scalar readback = the only real sync here
    compile_s = time.perf_counter() - t0
    assert np.isfinite(loss0)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, key)
    final = float(metrics["loss"])  # drains the queued steps
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    per_step = dt / args.steps
    print(f"compile {compile_s:.1f} s   loss0 {loss0:.4f} -> {final:.4f}")
    tags = (f", remat:{args.remat_policy}" if args.remat else "") + (
        f", accum {args.accum}" if args.accum > 1 else "") + (
        f", {args.loss_weight}" if args.loss_weight != "none" else "")
    print(f"train step ({S}^2, batch {B}{tags}): "
          f"{per_step * 1e3:.1f} ms/step = {B / per_step:.2f} img/s/chip")


if __name__ == "__main__":
    main()
