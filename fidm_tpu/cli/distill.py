"""Distillation CLI: train few-step students from a trained checkpoint.

Productizes `fidm_tpu.distill`. Two modes:

--mode progressive (default; Salimans & Ho 2022, lever proven in
`examples/toy_distillation_uncond.py`: 8x step cut at teacher quality):
each round trains a student to match TWO teacher DDIM steps in ONE,
halving the step count until --final_steps. Each student lands in
`--out/student_<K>/` as a standard Orbax checkpoint `cli.evaluate` can load
directly, with its matching timestep grid in the metadata and in
`student_<K>/grid.json`:

    python -m fidm_tpu.cli.distill --train_dir faces/ --mask_dir masks/ \
        --checkpoint ckpts/ --out distilled/ \
        --teacher_steps 16 --final_steps 4 --steps_per_round 4000

    python -m fidm_tpu.cli.evaluate --data_dir test/ --mask_dir masks/ \
        --checkpoint distilled/student_4 --mean_type velocity \
        --timesteps $(cat distilled/student_4/grid.json | jq -r '.grid|join(" ")')

--mode consistency (Song et al. 2023; measured 16x step cut at
better-than-teacher quality on the toy, `examples/toy_consistency.py`):
ONE training run produces ONE student that samples at ANY step count via
`--preset consistency-1`/`consistency-2` (sampler method="consistency").
The student (the EMA target network) lands in `--out/consistency/`:

    python -m fidm_tpu.cli.distill --mode consistency --train_dir faces/ \
        --checkpoint ckpts/ --out distilled/ --steps_per_round 20000

    python -m fidm_tpu.cli.evaluate --data_dir test/ --mask_dir masks/ \
        --checkpoint distilled/consistency --preset consistency-2

No reference equivalent (the reference samples DDPM-1000/DDIM-100 only;
beyond-reference capability per SURVEY §2 note on sampling cost).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Progressively distill a trained inpainting UNet to "
                    "fewer sampling steps")
    p.add_argument("--config", default=None,
                   help="JSON file of argument defaults (CLI flags override)")
    p.add_argument("--mode", default="progressive",
                   choices=["progressive", "consistency",
                            "consistency-training"],
                   help="progressive = step-halving ladder; consistency = "
                        "one any-step-count student (1-2 step sampling); "
                        "consistency-training = the same student WITHOUT a "
                        "teacher (paper Alg. 3; --checkpoint optional, used "
                        "only as init)")
    p.add_argument("--grid_size", type=int, default=40,
                   help="consistency mode: training grid segments N")
    p.add_argument("--ema_decay", type=float, default=0.95,
                   help="consistency mode: target-network EMA decay")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--mask_dir", default=None,
                   help="mask directory (omit to train on procedural masks)")
    p.add_argument("--checkpoint", default=None,
                   help="teacher: torch .pt or orbax checkpoint dir "
                        "(required except for --mode consistency-training, "
                        "where it is an optional init)")
    p.add_argument("--out", default="distilled")
    p.add_argument("--teacher_steps", type=int, default=16,
                   help="starting DDIM step count (must be a power of 2 "
                        "multiple of final_steps)")
    p.add_argument("--final_steps", type=int, default=4,
                   help="stop once a student at this step count is trained")
    p.add_argument("--steps_per_round", type=int, default=4000,
                   help="optimizer steps per halving round")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[16])
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--schedule", default="quadratic",
                   choices=["linear", "cosine", "quadratic", "sqrt"])
    p.add_argument("--mask_mode", default="serial",
                   choices=["serial", "random", "ordered", "procedural"])
    p.add_argument("--mean_type", default="epsilon",
                   choices=["epsilon", "xstart", "velocity"],
                   help="the TEACHER's parameterization (reference "
                        "checkpoints are epsilon)")
    p.add_argument("--student_mean_type", default="velocity",
                   choices=["epsilon", "xstart", "velocity"],
                   help="the students' parameterization; velocity is stable "
                        "at few steps (Salimans & Ho 2022)")
    p.add_argument("--use_ema", action="store_true",
                   help="distill from the teacher's EMA parameters")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    args, _ = p.parse_known_args(argv)
    if args.config:
        with open(args.config) as f:
            p.set_defaults(**json.load(f))
    return p.parse_args(argv)


def student_grid(num_timesteps: int, steps: int):
    """The descending timestep grid a K-step student samples on (the even
    boundaries of its 2K-step teacher grid)."""
    from ..distill import distill_boundaries

    return [int(t) for t in distill_boundaries(num_timesteps, 2 * steps)[::2][:-1]]


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..data import DataLoader, InpaintingDataset
    from ..diffusion import DiffusionSchedule, ModelMeanType
    from ..distill import make_distill_step
    from ..models import InpaintingUNet, ffhq256_config
    from ..parallel import auto_mesh, shard_params
    from ..training import (CheckpointManager, TrainState, make_optimizer)
    from ..training.lr import make_lr_schedule

    args = parse_args(argv)
    if args.mode == "progressive":
        if args.teacher_steps % args.final_steps != 0 or (
            args.teacher_steps // args.final_steps
        ) & (args.teacher_steps // args.final_steps - 1):
            raise SystemExit("teacher_steps must be final_steps * 2^n")
        from ..distill import distill_boundaries

        bounds = distill_boundaries(args.diffusion_steps, args.teacher_steps)
        if not np.all(np.diff(bounds) < 0):
            raise SystemExit(
                f"teacher_steps={args.teacher_steps} does not fit a "
                f"{args.diffusion_steps}-step chain (duplicate timestep "
                f"boundaries); use teacher_steps < diffusion_steps")
    elif args.grid_size >= args.diffusion_steps:
        raise SystemExit("grid_size must be < diffusion_steps")
    if args.checkpoint is None and args.mode != "consistency-training":
        raise SystemExit(
            f"--checkpoint is required for --mode {args.mode} (only "
            "consistency-training can start from random init)")
    if args.mask_dir is None and args.mask_mode != "procedural":
        print("no --mask_dir: switching to procedural mask generation")
        args.mask_mode = "procedural"

    key = jax.random.PRNGKey(args.seed)
    cfg = ffhq256_config(
        image_size=args.image_size,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
    )
    model = InpaintingUNet(cfg)
    sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)

    if args.checkpoint is None:  # consistency-training from random init
        S = args.image_size
        zx = jnp.zeros((1, S, S, 3))
        teacher = model.init(key, zx, jnp.zeros((1,), jnp.int32), zx,
                             jnp.ones((1, S, S, 1)))["params"]
    elif os.path.isdir(args.checkpoint):
        # same resolution as cli.evaluate: the best-loss snapshot when the
        # training run tracked one, else the latest
        _mgr = CheckpointManager(args.checkpoint)
        teacher = _mgr.restore_params(
            "best" if os.path.isdir(os.path.join(args.checkpoint, "best"))
            else "latest",
            prefer_ema=args.use_ema)
        _mgr.close()
    else:
        from ..models.torch_import import load_torch_checkpoint

        teacher = load_torch_checkpoint(args.checkpoint, cfg)["params"]
    teacher = jax.tree_util.tree_map(jnp.asarray, teacher)

    mesh = auto_mesh(args.batch_size, fsdp=args.fsdp)
    teacher, _ = shard_params(teacher, mesh, use_fsdp=args.fsdp > 1)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} device(s)")

    ds = InpaintingDataset(args.train_dir, args.mask_dir, "train",
                           args.image_size, args.mask_mode, args.seed)
    loader = DataLoader(ds, args.batch_size, shuffle=True, drop_last=True,
                        seed=args.seed)
    if len(loader) == 0:
        raise SystemExit("dataset smaller than one batch")

    def apply(params, x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    def batches():
        while True:
            for b in loader:
                yield {k: b[k] for k in ("image", "masked_image", "mask")}

    teacher_mt = ModelMeanType.from_name(args.mean_type)
    student_mt = ModelMeanType.from_name(args.student_mean_type)
    os.makedirs(args.out, exist_ok=True)

    stream = batches()
    if args.mode in ("consistency", "consistency-training"):
        from ..distill import make_consistency_step

        ct = args.mode == "consistency-training"
        cstate = TrainState.create(
            apply_fn=None, params=teacher, ema_params=teacher,
            tx=make_optimizer(
                make_lr_schedule("cosine", args.lr, args.steps_per_round,
                                 args.warmup_steps),
                weight_decay=0.0, grad_clip=args.grad_clip,
            ),
        )
        cstep = make_consistency_step(
            sched, None if ct else apply, apply, grid_size=args.grid_size,
            teacher_mean_type=teacher_mt, student_mean_type=student_mt,
            ema_decay=args.ema_decay, mesh=mesh,
        )
        last = {}
        with mesh:
            for i in range(args.steps_per_round):
                cstate, last = cstep(cstate, None if ct else teacher,
                                     next(stream), key)
                if i % max(1, args.steps_per_round // 10) == 0:
                    print(f"[{args.mode}] step {i} "
                          f"loss {float(last['loss']):.5f}", flush=True)
        sdir = os.path.join(args.out, "consistency")
        mgr = CheckpointManager(sdir, keep_last_n=1)
        # the usable student is the EMA target network — save it AS the
        # params so cli.evaluate --preset consistency-K works unflagged
        mgr.save(0, jax.device_get(cstate.replace(params=cstate.ema_params)),
                 metadata={
                     "mode": args.mode,
                     "mean_type": args.student_mean_type,
                     "schedule": args.schedule,
                     "diffusion_steps": args.diffusion_steps,
                     "sampler_method": "consistency",
                 })
        mgr.close()
        report = {"mode": args.mode, "final_loss": float(last["loss"]),
                  "checkpoint": sdir, "out": args.out}
        print(json.dumps(report))
        return report

    report = {"rounds": [], "out": args.out}
    cur_params, cur_steps, cur_mt = teacher, args.teacher_steps, teacher_mt
    with mesh:
        while cur_steps > args.final_steps:
            dstate = TrainState.create(
                apply_fn=None, params=cur_params,
                tx=make_optimizer(
                    make_lr_schedule("cosine", args.lr, args.steps_per_round,
                                     args.warmup_steps),
                    weight_decay=0.0, grad_clip=args.grad_clip,
                ),
            )
            dstep = make_distill_step(
                sched, apply, apply, teacher_steps=cur_steps,
                teacher_mean_type=cur_mt, student_mean_type=student_mt,
                mesh=mesh,
            )
            # Fold the round into the key: dstep derives noise via
            # fold_in(key, state.step) and step restarts at 0 each round,
            # so an unfolded key would replay round 1's noise sequence.
            round_key = jax.random.fold_in(key, cur_steps)
            last = {}
            for i in range(args.steps_per_round):
                dstate, last = dstep(dstate, cur_params, next(stream),
                                     round_key)
                if i % max(1, args.steps_per_round // 10) == 0:
                    print(f"[{cur_steps}->{cur_steps // 2}] step {i} "
                          f"loss {float(last['loss']):.5f}", flush=True)
            cur_params, cur_mt = dstate.params, student_mt
            cur_steps //= 2
            grid = student_grid(args.diffusion_steps, cur_steps)
            sdir = os.path.join(args.out, f"student_{cur_steps}")
            mgr = CheckpointManager(sdir, keep_last_n=1)
            mgr.save(0, jax.device_get(dstate), metadata={
                "student_steps": cur_steps,
                "mean_type": args.student_mean_type,
                "schedule": args.schedule,
                "diffusion_steps": args.diffusion_steps,
                "timesteps_grid": grid,
            })
            mgr.close()
            with open(os.path.join(sdir, "grid.json"), "w") as f:
                json.dump({"grid": grid,
                           "mean_type": args.student_mean_type}, f)
            report["rounds"].append({
                "student_steps": cur_steps,
                "final_loss": float(last["loss"]),
                "checkpoint": sdir,
                "grid": grid,
            })
            print(f"saved {sdir} (grid {grid})", flush=True)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
