"""Training/fine-tuning CLI.

Replaces `scripts/train.py` (argparse + CheckpointManager + epoch loop,
`scripts/train.py:99-363`) with a pjit data-parallel pipeline: torch FFHQ
checkpoint import, optional LoRA partition, warmup-cosine/step LR, grad
clip, validation, Orbax latest/best/rotating checkpoints, early stopping,
and `--resume latest|best|<step>`.

    python -m fidm_tpu.cli.train --train_dir ... --val_dir ... --mask_dir ...
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Fine-tune the inpainting UNet")
    p.add_argument("--config", default=None,
                   help="JSON file of argument defaults (CLI flags override)")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--mask_dir", default=None,
                   help="mask directory (omit to train on procedural masks)")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--pretrained", default=None,
                   help="torch .pt base checkpoint (FFHQ) to fine-tune from")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--scheduler", default="cosine",
                   choices=["cosine", "step", "none"])
    p.add_argument("--min_lr_ratio", type=float, default=0.01)
    p.add_argument("--grad_clip", type=float, default=1.0)
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
    p.add_argument("--no_injection", action="store_true")
    p.add_argument("--injection_schedule", default="all",
                   choices=["all", "high", "low"])
    p.add_argument("--vb_weight", type=float, default=0.0,
                   help="hybrid MSE+VLB weight (0 = pure masked MSE)")
    p.add_argument("--loss_weight", default="none",
                   choices=["none", "min_snr", "p2"],
                   help="timestep-dependent loss weighting: min_snr "
                        "(Hang et al. 2023, clamp at --snr_gamma) or p2 "
                        "(Choi et al. 2022) — faster convergence / better "
                        "perceptual focus than the reference's uniform MSE")
    p.add_argument("--snr_gamma", type=float, default=None,
                   help="min_snr clamp / p2 exponent (defaults: 5.0 / 1.0)")
    p.add_argument("--mean_type", default="epsilon",
                   choices=["epsilon", "xstart", "velocity", "xprev"],
                   help="training parameterization (the reference factory's "
                        "predict_xstart flag; velocity = v-prediction; "
                        "xprev = posterior-mean target, losses.py:72)")
    p.add_argument("--early_stopping_patience", type=int, default=0)
    p.add_argument("--threaded_loader", action="store_true",
                   help="decode/stack batches on a background thread "
                        "(raw-directory datasets on multi-core hosts; "
                        "identical batch content)")
    p.add_argument("--keep_last_n", type=int, default=3)
    p.add_argument("--async_checkpoint", action="store_true",
                   help="commit rotating checkpoints on Orbax's background "
                        "thread: training continues while the save writes "
                        "(the multi-second save of a big state leaves the "
                        "step-time budget). Crash-safe overwrite and the "
                        "preemption flush are preserved "
                        "(training/checkpoint.py)")
    p.add_argument("--resume", default=None, help="latest | best | <step>")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lora_rank", type=int, default=0,
                   help=">0 trains only LoRA factors on attention layers")
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--fsdp", type=int, default=1,
                   help="fsdp axis size (1 = pure data parallel)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help=">0 maintains an EMA of the params (e.g. 0.9999)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "step (batch_size must be divisible); activation "
                        "memory scales with batch/accum_steps")
    p.add_argument("--remat", default="none",
                   choices=["none", "full", "convs"],
                   help="activation rematerialization: full recomputes "
                        "whole blocks in the backward (max memory saving, "
                        "~20%% step time); convs saves conv/attention "
                        "outputs and recomputes only the cheap glue")
    args, _ = p.parse_known_args(argv)
    if args.config:
        import json as _json

        with open(args.config) as f:
            p.set_defaults(**_json.load(f))
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..data import create_inpainting_dataloaders
    from ..diffusion import DiffusionSchedule
    from ..models import InpaintingUNet, ffhq256_config
    from ..parallel import auto_mesh, shard_params
    from ..training import (
        CheckpointManager,
        FitConfig,
        TrainState,
        fit,
        make_eval_step,
        make_lr_schedule,
        make_optimizer,
        make_train_step,
    )

    args = parse_args(argv)
    # Multi-host pod launch: connect the processes BEFORE the first
    # backend touch so the mesh below spans all global devices. No-op in
    # a plain shell (launcher-env detection, parallel/multihost.py);
    # fit() then flips the loaders' process_local slicing and the
    # CheckpointManager runs its directory surgery primary-only.
    from ..parallel import multihost

    if multihost.initialize():
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()} connected")
    if args.mask_dir is None and args.mask_mode != "procedural":
        print("no --mask_dir: switching to procedural mask generation")
        args.mask_mode = "procedural"
    key = jax.random.PRNGKey(args.seed)

    train_loader, val_loader = create_inpainting_dataloaders(
        args.train_dir, args.val_dir, args.mask_dir,
        batch_size=args.batch_size, img_size=args.image_size,
        mask_mode=args.mask_mode, seed=args.seed,
    )
    steps_per_epoch = len(train_loader)

    cfg = ffhq256_config(
        image_size=args.image_size,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
        remat=args.remat != "none",
        remat_policy=args.remat if args.remat != "none" else "full",
    )
    model = InpaintingUNet(cfg)
    sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)

    if args.pretrained:
        from ..models.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(args.pretrained, cfg)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        print(f"loaded pretrained weights from {args.pretrained}")
    else:
        S = args.image_size
        variables = model.init(
            key, jnp.zeros((1, S, S, 3)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, S, S, 3)), jnp.zeros((1, S, S, 1)),
        )

    mesh = auto_mesh(args.batch_size, fsdp=args.fsdp)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} device(s)")

    lr = make_lr_schedule(
        args.scheduler, args.lr, args.num_epochs * steps_per_epoch,
        args.warmup_epochs * steps_per_epoch, args.min_lr_ratio,
    )
    tx = make_optimizer(lr, args.weight_decay, grad_clip=args.grad_clip)

    param_transform = None
    base_params = variables["params"]
    if args.lora_rank > 0:
        from ..lora import init_lora, lora_param_count, merge_lora

        frozen, _ = shard_params(base_params, mesh)
        lora = init_lora(key, base_params, rank=args.lora_rank,
                         alpha=args.lora_alpha)
        param_transform = lambda l: merge_lora(frozen, l)
        train_params = lora
        print(f"LoRA: training {lora_param_count(lora):,} params "
              f"(rank {args.lora_rank})")
        # persist the frozen base: training checkpoints hold only the
        # adapter pytree, so evaluation needs this to merge against
        # (cli.evaluate auto-detects adapter checkpoints and merges).
        # A resumed run keeps the existing base — the adapters in this dir
        # belong to it; a fresh run rewrites it ATOMICALLY (save to a tmp
        # dir, swap) so a crash mid-write never destroys the only copy,
        # and a stale base from an unrelated earlier run never survives.
        import shutil

        import orbax.checkpoint as ocp

        ckdir = os.path.abspath(args.checkpoint_dir)
        base_dir = os.path.join(ckdir, "lora_base")
        if not (args.resume and os.path.isdir(base_dir)):
            os.makedirs(ckdir, exist_ok=True)
            tmp_dir = os.path.join(ckdir, "lora_base.tmp")
            old_dir = os.path.join(ckdir, "lora_base.old")
            shutil.rmtree(tmp_dir, ignore_errors=True)
            shutil.rmtree(old_dir, ignore_errors=True)
            cp = ocp.StandardCheckpointer()
            cp.save(tmp_dir, jax.device_get(base_params))
            cp.wait_until_finished()
            if os.path.isdir(base_dir):
                os.rename(base_dir, old_dir)
            os.rename(tmp_dir, base_dir)
            shutil.rmtree(old_dir, ignore_errors=True)
    else:
        train_params, _ = shard_params(base_params, mesh,
                                       use_fsdp=args.fsdp > 1)

    state = TrainState.create(apply_fn=model.apply, params=train_params, tx=tx)
    if args.ema_decay > 0:
        from ..training import init_ema

        state = state.replace(ema_params=init_ema(train_params))

    from ..diffusion import ModelMeanType

    mean_type = ModelMeanType.from_name(args.mean_type)
    train_step = make_train_step(
        sched, mesh=mesh, use_injection=not args.no_injection,
        injection_schedule=args.injection_schedule, vb_weight=args.vb_weight,
        loss_weight=args.loss_weight, loss_weight_gamma=args.snr_gamma,
        mean_type=mean_type,
        param_transform=param_transform,
        ema_decay=args.ema_decay if args.ema_decay > 0 else None,
        accum_steps=args.accum_steps,
    )
    eval_step = make_eval_step(
        sched, mesh=mesh, use_injection=not args.no_injection,
        injection_schedule=args.injection_schedule, vb_weight=args.vb_weight,
        loss_weight=args.loss_weight, loss_weight_gamma=args.snr_gamma,
        mean_type=mean_type,
        param_transform=param_transform,
    )

    ckpt = CheckpointManager(args.checkpoint_dir,
                             keep_last_n=args.keep_last_n,
                             async_save=args.async_checkpoint)
    start_epoch = 0
    if args.resume:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            state,
        )
        state, meta = ckpt.restore(args.resume, abstract)
        if meta and "epoch" in meta:
            start_epoch = int(meta["epoch"]) + 1
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    meta = {
        "schedule": args.schedule, "diffusion_steps": args.diffusion_steps,
        "image_size": args.image_size, "lr": args.lr,
        # lets cli.evaluate pick the right decoding without a flag
        "mean_type": args.mean_type,
    }
    with mesh:
        state, history = fit(
            state, train_step, eval_step, train_loader, val_loader, key,
            # checkpoint rotation lives on CheckpointManager (constructed
            # above with --keep_last_n), not here
            FitConfig(num_epochs=args.num_epochs,
                      early_stopping_patience=args.early_stopping_patience,
                      threaded_loader=args.threaded_loader),
            checkpoint_manager=ckpt, mesh=mesh, start_epoch=start_epoch,
            metadata=meta,
        )
    with open(os.path.join(args.checkpoint_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    ckpt.close()
    return history


if __name__ == "__main__":
    main()
