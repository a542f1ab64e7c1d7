"""Unified evaluation/inference CLI — ONE entry point with presets.

Replaces the reference's six forked eval scripts (`test_inpainting_better.py`,
`test_inpainting_better_n.py`, `tes_ddpm.py`, `test_ddim_30_cos.py`,
`test_inp_ddim_100.py`, `test_inp_ddim_50.py` — byte-near-identical forks
with different defaults, SURVEY.md §2) with a single config-driven harness:

    python -m fidm_tpu.cli.evaluate --data_dir ... --mask_dir ... \
        --preset ddim-100 --num_samples 100 --checkpoint model.pt

Batched device sampling, per-sample timing, per-image PNGs + comparison
grids, SSIM/PSNR (+ proxy FID and LPIPS where weights allow), metrics.txt —
the full behavior of `InpaintingSampler.run_sampling`
(`test_inpainting_better.py:715-807`).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Batched inpainting evaluation")
    p.add_argument("--config", default=None,
                   help="JSON file of argument defaults (CLI flags override)")
    p.add_argument("--data_dir", required=True, help="test images directory")
    p.add_argument("--mask_dir", required=True,
                   help="mask root (with test/ subdir) or flat mask dir")
    p.add_argument("--output_dir", default="inpainting_results")
    p.add_argument("--checkpoint", default=None,
                   help="torch .pt or orbax checkpoint dir (random init if absent)")
    p.add_argument("--preset", default="ddim-100",
                   help="ddpm-1000 | ddpm-250 | ddpm-100 | ddim-30 | ddim-50 "
                        "| ddim-50-eta0.75 | ddim-100 | ddim-100-det | "
                        "ddim-20-fast | dpm-25 | dpm-20 | dpm-20-fast | "
                        "dpm-25-sde | dpm3-20 | dpm3-12 | repaint-250 | "
                        "repaint-100-light | consistency-1 | consistency-2")
    p.add_argument("--time_spacing", default=None,
                   choices=["uniform", "trailing", "lambda", "karras"],
                   help="how steps are placed on the chain (default: preset)")
    p.add_argument("--ddim_timesteps", type=int, default=None,
                   help="override preset step count")
    p.add_argument("--timesteps", type=int, nargs="+", default=None,
                   help="explicit descending timestep grid (overrides "
                        "step count) — e.g. a distilled student's grid "
                        "from cli.distill's grid.json")
    p.add_argument("--eta", type=float, default=None, help="override preset eta")
    p.add_argument("--schedule", default="quadratic",
                   choices=["linear", "cosine", "quadratic", "sqrt"])
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[16])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_injection", action="store_true")
    p.add_argument("--no_blend", action="store_true")
    p.add_argument("--injection_schedule", default="all",
                   choices=["all", "high", "low"])
    p.add_argument("--mean_type", default=None,
                   choices=["epsilon", "xstart", "velocity", "xprev"],
                   help="model output parameterization (the reference "
                        "factory's predict_xstart flag, "
                        "utils/schedules.py:69-106; velocity = distilled "
                        "students). Default: the preset's (epsilon for "
                        "all but the consistency presets)")
    p.add_argument("--quantize", default="none", choices=["none", "int8"])
    p.add_argument("--encoder_cache", type=int, default=None,
                   help="UNet encoder-reuse period (Faster-Diffusion style); "
                        "run the encoder every k-th step, decoder-only in "
                        "between. 1 = exact sampling (presets may default "
                        "higher, e.g. ddim-20-fast)")
    p.add_argument("--jump_length", type=int, default=None,
                   help="RePaint time-travel jump size (repaint presets)")
    p.add_argument("--jump_n_sample", type=int, default=None,
                   help="RePaint resamplings per segment (1 = plain DDPM)")
    p.add_argument("--encoder_cache_tail", type=int, default=None,
                   help="always run the full model on the last N steps "
                        "(caching hurts most near t=0)")
    p.add_argument("--cache_branch", type=int, default=None,
                   help="with --encoder_cache k>1: 0 = cache encoder+middle "
                        "(default), b>0 = DeepCache deep-trunk mode — cache "
                        "the decoder feature at branch depth b and recompute "
                        "only UNet levels 0..b-1 on non-key steps (skips "
                        "more, keeps full-res skips fresh; use b=1), -1 = "
                        "output reuse — skip the model entirely on non-key "
                        "steps (cheapest, coarsest)")
    p.add_argument("--cache_keysteps", default=None,
                   help="with --encoder_cache k>1: explicit full-evaluation "
                        "schedule replacing the periodic gate. Either a "
                        "comma list of ascending step indices starting at 0 "
                        "('0,3,7,...') or 'N@center:power' to generate an "
                        "N-evaluation non-uniform grid (DeepCache §4.2), "
                        "e.g. '17@1.0:2.0' = 17 full evals concentrated at "
                        "the low-noise end")
    p.add_argument("--save_trajectory", type=int, default=0, metavar="K",
                   help="save every K-th intermediate sampler state as a "
                        "per-sample horizontal strip PNG under "
                        "output_dir/trajectory/ (0 = off; the reference's "
                        "progressive loops, gaussian_diffusion.py:415-445). "
                        "First 4 samples per batch; adds frame-buffer HBM "
                        "proportional to num_steps/K")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                   help="compute dtype (the FP16-inference analogue of "
                        "test_quant.py:393-396; bf16 is TPU-native)")
    p.add_argument("--program_cache", default=None,
                   help="directory of AOT-serialized XLA programs "
                        "(serving/aot.py): skip the sampling-graph compile "
                        "on repeat runs; load only trusted dirs (pickle)")
    p.add_argument("--quick_test", action="store_true",
                   help="8 samples, 2 batches, 10 DDIM steps "
                        "(test_inpainting_better.py:865-889)")
    p.add_argument("--save_images", action="store_true", default=True)
    p.add_argument("--no_save_images", dest="save_images", action="store_false")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA parameters when the orbax "
                        "checkpoint carries them (training --ema_decay)")
    p.add_argument("--lpips_alexnet", default=None,
                   help="path to torchvision AlexNet .pth for real LPIPS")
    p.add_argument("--lpips_lin", default=None,
                   help="path to lpips linear-head .pt")
    p.add_argument("--fid_weights", default=None,
                   help="path to a pt_inception-2015-12-05-layout torch "
                        "checkpoint; enables the real InceptionV3 FID "
                        "(without it only the proxy FID is reported)")
    p.add_argument("--fid_stats", default=None,
                   help=".npz of precomputed reference statistics "
                        "(cli.fid_stats); FID is then computed against "
                        "that fixed reference set instead of this run's "
                        "ground-truth images")
    args, _ = p.parse_known_args(argv)
    if args.config:
        import json as _json

        with open(args.config) as f:
            p.set_defaults(**_json.load(f))
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    from ..data import create_inference_dataloader
    from ..metrics import (
        LPIPS,
        InceptionFeatureExtractor,
        RandomConvFeatureExtractor,
        fid_from_features,
        masked_psnr,
        masked_ssim,
        psnr,
        ssim,
    )
    from ..models import ffhq256_config
    from ..pipeline import SAMPLER_PRESETS, InpaintingPipeline, PipelineConfig
    from ..utils import StepTimer, save_comparison_grid, save_png, to_uint8

    args = parse_args(argv)
    if args.quick_test:
        args.num_samples = 8
        args.batch_size = 4
        args.ddim_timesteps = args.ddim_timesteps or 10

    sampler = SAMPLER_PRESETS[args.preset]
    if args.ddim_timesteps is not None and sampler.method in (
            "ddim", "ddpm", "dpm++2m", "dpm++2m-sde", "dpm++3m", "unipc",
            "repaint",
            "consistency"):
        sampler = dataclasses.replace(sampler, num_steps=args.ddim_timesteps)
    if args.jump_length is not None:
        sampler = dataclasses.replace(sampler, jump_length=args.jump_length)
    if args.jump_n_sample is not None:
        sampler = dataclasses.replace(sampler, jump_n_sample=args.jump_n_sample)
    if args.eta is not None:
        sampler = dataclasses.replace(sampler, eta=args.eta)
    from ..diffusion import ModelMeanType

    # parameterization resolution: explicit flag > checkpoint metadata
    # (cli.train / cli.distill record mean_type) > preset default — so a
    # velocity- or epsilon-trained checkpoint is decoded correctly without
    # the user restating what the training run already knew
    meta_mt = None
    if args.mean_type is None and args.checkpoint and os.path.isdir(
            args.checkpoint):
        from ..training import CheckpointManager as _CM

        _mgr = _CM(args.checkpoint)
        _meta = _mgr.restore_metadata(
            "best" if os.path.isdir(os.path.join(args.checkpoint, "best"))
            else "latest")
        _mgr.close()
        if _meta and _meta.get("mean_type"):
            meta_mt = _meta["mean_type"]
            print(f"mean_type '{meta_mt}' from checkpoint metadata")
    if args.mean_type is not None:
        mean_type = ModelMeanType.from_name(args.mean_type)
    elif meta_mt is not None:
        mean_type = ModelMeanType.from_name(meta_mt)
    else:
        mean_type = sampler.mean_type
    sampler = dataclasses.replace(
        sampler,
        injection=not args.no_injection,
        injection_schedule=args.injection_schedule,
        final_blend=not args.no_blend,
        mean_type=mean_type,
    )
    if args.time_spacing is not None:
        sampler = dataclasses.replace(sampler, time_spacing=args.time_spacing)
    if args.timesteps is not None:
        sampler = dataclasses.replace(sampler,
                                      timesteps=tuple(args.timesteps))
    if args.encoder_cache is not None:
        sampler = dataclasses.replace(
            sampler, encoder_cache_period=args.encoder_cache)
    if args.cache_branch is not None:
        sampler = dataclasses.replace(sampler, cache_branch=args.cache_branch)
    if args.encoder_cache_tail is not None:
        sampler = dataclasses.replace(
            sampler, encoder_cache_tail=args.encoder_cache_tail)
    if args.cache_keysteps is not None:
        from ..diffusion import DiffusionSchedule
        from ..sampling.sampler import (_respaced_seq, host_alphas_cumprod,
                                        keysteps_from_spec)

        if sampler.method in ("consistency", "repaint"):
            # consistency samples on _consistency_seq and repaint on its
            # time-travel walk — both differ in length from _respaced_seq,
            # so an "N@center:power" spec would be scaled to the wrong K
            # (silently misplaced key steps). Reject up front.
            raise SystemExit(
                f"--cache_keysteps is not supported with "
                f"method={sampler.method!r} (its step grid is not the "
                f"respaced DDIM grid the spec is scaled to)")
        sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)
        n_grid = len(_respaced_seq(sched, sampler, host_alphas_cumprod(sched)))
        sampler = dataclasses.replace(
            sampler,
            cache_keysteps=keysteps_from_spec(args.cache_keysteps, n_grid))
    if args.save_trajectory:
        sampler = dataclasses.replace(
            sampler, trajectory_every=args.save_trajectory)

    import jax.numpy as jnp

    config = PipelineConfig(
        unet=ffhq256_config(
            dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
            image_size=args.image_size,
            model_channels=args.model_channels,
            channel_mult=tuple(args.channel_mult),
            num_heads=args.num_heads,
            num_head_channels=args.num_head_channels,
            attention_resolutions=tuple(args.attention_resolutions),
        ),
        schedule=args.schedule,
        num_timesteps=args.diffusion_steps,
        sampler=sampler,
    )
    ckpt = args.checkpoint
    if ckpt and os.path.isdir(ckpt):
        # Orbax checkpoint dir written by training.CheckpointManager
        from ..training import CheckpointManager

        pipe = InpaintingPipeline.create(config,
                                         key=jax.random.PRNGKey(args.seed))
        _mgr = CheckpointManager(ckpt)
        params = _mgr.restore_params(
            "best" if os.path.isdir(os.path.join(ckpt, "best")) else "latest",
            prefer_ema=args.use_ema,
        )
        _mgr.close()
        if isinstance(params, dict) and "__meta__" in params:
            # LoRA training checkpoint: only the adapter pytree is stored;
            # merge it onto the frozen base cli.train saved alongside
            import orbax.checkpoint as ocp

            from ..lora import merge_lora

            base_dir = os.path.join(os.path.abspath(ckpt), "lora_base")
            if not os.path.isdir(base_dir):
                # crash mid-swap leaves the previous base at .old — valid
                # for the adapters saved before the interrupted run
                old_dir = base_dir + ".old"
                if os.path.isdir(old_dir):
                    base_dir = old_dir
                else:
                    raise FileNotFoundError(
                        f"{ckpt} holds a LoRA adapter but no lora_base/ — "
                        "re-train with the current cli.train (it saves the "
                        "frozen base) or merge manually with "
                        "lora.merge_lora")
            base = ocp.StandardCheckpointer().restore(base_dir)
            base = jax.tree_util.tree_map(jnp.asarray, base)
            params = merge_lora(
                base, jax.tree_util.tree_map(jnp.asarray, params))
            print("merged LoRA adapter onto the saved frozen base")
        pipe.variables = {"params": params}
        print(f"loaded orbax params from {ckpt}"
              + (" (EMA)" if args.use_ema else ""))
    elif ckpt and ckpt.endswith(".npz"):
        if args.use_ema:
            print("WARNING: --use_ema ignored — int8 .npz checkpoints carry "
                  "no EMA parameters (only orbax training checkpoints do)")
        from ..quant import dequantize_params
        from .quantize import load_quantized

        pipe = InpaintingPipeline.create(config,
                                         key=jax.random.PRNGKey(args.seed))
        pipe.variables = {"params": dequantize_params(load_quantized(ckpt))}
        print(f"loaded int8-quantized params from {ckpt}")
    else:
        if args.use_ema:
            print("WARNING: --use_ema ignored — only orbax training "
                  "checkpoints carry EMA parameters")
        pipe = InpaintingPipeline.create(config, checkpoint=ckpt,
                                         key=jax.random.PRNGKey(args.seed))
    if args.quantize == "int8":
        from ..quant import dequantize_params, quantize_params

        q = quantize_params(pipe.variables["params"])
        pipe.variables = {"params": dequantize_params(q)}
        print("int8 weight-only quantization applied")

    if args.program_cache:
        from ..serving import aot

        loaded = aot.load_programs(pipe, args.program_cache,
                                   [args.batch_size])
        written = aot.save_programs(pipe, args.program_cache,
                                    [args.batch_size])
        print(f"AOT program cache: {loaded} loaded, "
              f"{written} compiled+saved")

    loader = create_inference_dataloader(
        args.data_dir, args.mask_dir, batch_size=args.batch_size,
        img_size=args.image_size, num_samples=args.num_samples, seed=args.seed,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    timer = StepTimer()
    reals, fakes = [], []
    ssims, psnrs, lpips_vals = [], [], []
    hole_ssims, hole_psnrs, hole_lpips = [], [], []
    lpips_fn = None
    if args.lpips_alexnet and args.lpips_lin:
        lpips_fn = LPIPS.from_torch_files(args.lpips_alexnet, args.lpips_lin)
    if args.fid_stats and not args.fid_weights:
        raise ValueError(
            "--fid_stats requires --fid_weights (the same InceptionV3 "
            "checkpoint the stats were computed with)")
    inception = None
    if args.fid_weights:
        # eager on CPU hosts: a one-off XLA CPU compile of InceptionV3 costs
        # more than running the extraction op-by-op
        inception = InceptionFeatureExtractor.from_torch_file(
            args.fid_weights, jit=jax.default_backend() != "cpu")

    key = jax.random.PRNGKey(args.seed)
    n_done = 0
    for bi, batch in enumerate(loader):
        gt = batch["image"]
        mask = batch["mask"]
        if gt.shape[0] < args.batch_size:
            # pad the trailing partial batch to keep one compiled shape
            pad = args.batch_size - gt.shape[0]
            gt = np.concatenate([gt, np.repeat(gt[-1:], pad, 0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
        else:
            pad = 0
        timer.start()
        out = pipe.inpaint(gt, mask, jax.random.fold_in(key, bi))
        traj = None
        if args.save_trajectory:
            out, traj = out
        timer.stop(out)
        out = np.asarray(out)
        if pad:
            out, gt, mask = out[:-pad], gt[:-pad], mask[:-pad]
        if traj is not None:
            # per-sample strip: masked input, every recorded frame, final
            traj = np.asarray(traj)  # [N, B, H, W, 3]
            for i in range(min(out.shape[0], 4)):
                frames = [to_uint8(gt[i] * (1 - mask[i]))]
                frames += [to_uint8(np.clip(traj[n, i], -1, 1))
                           for n in range(traj.shape[0])]
                frames.append(to_uint8(out[i]))
                save_png(np.concatenate(frames, axis=1),
                         os.path.join(args.output_dir, "trajectory",
                                      f"{n_done + i:05d}_strip.png"))

        gt01 = (gt + 1) / 2
        out01 = (out + 1) / 2
        ssims.extend(np.asarray(ssim(gt01, out01)).tolist())
        psnrs.extend(np.asarray(psnr(gt01, out01)).tolist())
        # hole-region metrics: with blending, the rest of the image is GT.
        # Unscorable samples become None (not dropped), keeping per-sample
        # arrays aligned with dataset/PNG order: PSNR needs a non-empty
        # mask; SSIM additionally needs hole pixels with a centred valid
        # window (outside the (win-1)/2 border band, metrics/ssim.py)
        m = np.asarray(mask)
        from ..metrics.ssim import DEFAULT_WIN_SIZE

        r = (DEFAULT_WIN_SIZE - 1) // 2  # centred-window border band
        scorable_psnr = m.sum(axis=(1, 2, 3)) > 0
        scorable_ssim = m[:, r:m.shape[1] - r, r:m.shape[2] - r].sum(
            axis=(1, 2, 3)) > 0
        hs = np.asarray(masked_ssim(gt01, out01, mask))
        hp = np.asarray(masked_psnr(gt01, out01, mask))
        hole_ssims.extend(
            float(v) if ok else None for v, ok in zip(hs, scorable_ssim))
        hole_psnrs.extend(
            float(v) if ok else None for v, ok in zip(hp, scorable_psnr))
        if lpips_fn is not None:
            lpips_vals.extend(lpips_fn(gt, out).tolist())
            hl = lpips_fn.masked(gt, out, m)
            hole_lpips.extend(
                float(v) if ok else None
                for v, ok in zip(hl, scorable_psnr))
        reals.append(gt01)
        fakes.append(out01)

        if args.save_images:
            for i in range(out.shape[0]):
                idx = n_done + i
                save_png(to_uint8(out[i]),
                         os.path.join(args.output_dir, "inpainted",
                                      f"{idx:05d}.png"))
                save_png(to_uint8(gt[i]),
                         os.path.join(args.output_dir, "original",
                                      f"{idx:05d}.png"))
            grid_rows = [
                [to_uint8(gt[i]), to_uint8(gt[i] * (1 - mask[i])),
                 (mask[i] * 255).astype(np.uint8), to_uint8(out[i])]
                for i in range(min(out.shape[0], 4))
            ]
            save_comparison_grid(
                grid_rows,
                os.path.join(args.output_dir, f"comparison_batch{bi:03d}.png"),
            )
        n_done += out.shape[0]
        print(f"batch {bi}: {out.shape[0]} samples, "
              f"{timer.times[-1]/args.batch_size:.3f}s/sample")

    extractor = RandomConvFeatureExtractor(image_size=args.image_size)
    fid_proxy = fid_from_features(
        np.concatenate([extractor(r) for r in reals]),
        np.concatenate([extractor(f) for f in fakes]),
    )
    fid_real = None
    kid = None
    if inception is not None:
        from ..metrics import (compute_statistics, frechet_distance,
                               kid_from_features)

        fake_feats = np.concatenate([inception(f) for f in fakes])
        mu_f, sig_f = compute_statistics(fake_feats)
        if args.fid_stats:
            ref = np.load(args.fid_stats)
            fid_real = frechet_distance(ref["mu"], ref["sigma"], mu_f, sig_f)
            if "features" in ref and len(fake_feats) >= 2:
                # stats files written by cli.fid_stats carry the raw
                # features, so KID works against the fixed reference set
                # too (older mu/sigma-only files skip it)
                kid = kid_from_features(
                    ref["features"].astype(np.float64), fake_feats,
                    seed=args.seed)
        else:
            real_feats = np.concatenate([inception(r) for r in reals])
            mu_r, sig_r = compute_statistics(real_feats)
            fid_real = frechet_distance(mu_r, sig_r, mu_f, sig_f)
            if len(real_feats) >= 2 and len(fake_feats) >= 2:
                # unbiased companion to FID — meaningful at sample counts
                # where the 2048x2048 covariance estimate is badly biased
                kid = kid_from_features(real_feats, fake_feats,
                                        seed=args.seed)

    results = {
        "num_samples": n_done,
        "preset": args.preset,
        "sampler": str(sampler),
        "ssim_mean": float(np.mean(ssims)),
        "psnr_mean": float(np.mean(psnrs)),
        # None (JSON null) when no sample was scorable — never NaN, which
        # json.dump would emit as an invalid-JSON token
        "hole_ssim_mean": (
            float(np.mean([v for v in hole_ssims if v is not None]))
            if any(v is not None for v in hole_ssims) else None),
        "hole_psnr_mean": (
            float(np.mean([v for v in hole_psnrs if v is not None]))
            if any(v is not None for v in hole_psnrs) else None),
        "fid_proxy": float(fid_proxy),
        # includes the first (compile) batch — the reference harness times
        # the same way (test_inpainting_better.py:732-739)
        "time_per_sample_s": timer.mean / args.batch_size,
        # steady-state throughput, excluding the compile batch
        "time_per_sample_steady_s": (
            float(np.mean(timer.times[1:])) / args.batch_size
            if len(timer.times) > 1 else timer.mean / args.batch_size
        ),
        "backend": jax.default_backend(),
    }
    if fid_real is not None:
        results["fid"] = float(fid_real)
    if kid is not None:
        results["kid_mean"], results["kid_std"] = kid
    if lpips_vals:
        results["lpips_mean"] = float(np.mean(lpips_vals))
        if any(v is not None for v in hole_lpips):
            results["hole_lpips_mean"] = float(
                np.mean([v for v in hole_lpips if v is not None]))
    with open(os.path.join(args.output_dir, "metrics.txt"), "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
    # metrics.json additionally carries per-sample values (in dataset
    # order) for downstream analysis — worst-case mining, significance
    # tests — without rerunning the sampler; summaries stay on stdout
    per_sample = {"ssim": ssims, "psnr": psnrs, "hole_ssim": hole_ssims,
                  "hole_psnr": hole_psnrs}
    if lpips_vals:
        per_sample["lpips"] = lpips_vals
        per_sample["hole_lpips"] = hole_lpips
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump({**results, "per_sample": per_sample}, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
