"""Weights-in -> metrics-out: reproduce the reference's published table.

The reference README publishes FID 3.24 / LPIPS 0.047 / SSIM 0.921 for
FFHQ-256 inpainting (reference README.md:73-77), computed by its eval
harness (`test_inpainting_better.py`: sample -> save PNGs -> pytorch-fid
over directories -> lpips/ssim per pair). Those numbers need three
artifacts we cannot ship (no egress, no weights on disk): the trained
FFHQ checkpoint, the pt_inception-2015-12-05 FID weights, and the LPIPS
AlexNet backbone + linear heads. This script is the one-command path from
those artifacts to the same table:

    python examples/reproduce_reference.py \
        --ffhq_checkpoint model_final.pt \
        --fid_weights pt_inception-2015-12-05.pth \
        --lpips_alexnet alexnet.pth --lpips_lin lpips_lin.pt \
        --data_dir ffhq_test/ --mask_dir masks/ --output_dir out/

It chains the production CLIs (every seam is the real one, nothing
re-implemented here):
  1. `cli.fid_stats`  — reference (mu, sigma) + raw features npz from
     the real-image directory (cached in output_dir across runs);
  2. `cli.evaluate`   — torch-ckpt conversion (key matching, 3->9 input
     expansion if the checkpoint is unconditional), DDIM sampling with
     injection, PNGs, and the metric block (FID/KID/LPIPS/SSIM/PSNR +
     hole-region variants);
  3. prints the README-style table next to the reference's published
     numbers.

Rehearsal mode (`--rehearse`) executes the complete path with NO external
artifacts: it builds randomly-initialized *reference-layout* torch
checkpoints (the actual reference `UNetModel` class, a 3-channel one so
the input-expansion seam runs; the FID-Inception and LPIPS oracle
layouts) plus a tiny synthetic data tree, then runs steps 1-3 on them.
Every seam — state-dict key matching, 3->9 expansion, stats npz, metric
plumbing, report format — is executed, not just unit-tested
(tests/test_reproduce_reference.py keeps it green in CI).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json

REFERENCE_PUBLISHED = {"fid": 3.24, "lpips_mean": 0.047, "ssim_mean": 0.921}


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Reproduce the reference's published FFHQ-256 metrics")
    p.add_argument("--ffhq_checkpoint", help="trained reference .pt")
    p.add_argument("--fid_weights",
                   help="pt_inception-2015-12-05-layout torch checkpoint")
    p.add_argument("--lpips_alexnet", help="torchvision AlexNet features .pth")
    p.add_argument("--lpips_lin", help="LPIPS linear-head weights .pt")
    p.add_argument("--data_dir", help="real test images")
    p.add_argument("--mask_dir", help="mask root or flat mask dir")
    p.add_argument("--output_dir", default="reproduce_out")
    p.add_argument("--preset", default="ddim-100",
                   help="sampler preset (the published table's config)")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--rehearse", action="store_true",
                   help="generate tiny reference-layout artifacts + "
                        "synthetic data and run the full path on them")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra flags passed through to cli.evaluate "
                        "(e.g. --extra --image_size 32 ...)")
    return p.parse_args(argv)


def make_rehearsal_artifacts(root):
    """Randomly-initialized artifacts in the exact layouts users supply."""
    import numpy as np
    import torch
    from PIL import Image

    tests_dir = os.path.join(os.path.dirname(__file__), "..", "tests")
    sys.path.insert(0, tests_dir)
    sys.path.insert(0, "/root/reference/code")
    from oracle_fid_inception import FIDInceptionOracle, randomize
    from oracle_lpips import LPIPSOracle
    from unet import UNetModel  # the reference's actual torch class

    os.makedirs(root, exist_ok=True)
    # 3-channel (unconditional-layout) checkpoint: the converter must run
    # the 3->9 RGB-copy + zero-init expansion (torch_import.py seam)
    torch.manual_seed(0)
    tm = UNetModel(image_size=32, in_channels=3, model_channels=32,
                   out_channels=6, num_res_blocks=1,
                   attention_resolutions=(2,), channel_mult=(1, 2),
                   num_heads=2, num_head_channels=16,
                   use_scale_shift_norm=True, resblock_updown=True)
    with torch.no_grad():
        for q in tm.parameters():
            q.copy_(torch.randn_like(q) * 0.05)
    ckpt = os.path.join(root, "model_final.pt")
    torch.save({"model_state_dict": tm.state_dict()}, ckpt)

    fid_w = os.path.join(root, "pt_inception.pth")
    torch.save(randomize(FIDInceptionOracle(), seed=0).state_dict(), fid_w)
    oracle = LPIPSOracle()
    alex_w = os.path.join(root, "alexnet.pth")
    lin_w = os.path.join(root, "lpips_lin.pt")
    torch.save(oracle.alexnet_state_dict(), alex_w)
    torch.save(oracle.lpips_state_dict(), lin_w)

    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks", "test")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(os.path.join(img_dir, f"{i:03d}.png"))
        m = np.full((32, 32), 255, np.uint8)
        m[8:24, 8:24] = 0  # black = hole (reference convention)
        Image.fromarray(m).save(os.path.join(mask_dir, f"{i:03d}.png"))
    return {
        "ffhq_checkpoint": ckpt, "fid_weights": fid_w,
        "lpips_alexnet": alex_w, "lpips_lin": lin_w,
        "data_dir": img_dir, "mask_dir": os.path.join(root, "masks"),
        "extra": ["--image_size", "32", "--model_channels", "32",
                  "--channel_mult", "1", "2", "--num_heads", "2",
                  "--num_head_channels", "16",
                  "--attention_resolutions", "2",
                  "--diffusion_steps", "100", "--preset", "ddim-30"],
    }


def main(argv=None):
    args = parse_args(argv)
    if args.rehearse:
        art = make_rehearsal_artifacts(os.path.join(args.output_dir,
                                                    "artifacts"))
        for k, v in art.items():
            if k == "extra":
                args.extra = v + args.extra
            else:
                setattr(args, k, v)
        args.preset = "ddim-30"
        args.batch_size = 6
    missing = [k for k in ("ffhq_checkpoint", "fid_weights", "lpips_alexnet",
                           "lpips_lin", "data_dir", "mask_dir")
               if not getattr(args, k)]
    if missing:
        raise SystemExit(f"missing required artifacts: {missing} "
                         "(or use --rehearse)")

    from fidm_tpu.cli.evaluate import main as evaluate_main
    from fidm_tpu.cli.fid_stats import main as fid_stats_main

    os.makedirs(args.output_dir, exist_ok=True)
    stats_npz = os.path.join(args.output_dir, "real_fid_stats.npz")
    image_size = "256"
    if "--image_size" in args.extra:
        image_size = args.extra[args.extra.index("--image_size") + 1]
    if not os.path.exists(stats_npz):  # step 1 (cached across runs)
        fid_stats_main(["--data_dir", args.data_dir,
                        "--fid_weights", args.fid_weights,
                        "--out", stats_npz, "--image_size", image_size]
                       + (["--num_samples", str(args.num_samples)]
                          if args.num_samples else []))

    eval_argv = [  # step 2: the production eval harness
        "--data_dir", args.data_dir, "--mask_dir", args.mask_dir,
        "--output_dir", os.path.join(args.output_dir, "eval"),
        "--checkpoint", args.ffhq_checkpoint, "--preset", args.preset,
        "--batch_size", str(args.batch_size),
        "--fid_weights", args.fid_weights, "--fid_stats", stats_npz,
        "--lpips_alexnet", args.lpips_alexnet, "--lpips_lin", args.lpips_lin,
    ] + (["--num_samples", str(args.num_samples)] if args.num_samples
         else []) + args.extra
    results = evaluate_main(eval_argv)

    rows = [("FID", "fid"), ("KID", "kid_mean"), ("LPIPS", "lpips_mean"),
            ("SSIM", "ssim_mean"), ("PSNR (dB)", "psnr_mean"),
            ("hole-LPIPS", "hole_lpips_mean"),
            ("hole-SSIM", "hole_ssim_mean"),
            ("hole-PSNR (dB)", "hole_psnr_mean")]
    print(f"\n{'metric':<16}{'this run':>12}{'reference published':>22}")
    for label, key in rows:
        ref = REFERENCE_PUBLISHED.get(key)
        print(f"{label:<16}{results.get(key, float('nan')):>12.4f}"
              f"{ref if ref is not None else '—':>22}")
    report = {"results": {k: results.get(k) for _, k in rows},
              "reference_published": REFERENCE_PUBLISHED,
              "preset": args.preset, "rehearsal": args.rehearse}
    out_json = os.path.join(args.output_dir, "reproduce_report.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_json}")
    return report


if __name__ == "__main__":
    main()
