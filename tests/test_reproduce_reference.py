"""The weights-in -> metrics-out rehearsal (VERDICT r2 item 7).

examples/reproduce_reference.py is the documented one-command path from
the three user-supplied artifacts (FFHQ .pt, FID-Inception .pt, LPIPS
.pt) to the reference's published README table. This keeps the rehearsal
green in CI: every seam (reference-layout state-dict key matching, 3->9
input expansion, FID stats npz, metric plumbing, report format) executes
on randomly-initialized reference-layout checkpoints."""
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_reproduce_reference_rehearsal(tmp_path):
    if not os.path.isdir("/root/reference/code"):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "examples"))
    from reproduce_reference import main

    out = str(tmp_path / "repro")
    report = main(["--rehearse", "--output_dir", out])

    assert report["rehearsal"] is True
    res = report["results"]
    # the full metric block came through the real pipeline
    for key in ("fid", "kid_mean", "lpips_mean", "ssim_mean", "psnr_mean",
                "hole_lpips_mean", "hole_ssim_mean", "hole_psnr_mean"):
        assert np.isfinite(res[key]), key
    assert res["fid"] > 0
    # published-table comparison rides in the report
    assert report["reference_published"]["fid"] == 3.24
    # artifacts on disk: stats npz cached, eval outputs, report json
    assert os.path.exists(os.path.join(out, "real_fid_stats.npz"))
    assert os.path.exists(os.path.join(out, "eval", "metrics.json"))
    with open(os.path.join(out, "reproduce_report.json")) as f:
        assert json.load(f)["results"]["fid"] == res["fid"]
    # the rehearsal checkpoint is 3-channel reference-layout: conversion
    # must have exercised the 3->9 input-expansion seam
    import torch

    sd = torch.load(os.path.join(out, "artifacts", "model_final.pt"),
                    map_location="cpu", weights_only=True)
    assert sd["model_state_dict"]["input_blocks.0.0.weight"].shape[1] == 3
