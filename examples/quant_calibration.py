"""Calibrated vs absmax weight quantization: end-to-end quality on the toy.

Completes the measurement VERDICT item 4 asked for: hole-PSNR of DDIM-50
inpainting with (a) f32 weights, (b) absmax int8 weight-only
(quant/int8.py), (c) calibration-fitted int8 (quant/calibrate.py,
activation-weighted clipping search on 128 real (x_t, t) calibration
samples — the reference's calibration protocol,
scripts/quantize_model.py:96-117). Also reports the activation-weighted
weight error each scheme leaves behind, aggregated over all quantized
kernels, which is the objective the search optimizes directly.

Uses the same 600-step toy-convergence model, masks, and metric as the
DeepCache frontier (examples/deepcache_frontier.py) so rows are comparable
across BENCH.md tables.

Run (TPU, ~3 min with a warm /tmp/fidm_toy600.pkl):
    python examples/quant_calibration.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from fidm_tpu.diffusion import DiffusionSchedule, q_sample
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.quant import (
    collect_input_moments,
    dequantize_params,
    quantize_params,
    quantize_params_calibrated,
)
from fidm_tpu.sampling import SamplerConfig, inpaint_sample

from toy_convergence import CFG, T, synth_batch, train_toy

MIN_SIZE = 4096  # cli.quantize default


def weighted_weight_error(params, qp, moments):
    """Sum over quantized kernels of sum_i h_i (W - deq(W))_i^2 — the
    calibration objective, h=1 where no moments were captured."""
    total = 0.0

    def walk(p, q, prefix=()):
        nonlocal total
        for k in p:
            if isinstance(q[k], dict) and set(q[k]) == {"q", "scale"}:
                w = np.asarray(p[k], np.float32)
                deq = np.asarray(q[k]["q"], np.float32) * np.asarray(
                    q[k]["scale"], np.float32)
                h = moments.get(prefix)
                if h is None or h.shape != (w.shape[-2],):
                    h = np.ones(w.shape[-2], np.float32)
                hrow = np.broadcast_to(h, w.shape[:-1])[..., None]
                total += float((hrow * (w - deq) ** 2).sum())
            elif isinstance(p[k], dict):
                walk(p[k], q[k], prefix + (k,))

    walk(params, qp)
    return total


def main():
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    params, _, _ = train_toy(600, cache_path="/tmp/fidm_toy600.pkl")

    # --- calibration set: 128 real (x_t, t) pairs at random timesteps ---
    key = jax.random.PRNGKey(11)
    batches = []
    for i in range(16):  # 16 x 8 = 128 samples
        key, kb, kt, kn = jax.random.split(key, 4)
        b = synth_batch(kb, 8)
        t = jax.random.randint(kt, (8,), 0, T)
        xt = q_sample(sched, b["image"], t, jax.random.normal(
            kn, b["image"].shape))
        batches.append((xt, t, b["masked_image"], b["mask"]))
    moments = collect_input_moments(model, {"params": params}, batches)
    print(f"moments captured for {len(moments)} modules", flush=True)

    q_abs = quantize_params(params, min_size=MIN_SIZE)
    q_cal = quantize_params_calibrated(params, moments, min_size=MIN_SIZE)

    e_abs = weighted_weight_error(params, q_abs, moments)
    e_cal = weighted_weight_error(params, q_cal, moments)
    print(f"weighted weight error: absmax {e_abs:.5f}  calibrated "
          f"{e_cal:.5f}  ({e_cal / e_abs:.3f}x)", flush=True)

    # --- end-to-end: DDIM-50 inpainting hole-PSNR, held-out masks ---
    test = synth_batch(jax.random.PRNGKey(999), 16)
    hole = test["mask"]
    gt01 = (test["image"] + 1) / 2
    cfg = SamplerConfig(method="ddim", num_steps=50, eta=0.0, injection=True)

    def hole_psnr(out):
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        return 10 * np.log10(1.0 / mse)

    rows = []
    for name, p in (("f32", params),
                    ("int8-absmax", dequantize_params(q_abs)),
                    ("int8-calibrated", dequantize_params(q_cal))):
        out = inpaint_sample(
            lambda x, t, mi, m, _p=p: model.apply({"params": _p}, x, t,
                                                  mi, m),
            sched, cfg, gt=test["image"], mask=test["mask"],
            key=jax.random.PRNGKey(7))
        db = hole_psnr(out)
        rows.append({"scheme": name, "hole_psnr_db": round(db, 2)})
        print(f"{name}: {db:.2f} dB", flush=True)

    report = {"weighted_err_absmax": e_abs, "weighted_err_calibrated": e_cal,
              "err_ratio": round(e_cal / e_abs, 4), "rows": rows}
    with open("/tmp/quant_calibration.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote /tmp/quant_calibration.json")


if __name__ == "__main__":
    main()
