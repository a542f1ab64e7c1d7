"""End-to-end convergence demonstration on synthetic data.

Trains a small inpainting UNet from scratch on a procedurally-generated
"two-tone gradient faces" distribution, then inpaints held-out samples and
reports hole-region PSNR against ground truth — proof the full
train -> checkpoint -> sample loop learns, beyond unit tests.

Run (TPU, ~2-4 min):  python examples/toy_convergence.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.sampling import SamplerConfig, inpaint_sample
from fidm_tpu.metrics import psnr
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

S = 32
CFG = UNetConfig(
    image_size=S, in_channels=9, model_channels=64, out_channels=6,
    num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2, 2),
    num_heads=2, num_head_channels=32,
)
T = 200
STEPS = 600
BATCH = 64


def synth_batch(key, n):
    """Smooth random 2-tone images: low-frequency sinusoid mixtures."""
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = jax.random.uniform(k1, (n, 2, 3), minval=0.5, maxval=2.5)
    phases = jax.random.uniform(k2, (n, 2, 3), minval=0, maxval=2 * np.pi)
    yy, xx = jnp.mgrid[0:S, 0:S] / S * 2 * np.pi
    img = (
        jnp.sin(freqs[:, 0, None, None, :] * yy[None, :, :, None]
                + phases[:, 0, None, None, :])
        + jnp.sin(freqs[:, 1, None, None, :] * xx[None, :, :, None]
                  + phases[:, 1, None, None, :])
    ) / 2.0
    # random box masks
    pos = jax.random.randint(k3, (n, 2), S // 8, S // 2)
    yy_i = jnp.arange(S)[None, :, None]
    xx_i = jnp.arange(S)[None, None, :]
    mask = (
        (yy_i >= pos[:, 0:1, None]) & (yy_i < pos[:, 0:1, None] + S // 2)
        & (xx_i >= pos[:, 1:2, None]) & (xx_i < pos[:, 1:2, None] + S // 2)
    ).astype(jnp.float32)[..., None]
    return {"image": img, "masked_image": img * (1 - mask), "mask": mask}


def train_toy(steps=STEPS, cache_path=None, key=None):
    """Train the toy inpainting UNet; optionally cache params via pickle.

    Returns (params, first_loss, last_loss). With `cache_path` set, a prior
    run's params load instantly — reuse this from quality experiments
    instead of retraining (`train_toy(3000, "/tmp/toy3k.pkl")`).
    """
    import pickle

    key = key if key is not None else jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            blob = pickle.load(f)
        if isinstance(blob, dict) and blob.get("steps") == steps:
            params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
            print(f"loaded toy params ({steps} steps) from {cache_path}")
            return params, blob.get("first"), blob.get("last")
        print(f"cache {cache_path} is for a different run config; retraining")
    b0 = synth_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    tx = make_optimizer(make_lr_schedule("cosine", 3e-4, steps, 50))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(sched)

    t0 = time.time()
    first = last = None
    for i in range(steps):
        batch = synth_batch(jax.random.fold_in(key, i), BATCH)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if i == 0:
            first = float(metrics["loss"])
        if i % 100 == 0 or i == steps - 1:
            last = float(metrics["loss"])
            print(f"step {i}: loss={last:.4f} ({time.time()-t0:.0f}s)")
    if cache_path:
        np_params = jax.tree_util.tree_map(np.asarray, state.params)
        with open(cache_path, "wb") as f:
            pickle.dump({"steps": steps, "params": np_params,
                         "first": first, "last": last}, f)
        print(f"saved toy params to {cache_path}")
    return state.params, first, last


def main():
    key = jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    params, first, last = train_toy()

    # held-out eval: inpaint and measure hole PSNR vs a copy-masked baseline
    test = synth_batch(jax.random.PRNGKey(999), 16)

    def apply_fn(x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    out = inpaint_sample(
        apply_fn, sched,
        SamplerConfig(method="ddim", num_steps=50, eta=0.0, injection=True),
        gt=test["image"], mask=test["mask"], key=jax.random.PRNGKey(7),
    )
    hole = test["mask"]
    gt01 = (test["image"] + 1) / 2
    out01 = (jnp.clip(out, -1, 1) + 1) / 2
    # PSNR restricted to hole region (compare against zero-fill baseline)
    mse_model = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
    base01 = (test["masked_image"] + 1) / 2
    mse_base = float((((base01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
    psnr_model = 10 * np.log10(1.0 / mse_model)
    psnr_base = 10 * np.log10(1.0 / mse_base)
    print(f"loss: {first:.4f} -> {last:.4f}")
    print(f"hole PSNR: model {psnr_model:.2f} dB vs zero-fill {psnr_base:.2f} dB")

    # quality vs encoder-cache period (the +17% throughput knob, BENCH.md)
    import dataclasses

    def make_cache_apply(depth):
        return (
            lambda x, t, mi, m: model.apply({"params": params}, x, t, mi, m,
                                            return_cache=True,
                                            cache_depth=depth),
            lambda x, t, mi, m, c: model.apply({"params": params}, x, t, mi,
                                               m, cache=c, cache_depth=depth),
        )

    base_cfg = SamplerConfig(method="ddim", num_steps=50, eta=0.0,
                             injection=True)
    # branch=0: encoder+middle cached (Faster-Diffusion); branch=1:
    # DeepCache deep-trunk cached, shallow levels recomputed — at the same
    # period it skips MORE compute, so same-or-better PSNR here means it
    # dominates encoder mode
    for period, tail, branch in ((2, 0, 0), (5, 0, 0), (5, 0, 1), (5, 10, 0),
                                 (10, 0, 0), (10, 0, 1), (10, 10, 0)):
        out_k = inpaint_sample(
            apply_fn, sched,
            dataclasses.replace(base_cfg, encoder_cache_period=period,
                                encoder_cache_tail=tail,
                                cache_branch=branch),
            gt=test["image"], mask=test["mask"], key=jax.random.PRNGKey(7),
            cache_apply=make_cache_apply(branch or None),
        )
        out_k01 = (jnp.clip(out_k, -1, 1) + 1) / 2
        mse_k = float((((out_k01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        print(f"hole PSNR @ encoder_cache={period} tail={tail} "
              f"branch={branch}: {10 * np.log10(1.0 / mse_k):.2f} dB")

    # solver comparison at low step counts: DPM-Solver++(2M) should hold the
    # DDIM-50 quality with far fewer model evaluations than DDIM does
    for method, steps in (("ddim", 50), ("ddim", 12), ("dpm++2m", 12),
                          ("ddim", 8), ("dpm++2m", 8)):
        out_s = inpaint_sample(
            apply_fn, sched,
            SamplerConfig(method=method, num_steps=steps, eta=0.0,
                          injection=True),
            gt=test["image"], mask=test["mask"], key=jax.random.PRNGKey(7),
        )
        out_s01 = (jnp.clip(out_s, -1, 1) + 1) / 2
        mse_s = float((((out_s01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        print(f"hole PSNR @ {method}-{steps}: "
              f"{10 * np.log10(1.0 / mse_s):.2f} dB")

    assert last < first * 0.5, "training did not converge"
    assert psnr_model > psnr_base + 3, "inpainting no better than baseline"
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
