"""Timestep loss-weighting ablation: none vs min-SNR vs P2 on the toy task.

Trains three identical toy inpainting UNets (same init, same data stream)
differing ONLY in `loss_weight` — uniform masked MSE (the reference's
training loss, `gaussian_diffusion.py:596-605`), min-SNR-5 (Hang et al.
2023), and P2 (Choi et al. 2022) — and reports hole-region PSNR at training
milestones. The papers' claim is faster convergence (min-SNR) / better
perceptual allocation (P2); this measures whether that materializes on the
inpainting toy, so docs can cite numbers instead of citations.

Run (TPU, ~10 min):  python examples/toy_loss_weight.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from toy_convergence import CFG, T, synth_batch
from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

STEPS = 600
BATCH = 64
MILESTONES = (150, 300, 600)


def hole_psnr(model, params, sched, test):
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
    mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
    return 10 * np.log10(1.0 / mse)


def run_variant(kind, gamma):
    key = jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    b0 = synth_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    tx = make_optimizer(make_lr_schedule("cosine", 3e-4, STEPS, 50))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(sched, loss_weight=kind, loss_weight_gamma=gamma)
    test = synth_batch(jax.random.PRNGKey(999), 16)

    t0 = time.time()
    curve = {}
    for i in range(STEPS):
        batch = synth_batch(jax.random.fold_in(key, i), BATCH)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if (i + 1) in MILESTONES:
            curve[i + 1] = hole_psnr(model, state.params, sched, test)
            print(f"  [{kind}] step {i+1}: loss={float(metrics['loss']):.4f}"
                  f" hole-PSNR={curve[i+1]:.2f} dB ({time.time()-t0:.0f}s)")
    return curve


def main():
    results = {}
    for kind, gamma in (("none", None), ("min_snr", 5.0), ("p2", 1.0)):
        print(f"training variant: loss_weight={kind}")
        results[kind] = run_variant(kind, gamma)
    print("\nhole-PSNR (dB) by training step:")
    header = "variant  " + "  ".join(f"@{m}" for m in MILESTONES)
    print(header)
    for kind, curve in results.items():
        print(f"{kind:8s} " + "  ".join(f"{curve[m]:.2f}" for m in MILESTONES))


if __name__ == "__main__":
    main()
