"""Measured refinement study: is cheap-sample + refine a good eval budget?

The refinement mode (`SamplerConfig.strength`, SDEdit) claims light
strengths harmonize existing hole content at cost linear in strength.
This measures it on the toy-convergence model (same protocol as
examples/deepcache_frontier.py):

1. quality anchors: full DDIM-50 from noise, and direct DDIM-K from noise
   at the matched total budgets;
2. a CHEAP init: DDIM-8 from noise (fast, degraded);
3. cheap init + refine at strength 0.2/0.3/0.5 — does harmonizing a cheap
   fill beat spending the same total model evaluations on one direct run?
4. stability: refining the FULL DDIM-50 output at strength 0.2 should
   hold its quality (the iterative-editing use case: light passes after a
   user tweak must not degrade what's already good).

Run (TPU, ~5 min with a warm /tmp/fidm_toy600.pkl):
    python examples/refine_study.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample
from fidm_tpu.sampling.sampler import _respaced_seq, host_alphas_cumprod

from toy_convergence import CFG, T, synth_batch, train_toy


def main():
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    params, _, _ = train_toy(600, cache_path="/tmp/fidm_toy600.pkl")

    test = synth_batch(jax.random.PRNGKey(999), 16)
    hole = test["mask"]
    keep = 1.0 - hole
    gt01 = (test["image"] + 1) / 2
    acp = host_alphas_cumprod(sched)

    def apply_fn(x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    def hole_psnr(out):
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        return 10 * np.log10(1.0 / mse)

    def run(gt, cfg, key=7):
        return inpaint_sample(apply_fn, sched, cfg, gt=gt, mask=test["mask"],
                              key=jax.random.PRNGKey(key))

    def evals(cfg):
        return len(_respaced_seq(sched, cfg, acp))

    def ddim(steps, **kw):
        return SamplerConfig(method="ddim", num_steps=steps, eta=0.0,
                             injection=True, **kw)

    rows = []

    def record(name, out, n_evals):
        db = hole_psnr(out)
        rows.append({"config": name, "model_evals": n_evals,
                     "hole_psnr_db": round(db, 2)})
        print(f"{name:34s} {n_evals:3d} evals  {db:.2f} dB", flush=True)

    # anchors from pure noise
    full = run(test["image"], ddim(50))
    record("direct DDIM-50", full, evals(ddim(50)))
    cheap = run(test["image"], ddim(8))
    record("direct DDIM-8 (cheap init)", cheap, evals(ddim(8)))

    # cheap + refine: composite carries the cheap hole fill, true keep
    composite = np.asarray(cheap) * np.asarray(hole) + \
        np.asarray(test["image"]) * np.asarray(keep)
    composite = jnp.asarray(composite)
    cheap_cost = evals(ddim(8))
    for s in (0.2, 0.3, 0.5):
        cfg = ddim(50, strength=s)
        out = run(composite, cfg, key=11)
        total = cheap_cost + evals(cfg)
        record(f"DDIM-8 + refine s={s}", out, total)
        # matched-budget direct baseline
        direct = ddim(max(2, total - 1))
        record(f"  vs direct DDIM-{direct.num_steps}",
               run(test["image"], direct), evals(direct))

    # stability: light pass over an already-good sample
    full_comp = np.asarray(full) * np.asarray(hole) + \
        np.asarray(test["image"]) * np.asarray(keep)
    out = run(jnp.asarray(full_comp), ddim(50, strength=0.2), key=13)
    record("DDIM-50 + refine s=0.2 (stability)", out,
           evals(ddim(50)) + evals(ddim(50, strength=0.2)))

    with open("/tmp/refine_study.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote /tmp/refine_study.json")


if __name__ == "__main__":
    main()
