"""SDE x deep-cache composition probe at canonical depth (round 4).

Answers two questions left open by examples/canonical_solver_quality.py
(which found dpm++2m-sde the few-step winner on the product task):
does the serve-default `dpm-25-sde` tier beat the exact DDIM-100 anchor,
and does deep-trunk caching compose with it?  Measured (width-64 6-level
model, BENCH.md "Few-step solver quality", DDIM-100 anchor box 20.60 /
brush 21.98 dB):

    sde-25 exact        box 20.87 (+0.27)  brush 23.16 (+1.18)  0.046 s
    sde-25 b=2 p=3 t=10 box 20.13 (-0.47)  brush 22.96 (+0.98)  1.07x
    sde-25 b=1 p=2 t=4  box 19.94 (-0.66)  brush 22.40 (+0.42)  1.23x

i.e. the serve default is BETTER than exact DDIM-100 on both mask types
at 4x fewer evals, and caching composes gracefully (the speed gain is
modest at 25 steps — fewer steps means fewer cacheable steps).
Reuses the cached canonical params (/tmp/fidm_canon64.pkl; trains one
if absent). Results stream to /tmp/sde_cache_probe.json.
"""
import sys, os, json, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__) or ".")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from canonical_frontier import brush_bank, make_box_masks, make_synth_face, train_canonical
from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import ffhq256_config
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig

S, T, n_eval = 256, 1000, 16
cfg = ffhq256_config(image_size=S, model_channels=64)
sched = DiffusionSchedule.create("quadratic", T)
model, params = train_canonical(cfg, sched, 6000, 16, "/tmp/fidm_canon64.pkl")
pipe = InpaintingPipeline(model, {"params": params}, sched,
                          PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T))
synth = make_synth_face(S)
gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
masks = {"box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
         "brush": brush_bank(S, n_eval, seed=123, coverage=(0.25, 0.45))}
gt01 = (gt + 1) / 2
key = jax.random.PRNGKey(7)

@jax.jit
def hole_mse(out, hole):
    out01 = (jnp.clip(out, -1, 1) + 1) / 2
    return (((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3)

import time
rows = []
base = SamplerConfig(method="dpm++2m-sde", num_steps=25, injection=True)
for name, c in [
    ("sde-25 exact", base),
    ("sde-25 b=2 p=3 t=10", dataclasses.replace(base, encoder_cache_period=3, cache_branch=2, encoder_cache_tail=10)),
    ("sde-25 b=1 p=2 t=4", dataclasses.replace(base, encoder_cache_period=2, cache_branch=1, encoder_cache_tail=4)),
]:
    for mk, mask in masks.items():
        out = pipe.inpaint(gt, mask, key, sampler=c)
        float(jnp.sum(out[0, :2, :2]))
        t0 = time.perf_counter()
        out = pipe.inpaint(gt, mask, key, sampler=c)
        float(jnp.sum(out[0, :2, :2]))
        dt = (time.perf_counter() - t0) / n_eval
        db = 10 * np.log10(1.0 / float(hole_mse(out, mask)))
        row = {"cfg": name, "mask": mk, "hole_psnr_db": round(db, 2),
               "s_per_sample_w64": round(dt, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("/tmp/sde_cache_probe.json", "w") as f:
            json.dump(rows, f, indent=1)
