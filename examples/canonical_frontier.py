"""DeepCache / refine-tier quality frontier at CANONICAL DEPTH (6 levels).

Round-3 published the caching frontier measured on a 3-level toy UNet; its
branch indices map to the 6-level FFHQ architecture only approximately
(BENCH.md caveat). This study closes that gap without pretrained artifacts:
it trains a 6-level, reduced-width UNet (the exact canonical topology of
reference `train_inpainting.py:208-224` — channel_mult=(1,1,2,2,4,4),
attn@ds16, resblock up/down, scale-shift norm — at model_channels=64
instead of 128; --width overrides) from scratch at 256^2 on procedurally
generated
synthetic faces + procedural masks, ON the TPU, then re-measures:

  1. the DeepCache frontier (encoder-mode b=0 vs deep-trunk b=1/b=2 vs
     output-reuse b=-1, across periods and tails) at the flagship
     protocol: quadratic-1000 schedule, DDIM-100, eta 0.9, injection —
     i.e. the `ddim-100-deep` preset is qualified on the architecture it
     actually ships for;
  2. the `ddim-20-fast` preset vs its exact DDIM-20 anchor;
  3. the refine-tier knee: cheap DDIM-8 fill + strength in {0.2,0.3,0.5}
     DDIM-50 refinement vs exact DDIM-50 (docs/TUNING.md recipe).

Deltas are hole-region PSNR vs each config's exact anchor, on held-out
synthetic faces, with BOTH easy random-box masks and hard brush masks
(the round-3 stress protocol).

Run (TPU; expect ~1.5-2.5 h dominated by remote compiles of the ~15
distinct sampling programs — results stream to /tmp/canonical_frontier*.json
as they land):
    python examples/canonical_frontier.py
    python examples/canonical_frontier.py --smoke   # tiny CPU smoke (~2 min)

Trained params are cached at /tmp/fidm_canon48.pkl (reruns skip training).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


# ---------------------------------------------------------------- synth data
def make_synth_face(S: int):
    """Per-sample synthetic 'face' generator: [S,S,3] in [-1,1], jit/vmap-able.

    Structured enough that caching errors are visible at every scale:
    smooth global gradient background (long-range, what the deep trunk
    models), an elliptical head with radial shading, symmetric eyes +
    mouth (sharp local detail, what the full-res levels resolve), and a
    low-amplitude fine texture.
    """
    yy, xx = jnp.mgrid[0:S, 0:S] / (S - 1)

    def synth(key):
        ks = jax.random.split(key, 10)
        u = lambda k, lo, hi, shape=(): jax.random.uniform(  # noqa: E731
            k, shape, minval=lo, maxval=hi)
        # background gradient between two random colors
        c0 = u(ks[0], -0.9, 0.9, (3,))
        c1 = u(ks[1], -0.9, 0.9, (3,))
        ang = u(ks[2], 0.0, np.pi)
        g = (jnp.cos(ang) * xx + jnp.sin(ang) * yy)[..., None]
        img = c0 + (c1 - c0) * g
        # head ellipse with radial shading
        cy, cx = u(ks[3], 0.42, 0.58), u(ks[4], 0.42, 0.58)
        ry, rx = u(ks[5], 0.26, 0.38), u(ks[6], 0.18, 0.28)
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        head = jax.nn.sigmoid((1.0 - d) * 30.0)[..., None]
        skin = u(ks[7], -0.2, 0.9, (3,))
        shade = jnp.clip(1.0 - 0.35 * d, 0.0, 1.0)[..., None]
        img = img * (1 - head) + head * skin * shade
        # eyes: symmetric about the head's vertical axis
        eo = u(ks[8], 0.30, 0.45) * rx          # horizontal eye offset
        ey = cy - 0.25 * ry
        er = 0.12 * rx
        eye_col = u(ks[9], -1.0, -0.2, (3,))
        for ex in (cx - eo, cx + eo):
            de = ((yy - ey) / (er * 0.8)) ** 2 + ((xx - ex) / er) ** 2
            eye = jax.nn.sigmoid((1.0 - de) * 60.0)[..., None]
            img = img * (1 - eye) + eye * eye_col
        # mouth
        my = cy + 0.45 * ry
        dm = ((yy - my) / (0.10 * ry)) ** 2 + ((xx - cx) / (0.45 * rx)) ** 2
        mouth = jax.nn.sigmoid((1.0 - dm) * 60.0)[..., None]
        img = img * (1 - mouth) + mouth * eye_col * 0.7
        # fine texture inside the head
        tex = 0.04 * jnp.sin(yy * S * 0.35) * jnp.sin(xx * S * 0.35)
        img = img + head * tex[..., None]
        return jnp.clip(img, -1.0, 1.0)

    return synth


def make_box_masks(key, n, S):
    """Random box masks [n,S,S,1], side ~ U(0.25, 0.55) * S (device)."""
    k1, k2 = jax.random.split(key)
    side = jax.random.randint(k1, (n, 2), S // 4, (11 * S) // 20)
    pos = jax.random.randint(k2, (n, 2), 0, S)
    pos = jnp.minimum(pos, S - side)
    yy = jnp.arange(S)[None, :, None]
    xx = jnp.arange(S)[None, None, :]
    m = ((yy >= pos[:, 0:1, None]) & (yy < (pos[:, 0:1, None] + side[:, 0:1, None]))
         & (xx >= pos[:, 1:2, None]) & (xx < (pos[:, 1:2, None] + side[:, 1:2, None])))
    return m.astype(jnp.float32)[..., None]


def brush_bank(S, n, seed=7, coverage=(0.15, 0.5)):
    from fidm_tpu.data.masks import random_brush_mask

    rng = np.random.default_rng(seed)
    bank = np.stack([random_brush_mask(rng, S, coverage=coverage)
                     for _ in range(n)])
    return jnp.asarray(bank.reshape(n, S, S, 1) > 0.5, jnp.float32)


# ---------------------------------------------------------------- metrics
def make_quality_fns(gt):
    """Hole-region quality scorer: PSNR + SSIM + LPIPS-proxy per config.

    Round-5 addition (VERDICT weak #5): every preset decision was keyed on
    hole-PSNR alone, which favors the blur/averaging that caching and
    deterministic solvers produce; the reference itself reports LPIPS/SSIM
    alongside FID (README.md:73-77). SSIM is weight-free and exact
    (skimage semantics, fidm_tpu.metrics.ssim). LPIPS uses seeded random
    AlexNet filters (`LPIPS(weights=None)`) because this environment has
    no pretrained weights — a PROXY valid for RELATIVE ranking between
    configs on the same data only, never for absolute comparisons.

    PSNR/SSIM reduce on device (scalar readback through the tunnel);
    LPIPS-proxy reads back one [B] vector per call (tiny).
    """
    from fidm_tpu.metrics import LPIPS, masked_ssim

    gt01 = (gt + 1) / 2
    lp = LPIPS(weights=None)

    @jax.jit
    def _psnr_ssim(out, hole):
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = (((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3)
        sv = masked_ssim(gt01, out01, hole).mean()
        return mse, sv

    def score(out, hole):
        mse, sv = _psnr_ssim(out, hole)
        lpv = float(np.mean(lp.masked(gt, jnp.clip(out, -1, 1), hole)))
        return {
            "hole_psnr_db": round(10 * float(np.log10(1.0 / float(mse))), 2),
            "hole_ssim": round(float(sv), 4),
            "hole_lpips_proxy": round(lpv, 4),
        }

    return score


def add_deltas(row, anchor):
    """delta_* columns vs an anchor row (PSNR/SSIM up = better; LPIPS
    down = better, so its delta is negated to keep 'positive = better')."""
    row["delta_db"] = round(row["hole_psnr_db"] - anchor["hole_psnr_db"], 2)
    row["delta_ssim"] = round(row["hole_ssim"] - anchor["hole_ssim"], 4)
    row["delta_lpips_proxy"] = round(
        anchor["hole_lpips_proxy"] - row["hole_lpips_proxy"], 4)
    return row


# ---------------------------------------------------------------- training
def train_canonical(cfg, sched, steps, batch, cache_path, lr=2e-4):
    import pickle

    from fidm_tpu.models import InpaintingUNet
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step
    from fidm_tpu.training.lr import make_lr_schedule

    model = InpaintingUNet(cfg)
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("steps") == steps and blob.get("width") == cfg.model_channels:
            print(f"loaded canonical params from {cache_path}", flush=True)
            return model, jax.tree_util.tree_map(jnp.asarray, blob["params"])
        print("param cache is for a different config; retraining", flush=True)

    S = cfg.image_size
    synth = make_synth_face(S)
    bank = brush_bank(S, 64)

    def make_batch(key, n):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jax.vmap(synth)(jax.random.split(k1, n))
        box = make_box_masks(k2, n, S)
        idx = jax.random.randint(k3, (n,), 0, bank.shape[0])
        use_brush = jax.random.bernoulli(k4, 0.5, (n,))
        mask = jnp.where(use_brush[:, None, None, None], bank[idx], box)
        return {"image": img, "masked_image": img * (1 - mask), "mask": mask}

    key = jax.random.PRNGKey(0)
    b0 = make_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"canonical-depth model: {n_params/1e6:.1f} M params", flush=True)
    tx = make_optimizer(make_lr_schedule("cosine", lr, steps, 200))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(sched)

    batch_size = batch

    # fuse data generation into the step so batches never cross the tunnel
    @jax.jit
    def gen_and_step(state, key):
        b = make_batch(jax.random.fold_in(key, state.step), batch_size)
        return step(state, b, key)
    t0 = time.time()
    for i in range(steps):
        state, metrics = gen_and_step(state, key)
        if i % 200 == 0 or i == steps - 1:
            loss = float(metrics["loss"])  # sync point
            print(f"step {i}: loss={loss:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
    if cache_path:
        np_params = jax.tree_util.tree_map(np.asarray, state.params)
        with open(cache_path, "wb") as f:
            pickle.dump({"steps": steps, "width": cfg.model_channels,
                         "params": np_params}, f)
        print(f"saved params to {cache_path}", flush=True)
    return model, state.params


# ---------------------------------------------------------------- frontier
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU smoke run (validates the script end-to-end)")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--presets_only", action="store_true",
                   help="re-qualification mode: only the shipped presets + "
                        "their nearest alternatives + exact anchors, and no "
                        "refine-knee sweep — 7 compiled programs instead of "
                        "16 (at width 128 every program is a ~10-15 min "
                        "tunnel compile)")
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.models import ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    if args.smoke:
        S, T, steps, batch, n_eval = 64, 50, 3, 2, 2
        K_MAIN, K_FAST, K_FILL, K_REF = 10, 6, 4, 8
        cache_path = None
    else:
        S, T, steps, batch, n_eval = 256, 1000, args.steps, args.batch, 16
        K_MAIN, K_FAST, K_FILL, K_REF = 100, 20, 8, 50
        cache_path = f"/tmp/fidm_canon{args.width}.pkl"

    cfg = ffhq256_config(image_size=S, model_channels=args.width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, params = train_canonical(cfg, sched, steps, batch, cache_path)

    pipe = InpaintingPipeline(
        model, {"params": params}, sched,
        PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T))

    # held-out eval set, easy (box) and hard (brush) mask protocols
    synth = make_synth_face(S)
    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {
        "box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
        "brush": brush_bank(S, n_eval, seed=123, coverage=(0.25, 0.45)),
    }
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    def run(cfg_s, mask, x=None, rkey=None):
        """(metrics_dict, seconds_per_sample, out) — 2nd call timed."""
        g = gt if x is None else x
        k = key if rkey is None else rkey
        out = pipe.inpaint(g, mask, k, sampler=cfg_s)
        float(jnp.sum(out[0, :2, :2]))  # sync (block_until_ready is a no-op)
        t0 = time.perf_counter()
        out = pipe.inpaint(g, mask, k, sampler=cfg_s)
        float(jnp.sum(out[0, :2, :2]))  # sync
        dt = time.perf_counter() - t0
        return score(out, mask), dt / gt.shape[0], out

    results = {"width": args.width, "steps": steps, "S": S, "rows": []}
    out_path = ("/tmp/canonical_frontier_smoke.json" if args.smoke
                else f"/tmp/canonical_frontier_w{args.width}.json")

    def emit(row):
        results["rows"].append(row)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(row), flush=True)

    base = SamplerConfig(method="ddim", num_steps=K_MAIN, eta=0.9,
                         injection=True)
    # the caching grid: (branch, period, tail); branch 0=encoder,
    # -1=output-reuse, 1/2=deep trunk. This study's result re-keyed
    # ddim-100-deep to (2, 3, 10); (1, 3, *) is the superseded round-3 pick.
    grid = [(1, 3, 10), (1, 5, 10), (1, 2, 10),
            (2, 3, 10), (0, 3, 10), (-1, 3, 10), (1, 3, 0)]
    if args.presets_only:
        # shipped `ddim-100-deep` pick (2,3,10), the superseded round-3
        # pick (1,3,10), and the cheap encoder-mode alternative (0,3,10)
        grid = [(2, 3, 10), (1, 3, 10), (0, 3, 10)]
    if args.smoke:
        grid = [(1, 3, 2), (0, 3, 2), (-1, 3, 2)]

    for mk, mask in masks.items():
        anchor, tps, _ = run(base, mask)
        emit({"cfg": f"ddim-{K_MAIN} exact", "mask": mk, **anchor,
              "s_per_sample": round(tps, 4)})
        for branch, period, tail in grid:
            c = dataclasses.replace(base, encoder_cache_period=period,
                                    cache_branch=branch,
                                    encoder_cache_tail=tail)
            m, tps, _ = run(c, mask)
            emit(add_deltas(
                {"cfg": f"ddim-{K_MAIN} b={branch} p={period} t={tail}",
                 "mask": mk, **m, "s_per_sample": round(tps, 4)}, anchor))

    # ddim-20-fast preset vs exact DDIM-20
    fast_grid = [
        (f"ddim-{K_FAST} exact",
         SamplerConfig(method="ddim", num_steps=K_FAST, eta=0.9,
                       injection=True)),
        (f"ddim-{K_FAST} b=0 p=2 (rejected encoder mode)",
         SamplerConfig(method="ddim", num_steps=K_FAST, eta=0.9,
                       injection=True, encoder_cache_period=2)),
        (f"ddim-{K_FAST} b=1 p=2 t=4 (ddim-20-fast)",
         SamplerConfig(method="ddim", num_steps=K_FAST, eta=0.9,
                       injection=True, encoder_cache_period=2,
                       cache_branch=1, encoder_cache_tail=4)),
    ]
    for mk, mask in masks.items():
        anchor = None
        for name, c in fast_grid:
            m, tps, _ = run(c, mask)
            row = {"cfg": name, "mask": mk, **m,
                   "s_per_sample": round(tps, 4)}
            if anchor is None:
                anchor = m
            else:
                add_deltas(row, anchor)
            emit(row)

    # refine-tier knee: cheap DDIM-K_FILL fill, then strength-truncated
    # DDIM-K_REF refinement over the composited fill; anchor = exact
    # DDIM-K_REF from noise. evals(s) = round(s * K_REF) + K_FILL.
    if args.presets_only:
        print(f"wrote {out_path} (presets-only mode: refine knee skipped)",
              flush=True)
        return

    fill_cfg = SamplerConfig(method="ddim", num_steps=K_FILL, eta=0.9,
                             injection=True)
    ref_cfg = SamplerConfig(method="ddim", num_steps=K_REF, eta=0.9,
                            injection=True)
    for mk, mask in masks.items():
        anchor, tps, _ = run(ref_cfg, mask)
        emit({"cfg": f"ddim-{K_REF} exact (refine anchor)", "mask": mk,
              **anchor, "s_per_sample": round(tps, 4)})
        m_f, _, fill = run(fill_cfg, mask)
        emit(add_deltas({"cfg": f"ddim-{K_FILL} fill", "mask": mk, **m_f},
                        anchor))
        for s in (0.2, 0.3, 0.5):
            c = dataclasses.replace(ref_cfg, strength=s)
            m, _, _ = run(c, mask, x=fill, rkey=jax.random.PRNGKey(11))
            evals = int(round(s * K_REF)) + K_FILL
            emit(add_deltas(
                {"cfg": f"fill-{K_FILL} + refine s={s} (evals={evals})",
                 "mask": mk, **m}, anchor))

    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
