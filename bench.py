"""Headline benchmark: 256x256 DDIM-100 inpainting throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": "img/s", "vs_baseline": x}

vs_baseline is the speedup over the reference's DDIM-100 time/sample of
3.42 s (BASELINE.md, reference README.md:76). Weights are random-initialized
(throughput is architecture+steps dependent, not weight dependent).

Env overrides: FIDM_BENCH_BATCH (default 16), FIDM_BENCH_REPEATS (default 3),
FIDM_BENCH_STEPS (default 100), FIDM_BENCH_METHOD (ddim | ddpm | dpm++2m |
dpm++2m-sde | dpm++3m | repaint), FIDM_BENCH_ENCODER_CACHE (cache period;
default 3, 1 = exact sampling as the headline), FIDM_BENCH_CACHE_BRANCH
(deep-trunk branch depth, default 2), FIDM_BENCH_CACHE_TAIL (exact tail
steps, default 10), FIDM_BENCH_CACHE_KEYSTEPS ('0,3,7,...' or
'N@center:power' — explicit/non-uniform full-eval schedule replacing the
periodic gate), FIDM_BENCH_JUMP_LEN / FIDM_BENCH_JUMP_N (repaint
time-travel parameters). The default headline is the quality-qualified
`ddim-100-deep` preset; when caching is on, the cache-free exact time is
measured in the same run and reported as exact_time_per_sample_s.

Cold-cache contract (round-5 fix for the r04 rc=124 timeout): the headline
JSON line is printed+flushed IMMEDIATELY after the first timed measurement,
BEFORE the exact-anchor leg compiles its second program; the exact leg only
runs if elapsed wall-clock is under FIDM_BENCH_BUDGET_S (default 1500 s),
and when it runs, re-prints the augmented line last (drivers tail-parse).
So a fully cold cache costs exactly ONE sampler-program compile (~10-15 min
through the tunnel) before a parseable line exists. Rehearsal (run after
any preset re-key): `rm -rf /tmp/fidm_jax_cache && timeout 1800 python
bench.py` must print the headline line.
"""
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# Smoke/test mode: FIDM_BENCH_PLATFORM=cpu pins the backend before init
# (the axon sitecustomize ignores the JAX_PLATFORMS env var), and
# FIDM_BENCH_WIDTH shrinks the model so tests/test_bench_contract.py can
# exercise the emit-early contract in seconds instead of minutes.
if os.environ.get("FIDM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FIDM_BENCH_PLATFORM"])

# Reference time/sample for each published config (BASELINE.md; reference
# README.md:75-77). Other (method, steps) combos fall back to DDIM-100.
BASELINES = {
    ("ddim", 100): 3.42,
    ("ddim", 50): 1.75,
    ("ddpm", 1000): 33.41,
}
BASELINE_TIME_PER_SAMPLE = BASELINES[("ddim", 100)]


def main():
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    # Wall-clock budget for OPTIONAL extra legs (the exact-sampling anchor).
    # Under a fully cold compile cache each sampler program costs ~10-15 min
    # through the remote-compile tunnel; the headline leg is compiled and
    # measured FIRST and its JSON line is printed+flushed IMMEDIATELY, so an
    # external timeout mid-exact-leg still leaves a parseable (tail) line.
    # The exact leg only runs if enough budget remains.
    bench_start = time.perf_counter()
    budget_s = float(os.environ.get("FIDM_BENCH_BUDGET_S", "1500"))

    batch = int(os.environ.get("FIDM_BENCH_BATCH", "16"))
    repeats = int(os.environ.get("FIDM_BENCH_REPEATS", "3"))
    steps = int(os.environ.get("FIDM_BENCH_STEPS", "100"))
    method = os.environ.get("FIDM_BENCH_METHOD", "ddim")
    # Headline default: the quality-qualified `ddim-100-deep` preset,
    # RE-KEYED at canonical depth in round 4 (DeepCache deep-trunk,
    # period 3 / branch 2 / exact tail 10): -0.28 dB (box) / -0.39 dB
    # (brush) hole-PSNR vs exact on the trained 6-level model
    # (examples/canonical_frontier.py; the round-3 branch-1 default
    # measured -1.9 to -2.3 dB at true depth — BENCH.md). The exact
    # config is measured in the same run and reported as
    # exact_time_per_sample_s; FIDM_BENCH_ENCODER_CACHE=1 makes exact
    # sampling the headline, FIDM_BENCH_CACHE_BRANCH=1 the turbo preset.
    enc_cache = int(os.environ.get("FIDM_BENCH_ENCODER_CACHE", "3"))
    cache_branch = int(os.environ.get("FIDM_BENCH_CACHE_BRANCH", "2"))
    cache_tail = int(os.environ.get("FIDM_BENCH_CACHE_TAIL", "10"))
    if enc_cache <= 1:
        cache_branch, cache_tail = 0, 0
    # FIDM_BENCH_CACHE_KEYSTEPS: explicit/non-uniform full-eval schedule —
    # either '0,3,7,...' or 'N@center:power' (see sampling.keysteps_from_spec);
    # replaces the periodic gate at the same branch depth.
    keysteps_spec = os.environ.get("FIDM_BENCH_CACHE_KEYSTEPS")
    baseline = BASELINES.get((method, steps), BASELINE_TIME_PER_SAMPLE)

    from fidm_tpu.models import ffhq256_config

    unet_overrides = dict(
        split_decoder_skips=os.environ.get("FIDM_BENCH_SPLIT_SKIPS") == "1",
        image_size=int(os.environ.get("FIDM_BENCH_IMAGE_SIZE", "256")),
    )
    if os.environ.get("FIDM_BENCH_WIDTH"):
        unet_overrides["model_channels"] = int(os.environ["FIDM_BENCH_WIDTH"])
    cfg = PipelineConfig(
        unet=ffhq256_config(**unet_overrides),
        sampler=SamplerConfig(
            method=method,
            num_steps=None if (method == "ddpm" and steps >= 1000) else steps,
            eta=0.9, injection=True,
            encoder_cache_period=enc_cache,
            cache_branch=cache_branch,
            encoder_cache_tail=cache_tail,
            jump_length=int(os.environ.get("FIDM_BENCH_JUMP_LEN", "10")),
            jump_n_sample=int(os.environ.get("FIDM_BENCH_JUMP_N", "10")),
        ),
    )
    if keysteps_spec:
        from fidm_tpu.sampling.sampler import (_respaced_seq,
                                               host_alphas_cumprod,
                                               keysteps_from_spec)
        from fidm_tpu.diffusion import DiffusionSchedule

        sched = DiffusionSchedule.create(cfg.schedule, cfg.num_timesteps)
        n_grid = len(_respaced_seq(sched, cfg.sampler,
                                   host_alphas_cumprod(sched)))
        cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
            cfg.sampler,
            cache_keysteps=keysteps_from_spec(keysteps_spec, n_grid)))
    pipe = InpaintingPipeline.create(cfg)
    if os.environ.get("FIDM_BENCH_BF16_PARAMS") == "1":
        pipe.cast_params(jnp.bfloat16)

    S = cfg.unet.image_size
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((batch, S, S, 3)), jnp.float32) * 0.5
    mask = jnp.zeros((batch, S, S, 1), jnp.float32)
    mask = mask.at[:, S // 4 : 3 * S // 4, S // 4 : 3 * S // 4].set(1.0)

    key = jax.random.PRNGKey(0)

    # NOTE: on the tunneled TPU backend `block_until_ready()` returns
    # immediately; a scalar device->host readback is the only reliable sync,
    # and it keeps the transfer tiny.
    def sync(x):
        return float(jnp.sum(x[0, :2, :2]))

    # warmup / compile
    sync(pipe.inpaint(gt, mask, key))

    t0 = time.perf_counter()
    acc = None
    for i in range(repeats):
        out = pipe.inpaint(gt, mask, jax.random.fold_in(key, i))
        probe = out[0, :2, :2].sum()
        acc = probe if acc is None else acc + probe
    sync_val = float(acc)  # forces execution of every queued iteration
    dt = time.perf_counter() - t0
    assert np.isfinite(sync_val)

    time_per_sample = dt / (repeats * batch)
    imgs_per_sec = 1.0 / time_per_sample
    label = f"{method.upper()}-{steps}"
    if enc_cache > 1:
        label += (f", deep-cache p{enc_cache}/b{cache_branch}"
                  if cache_branch else f", encoder-cache p{enc_cache}")
    result = {
        "metric": f"{S}^2 inpainted images/sec/chip ({label})",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        # reference times are all 256^2; a cross-resolution ratio would be
        # meaningless
        "vs_baseline": (round(baseline / time_per_sample, 3)
                        if S == 256 else None),
        "time_per_sample_s": round(time_per_sample, 4),
        "batch": batch,
        "backend": jax.default_backend(),
    }
    if enc_cache > 1:
        result["encoder_cache_period"] = enc_cache
        result["encoder_cache_tail"] = cache_tail
        if cache_branch:
            result["cache_branch"] = cache_branch
            # measured quality cost at PRODUCTION WIDTH 128 + canonical
            # depth (the architecture this benchmark times; box-mask
            # delta, brush + SSIM/LPIPS columns in BENCH.md "Width-128
            # requalification" — round-5 --width 128 frontier run)
            if (enc_cache, cache_branch, cache_tail) == (3, 2, 10):
                result["hole_psnr_delta_db_canonical"] = -0.93
            elif (enc_cache, cache_branch) == (3, 1):
                result["hole_psnr_delta_db_canonical"] = -5.40

    # Emit the headline line NOW — the driver tail-parses the last printed
    # line, and any extra leg below may cost a second cold compile.
    print(json.dumps(result), flush=True)

    if enc_cache > 1:
        elapsed = time.perf_counter() - bench_start
        if elapsed > budget_s:
            import sys
            print(f"bench: skipping exact-anchor leg (elapsed {elapsed:.0f}s "
                  f"> budget {budget_s:.0f}s — likely a cold compile cache)",
                  file=sys.stderr, flush=True)
            return
        # exact sampling measured in the same run, same inputs — the
        # cache-free anchor the speedup is claimed against
        exact = dataclasses.replace(cfg.sampler, encoder_cache_period=1,
                                    cache_branch=0, encoder_cache_tail=0,
                                    cache_keysteps=None)
        sync(pipe.inpaint(gt, mask, key, sampler=exact))  # compile
        t0 = time.perf_counter()
        acc = None
        for i in range(repeats):
            out = pipe.inpaint(gt, mask, jax.random.fold_in(key, i),
                               sampler=exact)
            probe = out[0, :2, :2].sum()
            acc = probe if acc is None else acc + probe
        assert np.isfinite(float(acc))
        result["exact_time_per_sample_s"] = round(
            (time.perf_counter() - t0) / (repeats * batch), 4)
        # Augmented line printed LAST — tail-parse picks this up when the
        # exact leg completed in budget.
        print(json.dumps(result), flush=True)


def _main_with_retries(attempts: int = 3, wait_s: float = 120.0):
    """The remote-compile tunnel occasionally drops (observed: backend init
    UNAVAILABLE / connection-refused for minutes at a time). A failed
    backend init is cached for the process, so retry by re-executing
    ourselves in a child; one transient blip then doesn't zero the round's
    benchmark artifact."""
    import subprocess
    import sys

    if os.environ.get("FIDM_BENCH_CHILD") == "1":
        return main()
    last = 1
    for attempt in range(attempts):
        try:
            # generous cap: a cold 256² compile through the tunnel is
            # ~10-15 min; a hung backend init during an outage is not
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env={**os.environ, "FIDM_BENCH_CHILD": "1"},
                               timeout=2700)
            last = r.returncode
        except subprocess.TimeoutExpired:
            last = -1
        if last == 0:
            return
        print(f"bench attempt {attempt + 1}/{attempts} failed "
              f"(exit {last}); retrying in {wait_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(wait_s)
    sys.exit(last)


if __name__ == "__main__":
    _main_with_retries()
