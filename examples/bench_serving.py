"""Serving-layer benchmark: concurrent HTTP inpainting on one chip.

Starts the micro-batching server with the canonical FFHQ-256 pipeline,
fires concurrent requests from client threads, and reports throughput and
latency percentiles plus the achieved batch fill. Run:

    python examples/bench_serving.py [--requests 32] [--concurrency 16] \
        [--steps 100] [--batch_size 8]
"""
import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_overload(args, url, payloads, tier_names, server):
    """Fire every request at once against a queue bounded at 2x the device
    batch: successes / 429-rejects / 504-sheds are all CORRECT outcomes —
    the measured claims are (a) the server never hangs or grows an
    unbounded backlog, (b) accepted requests keep a bounded p99, (c) the
    three outcome counts add up (no lost requests)."""
    import urllib.error

    # deadline: generous multiple of one warm request so 504s only fire
    # for genuinely stale queue entries, not healthy waits
    if args.timeout_ms is None:
        t = time.perf_counter()
        req = urllib.request.Request(url, data=payloads[tier_names[0]],
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        args.timeout_ms = 8 * 1000.0 * (time.perf_counter() - t)

    buf = io.BytesIO()
    base = np.load(io.BytesIO(payloads[tier_names[0]]))
    np.savez(buf, timeout_ms=np.float64(args.timeout_ms),
             **{k: base[k] for k in base.files})
    payload = buf.getvalue()

    outcomes = {200: [], 429: 0, 504: 0}
    lock = threading.Lock()

    def worker():
        t = time.perf_counter()
        req = urllib.request.Request(url, data=payload, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                r.read()
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
            e.read()
        with lock:
            if code == 200:
                outcomes[200].append(time.perf_counter() - t)
            else:
                outcomes[code] = outcomes.get(code, 0) + 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.requests)]
    for th in threads:  # all at once — way past max_queue
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    ok = np.sort(np.asarray(outcomes[200]))
    n_ok = len(ok)
    result = {
        "mode": "overload",
        "requests": args.requests,
        "max_queue": server.max_queue,
        "timeout_ms": round(args.timeout_ms, 1),
        "ok": n_ok,
        "rejected_429": outcomes[429],
        "shed_504": outcomes[504],
        "other": {str(k): v for k, v in outcomes.items()
                  if k not in (200, 429, 504)},
        "wall_s": round(wall, 3),
        "ok_p50_s": round(float(ok[n_ok // 2]), 3) if n_ok else None,
        "ok_p99_s": round(float(ok[min(int(n_ok * 0.99), n_ok - 1)]), 3)
        if n_ok else None,
    }
    print(json.dumps(result))
    accounted = n_ok + outcomes[429] + outcomes[504] + sum(
        v for k, v in outcomes.items() if k not in (200, 429, 504))
    assert accounted == args.requests, (accounted, args.requests)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--method", default="ddim", choices=["ddim", "ddpm", "dpm++2m", "dpm++2m-sde", "dpm++3m"])
    p.add_argument("--preset", default=None,
                   help="a SAMPLER_PRESETS name (e.g. consistency-1) — "
                        "overrides --method/--steps")
    p.add_argument("--presets", nargs="+", default=None,
                   help="serve several preset tiers and fire a MIXED "
                        "request stream (round-robin across tiers); "
                        "reports per-tier latency. Overrides --preset")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--tiny", action="store_true",
                   help="16² toy model on CPU — smoke-tests the harness "
                        "itself (numbers are meaningless)")
    p.add_argument("--overload", action="store_true",
                   help="overload protocol: bound the queue at 2x device "
                        "batch, attach per-request deadlines, and fire all "
                        "--requests at once; reports success p50/p99 plus "
                        "429 (rejected) / 504 (shed) counts — measures the "
                        "bounded-queue behavior, not peak throughput")
    p.add_argument("--timeout_ms", type=float, default=None,
                   help="per-request deadline for --overload (default: "
                        "8x the single-request warm latency)")
    p.add_argument("--output_dtype", choices=["float32", "uint8"],
                   default="float32",
                   help="response image dtype for every tier: uint8 "
                        "quantizes on device (reference toU8) — the "
                        "device->host result transfer and the HTTP "
                        "payload shrink 4x")
    p.add_argument("--instrument", action="store_true",
                   help="fence + time every dispatcher phase (assemble/"
                        "upload/dispatch/execute/download) — serializes "
                        "launches; for overhead attribution, not peak "
                        "throughput")
    args = p.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.serving import InpaintingServer
    from fidm_tpu.serving.server import _make_handler
    from http.server import ThreadingHTTPServer

    presets = None
    if args.presets is not None:
        from fidm_tpu.pipeline import SAMPLER_PRESETS

        presets = {n: SAMPLER_PRESETS[n] for n in args.presets}
        sampler = presets[args.presets[0]]
    elif args.preset is not None:
        from fidm_tpu.pipeline import SAMPLER_PRESETS

        sampler = SAMPLER_PRESETS[args.preset]
    else:
        sampler = SamplerConfig(method=args.method, num_steps=args.steps,
                                eta=0.9, injection=True)
    if args.output_dtype != "float32":
        import dataclasses

        sampler = dataclasses.replace(sampler,
                                      output_dtype=args.output_dtype)
        if presets is not None:
            presets = {n: dataclasses.replace(c,
                                              output_dtype=args.output_dtype)
                       for n, c in presets.items()}
    if args.tiny:
        import jax.numpy as jnp

        from fidm_tpu.models import UNetConfig

        cfg = PipelineConfig(
            unet=UNetConfig(image_size=16, in_channels=9, model_channels=32,
                            out_channels=6, num_res_blocks=1,
                            attention_resolutions=(2,), channel_mult=(1, 2),
                            num_heads=2, num_head_channels=16,
                            dtype=jnp.float32),
            schedule="linear", num_timesteps=50, sampler=sampler)
    else:
        cfg = PipelineConfig(sampler=sampler)
    pipe = InpaintingPipeline.create(cfg)
    S = cfg.unet.image_size

    server = InpaintingServer(
        pipe, batch_size=args.batch_size, presets=presets,
        max_queue=2 * args.batch_size if args.overload else None,
        instrument=args.instrument)
    print(f"warming batch shapes {server.batch_sizes}...", flush=True)
    server.warmup()  # compile the whole shape ladder before measuring
    httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                _make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{args.port}/inpaint"

    rng = np.random.default_rng(0)
    image = np.clip(rng.standard_normal((S, S, 3)).astype(np.float32) * 0.4,
                    -1, 1)
    mask = np.zeros((S, S, 1), np.float32)
    mask[S // 4 : 3 * S // 4, S // 4 : 3 * S // 4] = 1.0
    tier_names = list(presets) if presets else [None]
    payloads = {}
    for name in tier_names:
        buf = io.BytesIO()
        extra = {"preset": name} if name is not None else {}
        np.savez(buf, image=image, mask=mask, seed=np.int64(0), **extra)
        payloads[name] = buf.getvalue()

    def post(tier=None):
        req = urllib.request.Request(url, data=payloads[tier], method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = np.load(io.BytesIO(r.read()))["image"]
        assert out.shape == (S, S, 3) and np.isfinite(out).all()

    for name in tier_names:
        post(name)  # warm every tier's device batch program

    if args.overload:
        run_overload(args, url, payloads, tier_names, server)
        httpd.shutdown()
        server.close()
        return

    latencies = {name: [] for name in tier_names}
    lock = threading.Lock()
    sem = threading.Semaphore(args.concurrency)
    threads = []

    t0 = time.perf_counter()

    def worker(i):
        tier = tier_names[i % len(tier_names)]  # round-robin mixed stream
        with sem:
            t = time.perf_counter()
            post(tier)
            with lock:
                latencies[tier].append(time.perf_counter() - t)

    for i in range(args.requests):
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    lat = np.sort(np.concatenate([np.asarray(v) for v in latencies.values()]))
    fill = server.stats["requests"] / max(server.stats["batches"], 1)
    result = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "ddim_steps": args.steps,
        "throughput_req_s": round(args.requests / wall, 3),
        "latency_p50_s": round(float(lat[len(lat) // 2]), 3),
        "latency_p95_s": round(float(lat[int(len(lat) * 0.95)]), 3),
        "mean_batch_fill": round(fill, 2),
        "device_batch": args.batch_size,
        "batches_by_size": {str(k): v
                            for k, v in
                            server.stats["batches_by_size"].items() if v},
    }
    phases = server.stats_snapshot().get("phases_ms", {})
    if phases:
        result["phase_mean_ms"] = {
            k: round(v["ms"] / max(v["n"], 1), 2) for k, v in phases.items()
        }
    if presets:
        result["per_tier_p50_s"] = {
            str(name): round(float(np.sort(v)[len(v) // 2]), 3)
            for name, v in latencies.items() if v
        }
        result["requests_by_preset"] = server.stats["requests_by_preset"]
    print(json.dumps(result))
    httpd.shutdown()
    server.close()


if __name__ == "__main__":
    main()
