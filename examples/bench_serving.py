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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--method", default="ddim", choices=["ddim", "ddpm", "dpm++2m", "dpm++2m-sde", "dpm++3m"])
    p.add_argument("--preset", default=None,
                   help="a SAMPLER_PRESETS name (e.g. consistency-1) — "
                        "overrides --method/--steps")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--port", type=int, default=8571)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.serving import InpaintingServer
    from fidm_tpu.serving.server import _make_handler
    from http.server import ThreadingHTTPServer

    if args.preset is not None:
        from fidm_tpu.pipeline import SAMPLER_PRESETS

        sampler = SAMPLER_PRESETS[args.preset]
    else:
        sampler = SamplerConfig(method=args.method, num_steps=args.steps,
                                eta=0.9, injection=True)
    cfg = PipelineConfig(sampler=sampler)
    pipe = InpaintingPipeline.create(cfg)
    S = cfg.unet.image_size

    server = InpaintingServer(pipe, batch_size=args.batch_size)
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
    buf = io.BytesIO()
    np.savez(buf, image=image, mask=mask, seed=np.int64(0))
    payload = buf.getvalue()

    def post():
        req = urllib.request.Request(url, data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = np.load(io.BytesIO(r.read()))["image"]
        assert out.shape == (S, S, 3) and np.isfinite(out).all()

    post()  # warm: compiles the device batch program

    latencies = []
    lock = threading.Lock()
    sem = threading.Semaphore(args.concurrency)
    threads = []

    t0 = time.perf_counter()

    def worker():
        with sem:
            t = time.perf_counter()
            post()
            with lock:
                latencies.append(time.perf_counter() - t)

    for _ in range(args.requests):
        th = threading.Thread(target=worker)
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    lat = np.sort(np.asarray(latencies))
    fill = server.stats["requests"] / max(server.stats["batches"], 1)
    print(json.dumps({
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
    }))
    httpd.shutdown()
    server.close()


if __name__ == "__main__":
    main()
