"""Serving CLI: batched inpainting over HTTP.

    python -m fidm_tpu.cli.serve --checkpoint model.pt --port 8571
"""
from __future__ import annotations

import argparse

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Inpainting inference server")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=20.0)
    p.add_argument("--preset", default="ddim-100")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--schedule", default="quadratic")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[16])
    return p.parse_args(argv)


def main(argv=None):
    from ..models import ffhq256_config
    from ..pipeline import SAMPLER_PRESETS, InpaintingPipeline, PipelineConfig
    from ..serving import serve

    args = parse_args(argv)
    config = PipelineConfig(
        unet=ffhq256_config(
            image_size=args.image_size,
            model_channels=args.model_channels,
            channel_mult=tuple(args.channel_mult),
            num_heads=args.num_heads,
            num_head_channels=args.num_head_channels,
            attention_resolutions=tuple(args.attention_resolutions),
        ),
        schedule=args.schedule,
        num_timesteps=args.diffusion_steps,
        sampler=SAMPLER_PRESETS[args.preset],
    )
    pipe = InpaintingPipeline.create(config, checkpoint=args.checkpoint)
    # pre-compile the serving shape so the first request isn't a cold start
    import numpy as np

    S = args.image_size
    warm_gt = np.zeros((args.batch_size, S, S, 3), np.float32)
    warm_mask = np.ones((args.batch_size, S, S, 1), np.float32)
    print("compiling serving graph...")
    float(np.asarray(pipe.inpaint(warm_gt, warm_mask,
                                  jax.random.PRNGKey(0)))[0, 0, 0, 0])
    httpd, dispatcher = serve(pipe, args.host, args.port, args.batch_size,
                              args.max_wait_ms)
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {args.batch_size}, preset {args.preset})")
    try:
        httpd.serve_forever()
    finally:
        dispatcher.close()


if __name__ == "__main__":
    main()
