"""SamplerConfig.output_dtype="uint8": on-device quantized responses.

VERDICT r4 weak #4: ~85% of fast-tier serving latency is the f32 result
download; the payload is a [-1,1] image, so a device-side uint8 encoding
cuts the dominant phase ~4x. The quantization must be the reference's
exact toU8 (`/root/reference/code/test_inpainting_better.py:39-48`):
((x+1)*127.5).clamp(0,255) then a TRUNCATING cast — verified here against
a torch oracle bit-for-bit, and against host-side quantization of the
float32 sampler output (the conversion is appended inside the same
compiled program, so pixels match exactly).
"""
import dataclasses
import io
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.models import UNetConfig
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.sampling.sampler import _finalize_output
from fidm_tpu.serving import InpaintingServer, serve

S = 16
TINY = PipelineConfig(
    unet=UNetConfig(
        image_size=S, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, dtype=jnp.float32,
    ),
    schedule="linear", num_timesteps=50,
    sampler=SamplerConfig(method="ddim", num_steps=5, eta=0.9),
)


@pytest.fixture(scope="module")
def pipeline():
    return InpaintingPipeline.create(TINY)


def _sample_batch(n=2, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.clip(rng.standard_normal((n, S, S, 3)), -1, 1).astype(np.float32)
    mask = np.zeros((n, S, S, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    return gt, mask


def _torch_to_u8(x_nhwc):
    """The reference's toU8 verbatim on NCHW torch tensors
    (test_inpainting_better.py:39-48), returned as NHWC numpy."""
    import torch

    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    t = ((t + 1) * 127.5).clamp(0, 255).to(torch.uint8)
    return t.permute(0, 2, 3, 1).contiguous().numpy()


def test_finalize_matches_torch_toU8_bitwise():
    rng = np.random.default_rng(0)
    # cover the edges torch's truncating cast makes interesting: exact
    # integers, just-under/over values, the clamp boundaries
    x = np.concatenate([
        rng.uniform(-1.3, 1.3, (1, 8, 8, 3)),
        np.full((1, 8, 8, 3), -1.0),
        np.full((1, 8, 8, 3), 1.0),
        np.round(rng.uniform(0, 255, (1, 8, 8, 3))) / 127.5 - 1.0,
    ]).astype(np.float32)
    cfg = dataclasses.replace(TINY.sampler, output_dtype="uint8")
    ours = np.asarray(jax.jit(lambda a: _finalize_output(a, cfg))(x))
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, _torch_to_u8(x))


def test_float32_output_unchanged():
    x = jnp.linspace(-1, 1, 48).reshape(1, 4, 4, 3)
    out = _finalize_output(x, TINY.sampler)
    assert out is x  # identity, not a copy


def test_invalid_dtype_raises():
    cfg = dataclasses.replace(TINY.sampler, output_dtype="int8")
    with pytest.raises(ValueError, match="output_dtype"):
        _finalize_output(jnp.zeros((1, 4, 4, 3)), cfg)


def test_pipeline_uint8_matches_host_quantized_float32(pipeline):
    gt, mask = _sample_batch()
    key = jax.random.PRNGKey(3)
    f32 = np.asarray(pipeline.inpaint(gt, mask, key))
    u8_cfg = dataclasses.replace(TINY.sampler, output_dtype="uint8")
    u8 = np.asarray(pipeline.inpaint(gt, mask, key, sampler=u8_cfg))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, _torch_to_u8(f32))
    # known pixels: final_blend puts exact gt there, so the uint8 keep
    # region is exactly quantized gt
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(u8[keep], _torch_to_u8(gt)[keep])


def test_server_uint8_preset_round_trip(pipeline):
    u8_cfg = dataclasses.replace(TINY.sampler, output_dtype="uint8")
    server = InpaintingServer(pipeline, batch_size=2, max_wait_ms=5.0,
                              presets={"u8": u8_cfg})
    try:
        gt, mask = _sample_batch(n=1)
        fut = server.submit(gt[0], mask[0], seed=7)
        res = fut.result(timeout=300)
        assert res.dtype == np.uint8
        assert res.shape == (S, S, 3)
    finally:
        server.close()


def test_server_rejects_bad_output_dtype(pipeline):
    bad = dataclasses.replace(TINY.sampler, output_dtype="int8")
    with pytest.raises(ValueError, match="output_dtype"):
        InpaintingServer(pipeline, batch_size=2, presets={"bad": bad})


def test_http_uint8_response(pipeline):
    u8_cfg = dataclasses.replace(TINY.sampler, output_dtype="uint8")
    httpd, dispatcher = serve(pipeline, "127.0.0.1", 0, batch_size=2,
                              max_wait_ms=5.0, warmup=False,
                              presets={"u8": u8_cfg})
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        gt, mask = _sample_batch(n=1)
        buf = io.BytesIO()
        np.savez(buf, image=gt[0], mask=mask[0], seed=np.int64(5))
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=300) as r:
            reply = np.load(io.BytesIO(r.read()))
        assert reply["image"].dtype == np.uint8
        assert int(reply["seed"]) == 5
    finally:
        httpd.shutdown()
        dispatcher.close()


def test_server_student_grid_velocity_preset_round_trip(pipeline):
    """The cli.serve student path end-to-end: a preset with an explicit
    timestep grid + velocity parameterization (what a progressive-
    distillation student serves with) dispatches and resolves."""
    from fidm_tpu.diffusion import ModelMeanType

    cfg = dataclasses.replace(
        TINY.sampler, num_steps=None, timesteps=(40, 25, 10),
        mean_type=ModelMeanType.VELOCITY, output_dtype="uint8")
    server = InpaintingServer(pipeline, batch_size=2, max_wait_ms=5.0,
                              presets={"pd": cfg})
    try:
        gt, mask = _sample_batch(n=1)
        res = server.submit(gt[0], mask[0], seed=3).result(timeout=300)
        assert res.dtype == np.uint8 and res.shape == (S, S, 3)
    finally:
        server.close()
