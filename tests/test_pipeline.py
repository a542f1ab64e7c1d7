"""Pipeline facade tests: presets, config parity, jit caching, mesh mode."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.models import UNetConfig
from fidm_tpu.pipeline import (
    SAMPLER_PRESETS,
    InpaintingPipeline,
    PipelineConfig,
    create_model_and_schedule,
)

TINY = PipelineConfig(
    unet=UNetConfig(
        image_size=16, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, dtype=jnp.float32,
    ),
    schedule="quadratic", num_timesteps=50,
    sampler=SAMPLER_PRESETS["ddim-30"],
)


def test_presets_match_reference_eval_defaults():
    """The six forked test scripts' defaults (SURVEY.md §2)."""
    assert SAMPLER_PRESETS["ddpm-1000"].method == "ddpm"
    assert SAMPLER_PRESETS["ddim-100"].num_steps == 100
    assert SAMPLER_PRESETS["ddim-100"].eta == 0.9
    assert SAMPLER_PRESETS["ddim-30"].num_steps == 30
    assert SAMPLER_PRESETS["ddim-50-eta0.75"].eta == 0.75
    assert all(p.injection for p in SAMPLER_PRESETS.values())


def test_canonical_config_matches_reference_factory():
    """train_inpainting.py:208-255 hyperparameters."""
    cfg = PipelineConfig()
    assert cfg.schedule == "quadratic" and cfg.num_timesteps == 1000
    u = cfg.unet
    assert (u.image_size, u.model_channels, u.out_channels) == (256, 128, 6)
    assert u.channel_mult == (1, 1, 2, 2, 4, 4)
    assert u.attention_resolutions == (16,)
    assert u.num_heads == 4 and u.num_head_channels == 64
    assert u.use_scale_shift_norm and u.resblock_updown
    assert u.in_channels == 9


def test_pipeline_inpaint_and_jit_cache():
    pipe = InpaintingPipeline.create(TINY)
    gt = jnp.zeros((2, 16, 16, 3))
    mask = jnp.ones((2, 16, 16, 1))
    out = pipe.inpaint(gt, mask, jax.random.PRNGKey(0))
    assert out.shape == (2, 16, 16, 3)
    assert len(pipe._jitted) == 1
    # same shape+cfg hits the cache; new sampler adds an entry
    pipe.inpaint(gt, mask, jax.random.PRNGKey(1))
    assert len(pipe._jitted) == 1
    pipe.inpaint(gt, mask, jax.random.PRNGKey(1),
                 sampler=dataclasses.replace(TINY.sampler, num_steps=5))
    assert len(pipe._jitted) == 2


def test_pipeline_rejects_bad_mask():
    pipe = InpaintingPipeline.create(TINY)
    gt = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="mask must be"):
        pipe.inpaint(gt, jnp.ones((1, 16, 16, 3)), jax.random.PRNGKey(0))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pipeline_mesh_sharded_sampling():
    from fidm_tpu.parallel import create_mesh

    mesh = create_mesh()
    pipe = InpaintingPipeline.create(TINY, mesh=mesh)
    gt = jnp.zeros((8, 16, 16, 3))
    mask = jnp.ones((8, 16, 16, 1))
    out = pipe.inpaint(gt, mask, jax.random.PRNGKey(0))
    assert out.shape == (8, 16, 16, 3)
    # output sharded over the batch axis
    assert len(out.addressable_shards) == 8


def test_rescale_timesteps():
    """Model sees t scaled to [0,1000) when enabled
    (gaussian_diffusion.py:321-324)."""
    import numpy as np

    seen = []

    cfg = dataclasses.replace(TINY, num_timesteps=50, rescale_timesteps=True,
                              sampler=dataclasses.replace(TINY.sampler,
                                                          num_steps=5))
    pipe = InpaintingPipeline.create(cfg)
    orig_apply = pipe.model.apply

    def spy_apply(variables, x, t, mi, m):
        seen.append(t)
        return orig_apply(variables, x, t, mi, m)

    pipe.model = type(pipe.model)(pipe.model.config)
    pipe.model.apply = spy_apply  # type: ignore[method-assign]
    gt = jnp.zeros((1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 1))
    with jax.disable_jit():
        pipe.inpaint(gt, mask, jax.random.PRNGKey(0))
    ts = [float(np.asarray(t)[0]) for t in seen]
    # T=50 -> scale 20: all fed timesteps are multiples of 20 in [0, 1000)
    assert all(t % 20.0 == 0 and t < 1000 for t in ts), ts
    assert max(ts) > 900  # first step near T-1 scaled up


def test_ddim20_fast_preset():
    from fidm_tpu.pipeline import SAMPLER_PRESETS

    p = SAMPLER_PRESETS["ddim-20-fast"]
    assert p.method == "ddim" and p.num_steps == 20
    assert p.encoder_cache_period == 2


def test_pipeline_inpaint_cond_fn():
    """Classifier guidance through the pipeline convenience layer: guided
    result differs from unguided, known pixels still exact, and the jit
    cache keys on the cond_fn identity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fidm_tpu.models import UNetConfig
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    cfg = PipelineConfig(
        unet=UNetConfig(image_size=16, in_channels=9, model_channels=32,
                        out_channels=6, num_res_blocks=1,
                        attention_resolutions=(), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16,
                        dtype=jnp.float32),
        schedule="linear", num_timesteps=50,
        sampler=SamplerConfig(method="ddim", num_steps=5, eta=0.0),
    )
    pipe = InpaintingPipeline.create(cfg)
    rng = np.random.default_rng(0)
    gt = np.clip(rng.standard_normal((2, 16, 16, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    mask = np.zeros((2, 16, 16, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0

    def cond(x, t):
        return 2.0 * (0.5 - x)

    plain = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(0)))
    guided = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(0),
                                     cond_fn=cond))
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(guided[keep], gt[keep])
    assert not np.array_equal(plain, guided)
    assert len(pipe._jitted) == 2  # separate compiled program per cond_fn


def test_pipeline_cond_fn_cache_bounded():
    """Guided programs are evicted beyond 4 cond_fn identities (each fresh
    closure is a full recompile; long-lived processes must not grow
    without bound)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fidm_tpu.models import UNetConfig
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    cfg = PipelineConfig(
        unet=UNetConfig(image_size=8, in_channels=9, model_channels=32,
                        out_channels=6, num_res_blocks=1,
                        attention_resolutions=(), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16,
                        dtype=jnp.float32),
        schedule="linear", num_timesteps=20,
        sampler=SamplerConfig(method="ddim", num_steps=2, eta=0.0),
    )
    pipe = InpaintingPipeline.create(cfg)
    gt = np.zeros((1, 8, 8, 3), np.float32)
    mask = np.ones((1, 8, 8, 1), np.float32)
    pipe.inpaint(gt, mask, jax.random.PRNGKey(0))  # unguided entry
    fns = [lambda x, t, s=s: s * x for s in range(6)]
    for fn in fns:
        pipe.inpaint(gt, mask, jax.random.PRNGKey(0), cond_fn=fn)
    guided = [k for k in pipe._jitted if k[2] is not None]
    assert len(guided) == 4  # bounded
    assert len(pipe._jitted) == 5  # unguided program untouched
    # each surviving entry pins its cond_fn: the cache key uses id(cond_fn),
    # and without a live reference a GC'd closure's id could be recycled by
    # a NEW closure, silently dispatching to the wrong compiled guidance
    for k in guided:
        _, pinned = pipe._jitted[k]
        assert pinned is not None and id(pinned) == k[2]
