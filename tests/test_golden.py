"""Golden regression values for the full sampler stack.

Pins exact (CPU, f32-highest) outputs for fixed seeds so that future
refactors of the sampler/diffusion math are caught if they change numerics.
Regenerate via the snippet in the git history if an INTENTIONAL numeric
change lands.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.sampling import SamplerConfig, inpaint_sample

T = 50
SCHED = DiffusionSchedule.create("quadratic", T)

GOLDEN = {
    ("ddim", 10, 0.0): {
        "p033": [0.7832039, -0.27622342, -0.46720126],
        "p144": [0.42010722, -0.44214657, -0.33745742],
        "sum": -5.023078918457031,
    },
    ("ddim", 10, 0.9): {
        "p033": [0.93053305, -0.5440871, 0.766348],
        "p144": [-0.49987167, 0.6403979, 0.73408115],
        "sum": 10.436782836914062,
    },
    ("ddpm", None, 0.0): {
        "p033": [1.0, -0.6891673, 0.86063135],
        "p144": [0.66475534, 1.0, -1.0],
        "sum": 10.397727966308594,
    },
}


def _apply_fn(x, t, mi, m):
    eps = 0.2 * x + 0.1 * jnp.sin(t[:, None, None, None].astype(jnp.float32))
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="golden values are CPU-pinned")
@pytest.mark.parametrize("method,steps,eta", list(GOLDEN))
def test_sampler_golden(method, steps, eta):
    gt = jnp.asarray(
        np.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    )
    mask = jnp.zeros((2, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    cfg = SamplerConfig(method=method, num_steps=steps, eta=eta,
                        injection=True)
    out = np.asarray(
        inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(123))
    )
    g = GOLDEN[(method, steps, eta)]
    np.testing.assert_allclose(out[0, 3, 3], g["p033"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(out[1, 4, 4], g["p144"], rtol=2e-5, atol=2e-6)
    assert float(out.sum()) == pytest.approx(g["sum"], abs=2e-3)
