"""Classifier guidance end-to-end: a REAL trained classifier steers sampling.

The reference ships `condition_mean`/`condition_score` but no classifier to
drive them (`gaussian_diffusion.py:326-355`); round 2 wired the `cond_fn`
hook into our sampler scans with trajectory-level parity tests. This
experiment closes the loop the way Dhariwal & Nichol (2021) do: train an
unconditional diffusion model AND a small noise-aware classifier p(y|x_t,t)
on a labeled toy distribution, then guide generation toward a chosen class
with cond_fn = s * grad_x log p(y|x_t) and measure class adherence vs the
guidance scale.

Toy: 16x16 images whose BACKGROUND is one of 8 palette colors (the class)
with one square patch of a different palette color. Unguided samples hit a
target class ~1/8 of the time; guidance should drive that toward 1.

Run (TPU, ~10 min): python examples/toy_classifier_guidance.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from toy_distillation_uncond import _PALETTE, CFG, S, synth_batch

from fidm_tpu.diffusion import DiffusionSchedule, q_sample
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.sampling import sample as uncond_sample
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

T = 200
DIFF_STEPS = 1000
CLS_STEPS = 800
BATCH = 128
N_EVAL = 256


def labels_for(images) -> jnp.ndarray:
    """Class = background palette index (corner pixels are background)."""
    corner = images[:, 0, 0, :]  # [B,3]
    d = jnp.abs(corner[:, None, :] - jnp.asarray(_PALETTE)[None]).sum(-1)
    return jnp.argmin(d, axis=-1)


class NoisyClassifier(nn.Module):
    """Small timestep-conditioned convnet: p(y | x_t, t)."""

    num_classes: int = 8

    @nn.compact
    def __call__(self, x, t):
        from fidm_tpu.models.layers import timestep_embedding

        emb = nn.Dense(64)(timestep_embedding(t, 32))
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=1)(x)
        h = nn.silu(h + nn.Dense(32)(nn.silu(emb))[:, None, None, :])
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1)(h)
        h = nn.silu(h + nn.Dense(64)(nn.silu(emb))[:, None, None, :])
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(nn.silu(nn.Dense(64)(h)))


def main():
    key = jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)

    # ---- 1. unconditional diffusion model (full-hole conditioning) ----
    model = InpaintingUNet(CFG)
    b0 = synth_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(make_lr_schedule("cosine", 3e-4, DIFF_STEPS, 50)),
    )
    step = make_train_step(sched)
    t0 = time.time()
    for i in range(DIFF_STEPS):
        state, m = step(state, synth_batch(jax.random.fold_in(key, i), BATCH),
                        jax.random.PRNGKey(1))
    print(f"diffusion model: loss={float(m['loss']):.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    diff_params = state.params

    # ---- 2. noise-aware classifier on q-sampled images ----
    clf = NoisyClassifier()
    cvars = clf.init(key, b0["image"], jnp.zeros((1,), jnp.int32))
    import optax

    cstate = TrainState.create(
        apply_fn=clf.apply, params=cvars["params"],
        tx=make_optimizer(make_lr_schedule("cosine", 1e-3, CLS_STEPS, 30),
                          weight_decay=0.0),
    )

    @jax.jit
    def cls_step(cstate, images, y, k):
        kt, kn = jax.random.split(k)
        t = jax.random.randint(kt, (images.shape[0],), 0, T)
        x_t = q_sample(sched, images, t,
                       jax.random.normal(kn, images.shape))

        def loss_fn(p):
            logits = clf.apply({"params": p}, x_t, t)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits

        (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(
            cstate.params)
        acc = (logits.argmax(-1) == y).mean()
        return cstate.apply_gradients(grads=g), loss, acc

    t0 = time.time()
    for i in range(CLS_STEPS):
        b = synth_batch(jax.random.fold_in(key, 50_000 + i), BATCH)
        y = labels_for(b["image"])
        cstate, closs, cacc = cls_step(cstate, b["image"], y,
                                       jax.random.fold_in(key, 90_000 + i))
    print(f"classifier: CE={float(closs):.3f} acc={float(cacc):.2%} "
          f"({time.time()-t0:.0f}s)", flush=True)
    cls_params = cstate.params

    # ---- 3. guided sampling: adherence vs scale ----
    zeros_mi = jnp.zeros((N_EVAL, S, S, 3))
    ones_m = jnp.ones((N_EVAL, S, S, 1))

    def apply_fn(x, t):
        return model.apply({"params": diff_params}, x, t, zeros_mi, ones_m)

    target = 3

    def make_cond(scale):
        def log_p(x, t):
            logits = clf.apply({"params": cls_params}, x, t)
            return jax.nn.log_softmax(logits)[:, target].sum()

        def cond(x, t):
            return scale * jax.grad(log_p)(x, t)

        return cond

    cfg = SamplerConfig(method="ddpm", num_steps=50, injection=False)

    print(f"target class {target}; unguided expectation ~{1/8:.1%}")
    adherence = {}
    for scale in (0.0, 1.0, 3.0, 10.0):
        out = uncond_sample(
            apply_fn, sched, cfg, shape=(N_EVAL, S, S, 3),
            key=jax.random.PRNGKey(42),
            cond_fn=make_cond(scale) if scale > 0 else None,
        )
        got = np.asarray(labels_for(jnp.clip(out, -1, 1)))
        adherence[scale] = float((got == target).mean())
        print(f"scale {scale:5.1f}: adherence {adherence[scale]:.1%}",
              flush=True)

    assert adherence[0.0] < 0.3, "unguided sampling should be ~uniform"
    assert adherence[10.0] > 3 * adherence[0.0], (
        "classifier guidance failed to steer generation")
    assert adherence[10.0] >= adherence[1.0]
    print("CLASSIFIER GUIDANCE OK")


if __name__ == "__main__":
    main()
