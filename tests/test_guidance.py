"""Classifier-guidance function tests (reference parity for
condition_mean/condition_score, gaussian_diffusion.py:326-355)."""
import jax
import jax.numpy as jnp
import numpy as np

from fidm_tpu.diffusion import (
    DiffusionSchedule,
    condition_mean,
    condition_score,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
)

SCHED = DiffusionSchedule.create("linear", 100)


def _pmv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3)) * 0.1
    t = jnp.array([10, 60])
    out = jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)
    return p_mean_variance(SCHED, out, x, t, clip_denoised=False), x, t


def test_condition_mean_shifts_by_variance_times_grad():
    pmv, x, t = _pmv()
    grad = jnp.ones_like(x) * 0.5
    out = condition_mean(pmv, grad)
    np.testing.assert_allclose(
        np.asarray(out.mean), np.asarray(pmv.mean + pmv.variance * 0.5),
        rtol=1e-6,
    )
    # zero grad is identity
    np.testing.assert_array_equal(
        np.asarray(condition_mean(pmv, jnp.zeros_like(x)).mean),
        np.asarray(pmv.mean),
    )


def test_condition_score_manual_recomputation():
    pmv, x, t = _pmv()
    grad = jnp.full_like(x, 0.3)
    out = condition_score(SCHED, pmv, x, t, grad)
    # manual: eps' = eps - sqrt(1-acp)*grad; x0' from eps'; mean' posterior
    acp = jnp.take(SCHED.alphas_cumprod, t).reshape(-1, 1, 1, 1)
    eps = predict_eps_from_xstart(SCHED, x, t, pmv.pred_xstart)
    eps2 = eps - jnp.sqrt(1 - acp) * grad
    x0 = predict_xstart_from_eps(SCHED, x, t, eps2)
    mean, _, _ = q_posterior_mean_variance(SCHED, x0, x, t)
    np.testing.assert_allclose(np.asarray(out.pred_xstart), np.asarray(x0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(mean),
                               rtol=1e-5, atol=1e-6)
    # variance untouched
    np.testing.assert_array_equal(np.asarray(out.variance),
                                  np.asarray(pmv.variance))


# ------------------------------------------- classifier-FREE guidance (ours)

def test_classifier_free_scale_limits():
    """scale=1 -> conditional model; scale=0 -> unconditional model; the
    learned-variance channels always come from the conditional branch."""
    from fidm_tpu.sampling import classifier_free

    NULL = 5

    def apply_fn(x, t, mi, m, y):
        # eps depends on the label; var channel marks conditionality
        eps = x[..., :3] * (1.0 + y[:, None, None, None])
        var = jnp.full_like(eps, -1.0) * (y != NULL)[:, None, None, None]
        return jnp.concatenate([eps, var], axis=-1)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    t = jnp.array([3, 7])
    mi = jnp.zeros_like(x)
    m = jnp.ones(x.shape[:-1] + (1,))
    y = jnp.array([1, 2])

    cond = apply_fn(x, t, mi, m, y)
    uncond = apply_fn(x, t, mi, m, jnp.full_like(y, NULL))

    w1 = classifier_free(apply_fn, y=y, null_label=NULL, scale=1.0)(x, t, mi, m)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(cond), atol=1e-6)

    w0 = classifier_free(apply_fn, y=y, null_label=NULL, scale=0.0)(x, t, mi, m)
    np.testing.assert_allclose(np.asarray(w0[..., :3]),
                               np.asarray(uncond[..., :3]), atol=1e-6)
    # var channels from the conditional branch even at scale 0
    np.testing.assert_allclose(np.asarray(w0[..., 3:]),
                               np.asarray(cond[..., 3:]), atol=1e-6)

    w3 = classifier_free(apply_fn, y=y, null_label=NULL, scale=3.0)(x, t, mi, m)
    expected = uncond[..., :3] + 3.0 * (cond[..., :3] - uncond[..., :3])
    np.testing.assert_allclose(np.asarray(w3[..., :3]), np.asarray(expected),
                               atol=1e-5)


def test_classifier_free_with_class_conditional_unet_in_sampler():
    """End to end: a tiny class-conditional InpaintingUNet sampled through
    inpaint_sample with the CFG wrapper — jits, finite, known pixels kept."""
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.sampling import SamplerConfig, classifier_free, inpaint_sample

    C = 3  # real classes; embedding has C+1 rows, index C = null token
    cfg = UNetConfig(image_size=8, in_channels=9, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, num_classes=C + 1,
                     dtype=jnp.float32)
    model = InpaintingUNet(cfg)
    B = 2
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 3)) * 0.4,
                  -1, 1)
    mask = jnp.zeros((B, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    y = jnp.array([0, 2])
    variables = model.init(jax.random.PRNGKey(1), gt, jnp.zeros((B,), jnp.int32),
                           gt, mask, y)

    apply = classifier_free(
        lambda x, t, mi, m, yy: model.apply(variables, x, t, mi, m, yy),
        y=y, null_label=C, scale=2.5)

    scfg = SamplerConfig(method="ddim", num_steps=6, eta=0.0, injection=True)

    @jax.jit
    def run(key):
        return inpaint_sample(apply, DiffusionSchedule.create("linear", 50),
                              scfg, gt=gt, mask=mask, key=key)

    out = np.asarray(run(jax.random.PRNGKey(2)))
    keep = np.asarray(mask)[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], np.asarray(gt)[keep])
    assert np.isfinite(out).all()


def test_drop_labels():
    from fidm_tpu.sampling import drop_labels

    y = jnp.arange(1000) % 7
    k = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(np.asarray(drop_labels(k, y, 0.0, 99)),
                                  np.asarray(y))
    assert (np.asarray(drop_labels(k, y, 1.0, 99)) == 99).all()
    d = np.asarray(drop_labels(k, y, 0.1, 99))
    frac = (d == 99).mean()
    assert 0.05 < frac < 0.2
    np.testing.assert_array_equal(d, np.asarray(drop_labels(k, y, 0.1, 99)))


def test_train_step_with_labels_and_dropout():
    """make_train_step passes batch['label'] and applies CFG dropout."""
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step
    from fidm_tpu.training.lr import make_lr_schedule

    C = 4
    cfg = UNetConfig(image_size=8, in_channels=9, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, num_classes=C + 1,
                     dtype=jnp.float32)
    model = InpaintingUNet(cfg)
    B = 2
    img = jnp.zeros((B, 8, 8, 3))
    mask = jnp.ones((B, 8, 8, 1))
    y = jnp.array([1, 3])
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.zeros((B,), jnp.int32), img, mask, y)
    state = TrainState.create(
        apply_fn=lambda v, *a: model.apply(v, *a),
        params=variables["params"],
        tx=make_optimizer(make_lr_schedule("cosine", 1e-4, 10, 2)),
    )
    step = make_train_step(DiffusionSchedule.create("linear", 50),
                           label_dropout=0.5, null_label=C)
    batch = {"image": img, "masked_image": img * (1 - mask), "mask": mask,
             "label": y}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_labeled_training_through_fit_and_mesh():
    """Regression (code-review findings): labeled batches must survive the
    fit() loader path (which previously stripped 'label') and the
    mesh-sharded train step (whose in_shardings previously hardcoded the
    3 unlabeled keys)."""
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.parallel import create_mesh
    from fidm_tpu.training import (
        FitConfig,
        TrainState,
        fit,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from fidm_tpu.training.lr import make_lr_schedule

    C = 4
    cfg = UNetConfig(image_size=8, in_channels=9, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, num_classes=C + 1,
                     dtype=jnp.float32)
    model = InpaintingUNet(cfg)
    B = 8
    img = jnp.zeros((B, 8, 8, 3))
    mask = jnp.ones((B, 8, 8, 1))
    y = jnp.arange(B) % C
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.zeros((B,), jnp.int32), img, mask, y)

    def make_state():
        return TrainState.create(
            apply_fn=lambda v, *a: model.apply(v, *a),
            params=variables["params"],
            tx=make_optimizer(make_lr_schedule("cosine", 1e-4, 10, 2)),
        )

    batch = {"image": img, "masked_image": img * (1 - mask), "mask": mask,
             "label": y}
    sched = DiffusionSchedule.create("linear", 20)

    # 1. through fit(): the loader path must pass 'label' along
    step = make_train_step(sched, donate=False, label_dropout=0.25,
                           null_label=C)
    _, history = fit(make_state(), step, make_eval_step(sched),
                     [batch, batch], [batch], jax.random.PRNGKey(0),
                     FitConfig(num_epochs=1, log_fn=lambda *a: None,
                               handle_preemption=False))
    assert np.isfinite(history[0]["train_loss"])
    assert np.isfinite(history[0]["val_loss"])

    # 2. mesh-sharded step with a labeled batch
    mesh = create_mesh()
    with mesh:
        mstep = make_train_step(sched, mesh=mesh, donate=False,
                                label_dropout=0.25, null_label=C)
        state, metrics = mstep(make_state(), batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        meval = make_eval_step(sched, mesh=mesh)
        assert np.isfinite(float(meval(state, batch,
                                       jax.random.PRNGKey(2))["loss"]))


# ------------------------------------ classifier guidance IN the sampler scan

def test_guided_ddim_trajectory_parity_with_torch():
    """Full guided-DDIM trajectory vs the reference library: `cond_fn`
    consumed by `ddim_sample_loop` via `condition_score`
    (gaussian_diffusion.py:339-355,447-485). Deterministic (eta=0), same
    init noise, dummy linear model — final samples must match (VERDICT r1
    #4: the hook, not just the pure functions)."""
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/code")
    from gaussian_diffusion import GaussianDiffusion
    from losses import LossType, ModelMeanType, ModelVarType

    from fidm_tpu.diffusion.schedules import get_named_beta_schedule
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.sampling import sample as jx_sample

    T = 20
    B, S = 2, 4
    betas = get_named_beta_schedule("linear", T)
    ref = GaussianDiffusion(betas=betas, model_mean_type=ModelMeanType.EPSILON,
                            model_var_type=ModelVarType.LEARNED_RANGE,
                            loss_type=LossType.MSE)

    target = 0.7

    def t_model(x, t, **kw):
        eps = 0.2 * x
        return torch.cat([eps, torch.zeros_like(eps)], dim=1)

    def t_cond(x, t, **kw):
        return 0.05 * (target - x) * (t.float() + 1.0).view(-1, 1, 1, 1) / T

    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    out_ref = ref.ddim_sample_loop(
        t_model, (B, 3, S, S), noise=torch.from_numpy(x_init),
        clip_denoised=True, cond_fn=t_cond, eta=0.0, progress=False,
        device=torch.device("cpu"), model_kwargs={},
    ).numpy().transpose(0, 2, 3, 1)

    def j_model(x, t):
        eps = 0.2 * x
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    def j_cond(x, t):
        return 0.05 * (target - x) * (
            (t.astype(jnp.float32) + 1.0)[:, None, None, None]) / T

    sched = DiffusionSchedule.create("linear", T)
    cfg = SamplerConfig(method="ddim", num_steps=None, eta=0.0,
                        injection=False)
    out_j = np.asarray(jx_sample(
        j_model, sched, cfg, shape=(B, S, S, 3), key=jax.random.PRNGKey(0),
        x_init=jnp.asarray(x_init.transpose(0, 2, 3, 1)), cond_fn=j_cond))
    np.testing.assert_allclose(out_j, out_ref, atol=1e-4, rtol=1e-4)


def test_guided_ddpm_pulls_samples_toward_target():
    """condition_mean in the scan: guidance toward a constant target must
    move the sample mean toward it (and jit cleanly)."""
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.sampling import sample as jx_sample

    sched = DiffusionSchedule.create("linear", 50)
    cfg = SamplerConfig(method="ddpm", num_steps=25, injection=False)

    def model(x, t):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

    target = 0.8

    def cond(x, t):
        return 4.0 * (target - x)

    @jax.jit
    def run_plain(key):
        return jx_sample(model, sched, cfg, shape=(8, 4, 4, 3), key=key)

    @jax.jit
    def run_guided(key):
        return jx_sample(model, sched, cfg, shape=(8, 4, 4, 3), key=key,
                         cond_fn=cond)

    plain = float(np.mean(np.asarray(run_plain(jax.random.PRNGKey(3)))))
    guided = float(np.mean(np.asarray(run_guided(jax.random.PRNGKey(3)))))
    assert abs(guided - target) < abs(plain - target)
    assert guided > plain + 0.2


def test_guided_inpaint_preserves_known_pixels():
    """cond_fn composes with injection/blending in inpaint_sample."""
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.sampling import SamplerConfig, inpaint_sample

    cfg = UNetConfig(image_size=8, in_channels=9, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, dtype=jnp.float32)
    model = InpaintingUNet(cfg)
    B = 2
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 3)) * 0.4,
                  -1, 1)
    mask = jnp.zeros((B, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    variables = model.init(jax.random.PRNGKey(1), gt,
                           jnp.zeros((B,), jnp.int32), gt, mask)

    def cond(x, t):
        return 0.5 * (0.3 - x)

    for method in ("ddpm", "ddim", "repaint"):
        scfg = SamplerConfig(method=method, num_steps=6, injection=True,
                             jump_length=2, jump_n_sample=2)
        out = np.asarray(inpaint_sample(
            lambda x, t, mi, m: model.apply(variables, x, t, mi, m),
            DiffusionSchedule.create("linear", 50), scfg,
            gt=gt, mask=mask, key=jax.random.PRNGKey(2), cond_fn=cond))
        keep = np.asarray(mask)[..., 0] < 0.5
        np.testing.assert_array_equal(out[keep], np.asarray(gt)[keep])
        assert np.isfinite(out).all()


def test_guided_dpm_solver_raises():
    import pytest

    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.sampling import sample as jx_sample

    sched = DiffusionSchedule.create("linear", 50)
    with pytest.raises(ValueError, match="cond_fn"):
        jx_sample(lambda x, t: x, sched,
                  SamplerConfig(method="dpm++2m", num_steps=10),
                  shape=(1, 4, 4, 3), key=jax.random.PRNGKey(0),
                  cond_fn=lambda x, t: x)
