"""Unit tests for the functional Gaussian-diffusion core.

Closed-form identities and float64-numpy cross-checks of
`fidm_tpu.diffusion.gaussian` against the reference math
(`gaussian_diffusion.py:159-319,241-265,540-614`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import (
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    apply_inpainting_injection,
    masked_mse,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    predict_xstart_from_xprev,
    q_posterior_mean_variance,
    q_sample,
    training_losses,
)
from fidm_tpu.diffusion import gaussian as gd

SCHED = DiffusionSchedule.create("linear", 100)


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def test_q_sample_interpolates_signal_and_noise():
    x0 = _rand(0, 4, 8, 8, 3)
    noise = _rand(1, 4, 8, 8, 3)
    t = jnp.array([0, 10, 50, 99])
    xt = q_sample(SCHED, x0, t, noise)
    acp = np.asarray(SCHED.alphas_cumprod)
    for b in range(4):
        expected = (
            np.sqrt(acp[int(t[b])]) * np.asarray(x0[b])
            + np.sqrt(1 - acp[int(t[b])]) * np.asarray(noise[b])
        )
        np.testing.assert_allclose(np.asarray(xt[b]), expected, rtol=1e-5, atol=1e-6)


def test_eps_xstart_roundtrip():
    """predict_xstart_from_eps inverts q_sample; eps prediction inverts back."""
    x0 = _rand(0, 2, 4, 4, 3)
    noise = _rand(1, 2, 4, 4, 3)
    t = jnp.array([3, 77])
    xt = q_sample(SCHED, x0, t, noise)
    x0_hat = predict_xstart_from_eps(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    eps_hat = predict_eps_from_xstart(SCHED, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-3)


def test_xprev_roundtrip():
    """predict_xstart_from_xprev inverts the posterior mean."""
    x0 = _rand(0, 2, 4, 4, 3)
    xt = _rand(1, 2, 4, 4, 3)
    t = jnp.array([5, 60])
    mean, _, _ = q_posterior_mean_variance(SCHED, x0, xt, t)
    x0_hat = predict_xstart_from_xprev(SCHED, xt, t, mean)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-3)


def test_posterior_at_t1_matches_closed_form():
    x0 = _rand(0, 1, 4, 4, 3)
    xt = _rand(1, 1, 4, 4, 3)
    t = jnp.array([1])
    mean, var, logvar = q_posterior_mean_variance(SCHED, x0, xt, t)
    betas = np.asarray(SCHED.betas)
    acp = np.asarray(SCHED.alphas_cumprod)
    c1 = betas[1] * np.sqrt(acp[0]) / (1 - acp[1])
    c2 = (1 - acp[0]) * np.sqrt(1 - betas[1]) / (1 - acp[1])
    np.testing.assert_allclose(
        np.asarray(mean), c1 * np.asarray(x0) + c2 * np.asarray(xt),
        rtol=1e-2, atol=1e-4,
    )
    np.testing.assert_allclose(np.exp(np.asarray(logvar)), np.asarray(var), rtol=1e-5)


def test_learned_range_interpolation_endpoints():
    """v=-1 -> posterior (min) log-var; v=+1 -> log(beta) (max)."""
    x = _rand(0, 2, 4, 4, 3)
    t = jnp.array([10, 20])
    for v, table in [(-1.0, SCHED.posterior_log_variance_clipped),
                     (1.0, SCHED.log_betas)]:
        model_out = jnp.concatenate([jnp.zeros_like(x), jnp.full_like(x, v)], axis=-1)
        out = p_mean_variance(
            SCHED, model_out, x, t,
            mean_type=ModelMeanType.EPSILON, var_type=ModelVarType.LEARNED_RANGE,
        )
        expected = np.asarray(table)[np.asarray(t)][:, None, None, None]
        np.testing.assert_allclose(
            np.asarray(out.log_variance), np.broadcast_to(expected, x.shape), rtol=1e-5
        )


def test_fixed_variance_modes():
    x = _rand(0, 1, 4, 4, 3)
    t = jnp.array([5])
    out_small = p_mean_variance(
        SCHED, jnp.zeros_like(x), x, t,
        mean_type=ModelMeanType.EPSILON, var_type=ModelVarType.FIXED_SMALL,
    )
    assert np.allclose(
        np.asarray(out_small.variance), np.asarray(SCHED.posterior_variance)[5]
    )
    out_large = p_mean_variance(
        SCHED, jnp.zeros_like(x), x, t,
        mean_type=ModelMeanType.EPSILON, var_type=ModelVarType.FIXED_LARGE,
    )
    assert np.allclose(np.asarray(out_large.variance), np.asarray(SCHED.betas)[5])


def test_p_mean_variance_eps_equals_posterior_of_predicted_x0():
    x = _rand(0, 2, 4, 4, 3)
    eps = _rand(1, 2, 4, 4, 3) * 0.1
    t = jnp.array([30, 70])
    model_out = jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)
    out = p_mean_variance(SCHED, model_out, x, t, clip_denoised=False)
    x0 = predict_xstart_from_eps(SCHED, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(SCHED, x0, x, t)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pred_xstart), np.asarray(x0), rtol=1e-5)


def test_clip_denoised():
    x = _rand(0, 1, 4, 4, 3) * 100.0
    t = jnp.array([99])
    model_out = jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)
    out = p_mean_variance(SCHED, model_out, x, t, clip_denoised=True)
    assert float(jnp.abs(out.pred_xstart).max()) <= 1.0


def test_injection_composites_known_region():
    key = jax.random.PRNGKey(42)
    x = _rand(0, 2, 8, 8, 3)
    gt = _rand(1, 2, 8, 8, 3)
    keep = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)
    t = jnp.array([50, 50])
    out = apply_inpainting_injection(SCHED, x, t, gt, keep, key)
    # hole region untouched
    np.testing.assert_allclose(
        np.asarray(out[:, 4:]), np.asarray(x[:, 4:]), rtol=1e-6
    )
    # known region replaced by q_sample(gt) with key-derived noise
    noise = jax.random.normal(key, gt.shape, gt.dtype)
    expected = q_sample(SCHED, gt, t, noise)
    np.testing.assert_allclose(
        np.asarray(out[:, :4]), np.asarray(expected[:, :4]), rtol=1e-5
    )
    # determinism: same key -> same output
    out2 = apply_inpainting_injection(SCHED, x, t, gt, keep, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_injection_schedule_gating():
    key = jax.random.PRNGKey(0)
    x = _rand(0, 2, 4, 4, 3)
    gt = _rand(1, 2, 4, 4, 3)
    keep = jnp.ones((2, 4, 4, 1))
    t_high = jnp.array([80, 80])
    t_low = jnp.array([10, 10])
    # "high" gate: injects only for t >= T//2
    hi = apply_inpainting_injection(SCHED, x, t_high, gt, keep, key,
                                    injection_schedule="high")
    assert not np.allclose(np.asarray(hi), np.asarray(x))
    lo = apply_inpainting_injection(SCHED, x, t_low, gt, keep, key,
                                    injection_schedule="high")
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(x))


def test_masked_mse_normalizes_by_area():
    pred = jnp.zeros((2, 4, 4, 3))
    target = jnp.ones((2, 4, 4, 3))
    # half the pixels masked -> per-pixel error 1, normalized loss 1
    mask = jnp.zeros((2, 4, 4, 1)).at[:, :2].set(1.0)
    loss = masked_mse(target, pred, mask)
    assert float(loss) == pytest.approx(1.0)
    # errors outside the mask are ignored
    pred2 = pred.at[:, 2:].set(100.0)
    assert float(masked_mse(target, pred2, mask)) == pytest.approx(1.0)
    # empty mask: area clamped to 1 -> loss 0 (no NaN)
    assert float(masked_mse(target, pred, jnp.zeros((2, 4, 4, 1)))) == 0.0


def test_training_losses_mse_matches_manual():
    """End-to-end loss vs a hand-rolled computation with a linear model."""
    key = jax.random.PRNGKey(7)
    x0 = _rand(3, 2, 8, 8, 3)
    mask = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)
    masked_image = x0 * (1 - mask)
    t = jnp.array([20, 60])

    def model_fn(x_t, tt, mi, m):
        out = 0.5 * x_t
        return jnp.concatenate([out, jnp.zeros_like(out)], axis=-1)

    terms = training_losses(
        SCHED, model_fn, x0, t, key,
        mask=mask, masked_image=masked_image, use_injection=False,
    )
    # manual recomputation with the same key-split convention
    noise_key, _ = jax.random.split(key)
    noise = jax.random.normal(noise_key, x0.shape, x0.dtype)
    x_t = q_sample(SCHED, x0, t, noise)
    expected = masked_mse(noise, 0.5 * x_t, mask)
    assert float(terms["loss"]) == pytest.approx(float(expected), rel=1e-6)


def test_training_losses_with_injection_changes_xt_not_target():
    key = jax.random.PRNGKey(9)
    x0 = _rand(3, 2, 8, 8, 3)
    mask = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)
    masked_image = x0 * (1 - mask)
    t = jnp.array([20, 60])
    seen = {}

    def model_fn(x_t, tt, mi, m):
        seen["x_t"] = x_t
        return jnp.concatenate([jnp.zeros_like(x_t)] * 2, axis=-1)

    training_losses(SCHED, model_fn, x0, t, key, mask=mask,
                    masked_image=masked_image, use_injection=True)
    xt_inj = seen["x_t"]
    training_losses(SCHED, model_fn, x0, t, key, mask=mask,
                    masked_image=masked_image, use_injection=False)
    xt_plain = seen["x_t"]
    # hole region identical, keep region re-noised from GT
    hole = np.asarray(mask[..., 0]) > 0.5
    np.testing.assert_allclose(
        np.asarray(xt_inj)[hole], np.asarray(xt_plain)[hole], rtol=1e-6
    )
    assert not np.allclose(np.asarray(xt_inj)[~hole], np.asarray(xt_plain)[~hole])


def test_rescaled_mse_scales_by_T():
    key = jax.random.PRNGKey(1)
    x0 = _rand(3, 1, 4, 4, 3)
    t = jnp.array([10])
    model_fn = lambda x_t, tt, mi, m: jnp.concatenate(
        [jnp.zeros_like(x_t)] * 2, axis=-1
    )
    plain = training_losses(SCHED, model_fn, x0, t, key, use_injection=False)
    scaled = training_losses(SCHED, model_fn, x0, t, key, use_injection=False,
                             loss_type=LossType.RESCALED_MSE)
    assert float(scaled["loss"]) == pytest.approx(
        float(plain["loss"]) * SCHED.num_timesteps, rel=1e-6
    )


def test_hybrid_vb_loss_finite_and_positive_weighting():
    key = jax.random.PRNGKey(2)
    x0 = jnp.clip(_rand(3, 2, 4, 4, 3), -1, 1)
    t = jnp.array([0, 50])
    model_fn = lambda x_t, tt, mi, m: jnp.concatenate(
        [jnp.zeros_like(x_t), jnp.zeros_like(x_t)], axis=-1
    )
    terms = training_losses(SCHED, model_fn, x0, t, key, use_injection=False,
                            vb_weight=0.001)
    assert np.isfinite(float(terms["loss"]))
    assert np.isfinite(float(terms["vb"]))
    assert float(terms["loss"]) > float(terms["mse"])


def test_normal_kl_zero_for_identical():
    kl = gd.normal_kl(jnp.ones(4), jnp.zeros(4), jnp.ones(4), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)


def test_discretized_gaussian_ll_is_probability_like():
    x = jnp.linspace(-1, 1, 11)
    ll = gd.discretized_gaussian_log_likelihood(
        x, means=jnp.zeros(11), log_scales=jnp.zeros(11)
    )
    assert np.all(np.asarray(ll) < 0)  # log-probs
    assert np.all(np.isfinite(np.asarray(ll)))


def test_training_losses_xprev_target_is_posterior_mean():
    """PREVIOUS_X models train against the true posterior mean
    (`gaussian_diffusion.py:584-588`)."""
    key = jax.random.PRNGKey(3)
    x0 = _rand(5, 2, 8, 8, 3)
    mask = jnp.ones((2, 8, 8, 1))
    t = jnp.array([20, 60])
    seen = {}

    def model_fn(x_t, tt, mi, m):
        seen["x_t"] = x_t
        out = 0.25 * x_t
        return jnp.concatenate([out, jnp.zeros_like(out)], axis=-1)

    terms = training_losses(
        SCHED, model_fn, x0, t, key, mask=mask, use_injection=False,
        mean_type=ModelMeanType.PREVIOUS_X,
    )
    target = q_posterior_mean_variance(SCHED, x0, seen["x_t"], t)[0]
    expected = masked_mse(target, 0.25 * seen["x_t"], mask)
    assert float(terms["loss"]) == pytest.approx(float(expected), rel=1e-6)


class TestSNRLossWeight:
    """min-SNR / P2 timestep loss weighting (losses.snr_loss_weight)."""

    def test_min_snr_clamps_x0_space_weight(self):
        from fidm_tpu.diffusion import snr_loss_weight

        t = jnp.arange(0, 100, 7)
        snr = np.asarray(SCHED.alphas_cumprod / (1 - SCHED.alphas_cumprod))[
            np.asarray(t)]
        w = np.asarray(snr_loss_weight(SCHED, t, ModelMeanType.START_X,
                                       "min_snr", gamma=5.0))
        np.testing.assert_allclose(w, np.minimum(snr, 5.0), rtol=1e-6)
        # eps weight is the x0 weight divided by SNR; <= 1 everywhere
        w_eps = np.asarray(snr_loss_weight(SCHED, t, ModelMeanType.EPSILON,
                                           "min_snr", gamma=5.0))
        np.testing.assert_allclose(w_eps, np.minimum(snr, 5.0) / snr,
                                   rtol=1e-6)
        assert np.all(w_eps <= 1.0 + 1e-6)

    @pytest.mark.parametrize("kind", ["min_snr", "p2"])
    def test_weighting_is_parameterization_invariant(self, kind):
        """An eps-model and the x0-/v-models computing the SAME denoiser
        must receive the SAME weighted loss — the weights convert between
        the parameterizations' native MSE scales exactly."""
        key = jax.random.PRNGKey(7)
        x0 = _rand(11, 3, 8, 8, 3)
        mask = jnp.ones((3, 8, 8, 1))
        t = jnp.array([5, 40, 90])
        eps_hat = 0.3 * _rand(12, 3, 8, 8, 3)
        losses = {}
        seen = {}

        def run(mean_type, out_fn):
            def model_fn(x_t, tt, mi, m):
                seen["x_t"] = x_t
                return out_fn(x_t, tt)

            return float(training_losses(
                SCHED, model_fn, x0, t, key, mask=mask, use_injection=False,
                var_type=ModelVarType.FIXED_SMALL, mean_type=mean_type,
                loss_weight=kind,
            )["loss"])

        losses["eps"] = run(ModelMeanType.EPSILON, lambda x_t, tt: eps_hat)
        losses["x0"] = run(
            ModelMeanType.START_X,
            lambda x_t, tt: predict_xstart_from_eps(SCHED, x_t, tt, eps_hat))

        def v_from_eps(x_t, tt):
            x0_hat = predict_xstart_from_eps(SCHED, x_t, tt, eps_hat)
            return gd.velocity_from_eps_xstart(SCHED, tt, eps_hat, x0_hat)

        losses["v"] = run(ModelMeanType.VELOCITY, v_from_eps)
        assert losses["eps"] == pytest.approx(losses["x0"], rel=1e-4)
        assert losses["eps"] == pytest.approx(losses["v"], rel=1e-4)

    def test_unweighted_matches_none(self):
        from fidm_tpu.diffusion import snr_loss_weight

        t = jnp.array([3, 50])
        w = np.asarray(snr_loss_weight(SCHED, t, ModelMeanType.EPSILON,
                                       "none"))
        np.testing.assert_array_equal(w, np.ones(2, np.float32))

    def test_xprev_rejected(self):
        from fidm_tpu.diffusion import snr_loss_weight

        with pytest.raises(ValueError, match="xprev"):
            snr_loss_weight(SCHED, jnp.array([1]), ModelMeanType.PREVIOUS_X,
                            "min_snr")

    def test_train_step_runs_with_min_snr(self):
        """End-to-end: make_train_step(loss_weight=...) compiles and takes
        a finite step that differs from the unweighted loss."""
        import optax

        from fidm_tpu.models import InpaintingUNet, UNetConfig
        from fidm_tpu.training import (TrainState, make_optimizer,
                                       make_train_step)

        cfg = UNetConfig(image_size=8, in_channels=9, model_channels=32,
                         out_channels=6, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1,),
                         num_heads=1, num_head_channels=32,
                         dtype=jnp.float32)
        model = InpaintingUNet(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 8, 3)),
            jnp.ones((1, 8, 8, 1)))
        img = _rand(21, 2, 8, 8, 3) * 0.5
        mask = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)
        batch = {"image": img, "masked_image": img * (1 - mask),
                 "mask": mask}
        key = jax.random.PRNGKey(3)

        def step_loss(**kw):
            state = TrainState.create(
                apply_fn=model.apply, params=variables["params"],
                tx=make_optimizer(optax.constant_schedule(1e-3)))
            step = make_train_step(SCHED, donate=False, **kw)
            new_state, m = step(state, batch, key)
            assert np.isfinite(float(m["loss"]))
            return float(m["loss"])

        plain = step_loss()
        weighted = step_loss(loss_weight="min_snr", loss_weight_gamma=5.0)
        assert weighted != plain
