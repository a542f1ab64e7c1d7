"""Training stack tests: optimizer step, checkpoints, early stopping, LR,
and a tiny end-to-end train-then-sample smoke test."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.training import (
    CheckpointManager,
    EarlyStopping,
    TrainState,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)

CFG = UNetConfig(
    image_size=8, in_channels=9, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=1, num_head_channels=32, dtype=jnp.float32,
)
SCHED = DiffusionSchedule.create("linear", 20)


def _make_state(lr=1e-3):
    model = InpaintingUNet(CFG)
    S = CFG.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, S, S, 3)),
        jnp.ones((1, S, S, 1)),
    )
    tx = make_optimizer(optax.constant_schedule(lr))
    return model, TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def _batch(key, B=2):
    S = CFG.image_size
    img = jax.random.normal(key, (B, S, S, 3)) * 0.5
    mask = jnp.zeros((B, S, S, 1)).at[:, : S // 2].set(1.0)
    return {"image": img, "masked_image": img * (1 - mask), "mask": mask}


def test_train_step_decreases_loss():
    _, state = _make_state(1e-3)
    step = make_train_step(SCHED, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_train_metrics_contract():
    _, state = _make_state()
    step = make_train_step(SCHED, donate=False)
    _, metrics = step(state, _batch(jax.random.PRNGKey(1)), jax.random.PRNGKey(0))
    assert {"loss", "mse", "grad_norm", "mask_coverage"} <= set(metrics)
    assert 0.0 < float(metrics["mask_coverage"]) < 1.0


def test_eval_step_deterministic():
    _, state = _make_state()
    ev = make_eval_step(SCHED)
    batch = _batch(jax.random.PRNGKey(1))
    a = float(ev(state, batch, jax.random.PRNGKey(7))["loss"])
    b = float(ev(state, batch, jax.random.PRNGKey(7))["loss"])
    assert a == b


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    _, state = _make_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
    step = make_train_step(SCHED, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    val_losses = [0.5, 0.3, 0.4, 0.2]
    for i, vl in enumerate(val_losses):
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        is_best = mgr.save(i, state, metadata={"epoch": i}, val_loss=vl)
        assert is_best == (vl == min(val_losses[: i + 1]))
    # rotation keeps only last 2 numbered steps
    assert mgr.latest_step() == 3
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored, meta = mgr.restore("latest", abstract)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best corresponds to val_loss 0.2 (step 3 too) — restore works
    best, best_meta = mgr.restore("best", abstract)
    assert best is not None
    mgr.close()


def test_checkpoint_async_save_roundtrip(tmp_path):
    """async_save=True: save() returns before the commit; wait() flushes.
    Restored state matches, overwrite of a redone step keeps the crash-safe
    backup protocol (backup survives until the async commit is confirmed)."""
    _, state = _make_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=3,
                            async_save=True)
    step = make_train_step(SCHED, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    mgr.save(0, state, metadata={"epoch": 0}, val_loss=0.5)
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    mgr.save(1, state2, metadata={"epoch": 1}, val_loss=0.4)
    # redo step 1 (resumed-epoch overwrite) while a save may be in flight
    mgr.save(1, state2, metadata={"epoch": 1, "redone": True}, val_loss=0.4)
    mgr.wait()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state2
    )
    restored, meta = mgr.restore("latest", abstract)
    assert meta["redone"] is True
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no leftover overwrite backup after the flush
    assert not os.path.isdir(os.path.join(str(tmp_path / "ckpt"),
                                          "overwrite_backup"))
    mgr.close()

    # a fresh manager sees exactly the committed steps
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr2.latest_step() == 1
    assert mgr2.restore_metadata("latest")["epoch"] == 1
    mgr2.close()


def test_early_stopping_restores_best():
    es = EarlyStopping(patience=2, restore_best_weights=True)
    p1, p2 = {"w": jnp.ones(2)}, {"w": jnp.zeros(2)}
    stop, _ = es.update(1.0, p1)
    assert not stop
    stop, _ = es.update(1.5, p2)
    assert not stop
    stop, best = es.update(1.4, p2)
    assert stop
    np.testing.assert_array_equal(np.asarray(best["w"]), 1.0)


def test_lr_schedules():
    cos = make_lr_schedule("cosine", 1e-3, total_steps=100, warmup_steps=10)
    assert float(cos(0)) == pytest.approx(0.0)
    assert float(cos(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(cos(100)) == pytest.approx(1e-5, rel=0.2)
    step = make_lr_schedule("step", 1e-3, total_steps=90)
    assert float(step(0)) == pytest.approx(1e-3)
    assert float(step(40)) == pytest.approx(5e-4)
    assert float(step(70)) == pytest.approx(2.5e-4)
    none = make_lr_schedule("none", 1e-3, total_steps=10)
    assert float(none(5)) == pytest.approx(1e-3)
    # warmup longer than the run must clamp, not crash (optax requires
    # decay_steps > warmup_steps) — hit by short distill rounds
    short = make_lr_schedule("cosine", 1e-3, total_steps=3, warmup_steps=100)
    assert 0.0 <= float(short(1)) <= 1e-3


def test_train_then_sample_smoke():
    """SURVEY §4: tiny end-to-end train-then-sample closed loop."""
    from fidm_tpu.sampling import SamplerConfig, inpaint_sample

    model, state = _make_state(1e-3)
    step = make_train_step(SCHED, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0))

    def apply_fn(x, t, mi, m):
        return model.apply({"params": state.params}, x, t, mi, m)

    out = inpaint_sample(
        apply_fn, SCHED,
        SamplerConfig(method="ddim", num_steps=5, eta=0.0, injection=True),
        gt=batch["image"], mask=batch["mask"], key=jax.random.PRNGKey(9),
    )
    assert out.shape == batch["image"].shape
    assert np.all(np.isfinite(np.asarray(out)))
    keep = np.asarray(1 - batch["mask"])[..., 0] > 0.5
    np.testing.assert_array_equal(
        np.asarray(out)[keep], np.asarray(batch["image"])[keep]
    )


def test_ema_tracking():
    from fidm_tpu.training import init_ema

    _, state = _make_state(1e-2)
    state = state.replace(ema_params=init_ema(state.params))
    step = make_train_step(SCHED, donate=False, ema_decay=0.5)
    batch = _batch(jax.random.PRNGKey(1))
    s0_params = state.params
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0))
    # EMA lags params but has moved away from init
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    i = jax.tree_util.tree_leaves(s0_params)[0]
    assert not np.allclose(np.asarray(e), np.asarray(i))
    assert not np.allclose(np.asarray(e), np.asarray(p))


def test_loss_scale_dynamics():
    from fidm_tpu.training.precision import (
        init_loss_scale,
        scale_loss,
        unscale_grads,
    )

    st = init_loss_scale(initial=8.0, growth_interval=2)
    assert float(scale_loss(st, jnp.asarray(2.0))) == 16.0
    grads = {"w": jnp.ones(3) * 8.0}
    st, g, finite = unscale_grads(st, grads)
    assert bool(finite)
    np.testing.assert_allclose(np.asarray(g["w"]), 1.0)
    # overflow halves the scale
    st2, _, finite2 = unscale_grads(st, {"w": jnp.array([jnp.inf, 1, 1])})
    assert not bool(finite2)
    assert float(st2.scale) == 4.0
    # growth after N finite steps
    st3, _, _ = unscale_grads(st, grads)
    st3 = st3._replace(scale=st.scale)
    st4, _, _ = unscale_grads(st3._replace(growth_counter=jnp.asarray(1)), grads)
    assert float(st4.scale) == float(st.scale) * 2.0


def test_graceful_shutdown_flag_and_second_signal():
    import signal as _signal

    from fidm_tpu.training import GracefulShutdown

    with GracefulShutdown() as g:
        assert not g.requested
        os.kill(os.getpid(), _signal.SIGTERM)
        assert g.requested  # first signal: cooperative flag only
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), _signal.SIGTERM)  # second: hard stop
    # context exit restores the previous handlers
    assert _signal.getsignal(_signal.SIGTERM) is not g._handle


def test_fit_preemption_saves_and_exits(tmp_path):
    """SIGTERM mid-epoch: the in-flight step finishes, a checkpoint tagged
    preempted=True is written, and fit returns instead of training on."""
    import signal as _signal

    from fidm_tpu.training import FitConfig, fit, make_eval_step

    _, state = _make_state()
    step = make_train_step(SCHED, donate=False)
    calls = {"n": 0}

    def step_with_preempt(state, batch, key):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), _signal.SIGTERM)
        return step(state, batch, key)

    batches = [_batch(jax.random.PRNGKey(i)) for i in range(5)]
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state, history = fit(
        state, step_with_preempt, make_eval_step(SCHED),
        batches, batches[:1], jax.random.PRNGKey(0),
        FitConfig(num_epochs=3, log_fn=lambda *a: None),
        checkpoint_manager=mgr,
    )
    assert len(history) == 1 and history[0].get("preempted") is True
    assert calls["n"] == 2  # stopped right after the in-flight step
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    _, meta = mgr.restore("latest", abstract)
    assert meta["preempted"] is True
    # resume accounting: the interrupted epoch is NOT marked completed, so
    # `--resume latest` (start_epoch = meta["epoch"] + 1) redoes it
    assert meta["epoch"] == -1 and meta["interrupted_epoch"] == 0
    mgr.close()


def test_restore_params_prefer_ema(tmp_path):
    _, state = _make_state()
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    state = state.replace(ema_params=ema)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state, metadata={})
    got_ema = mgr.restore_params("latest", prefer_ema=True)
    got_raw = mgr.restore_params("latest", prefer_ema=False)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got_ema)[0]),
        np.asarray(jax.tree_util.tree_leaves(ema)[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got_raw)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    mgr.close()


def test_restore_params_prefer_ema_falls_back_without_ema(tmp_path):
    _, state = _make_state()
    mgr = CheckpointManager(str(tmp_path / "ck2"))
    mgr.save(0, state, metadata={})
    got = mgr.restore_params("latest", prefer_ema=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    mgr.close()


def test_gradient_accumulation_matches_manual_average():
    """accum_steps=2 must equal averaging the two microbatch gradients
    (computed with the same per-microbatch keys) and applying ONE update."""
    from fidm_tpu.training.train_state import _loss_for_batch

    _, state = _make_state(1e-3)
    batch = _batch(jax.random.PRNGKey(1), B=4)
    key = jax.random.PRNGKey(5)

    step2 = make_train_step(SCHED, donate=False, accum_steps=2)
    new_state, metrics = step2(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))

    # manual reference
    stepkey = jax.random.fold_in(key, state.step)
    keys = jax.random.split(stepkey, 2)
    halves = [
        {k: v[:2] for k, v in batch.items()},
        {k: v[2:] for k, v in batch.items()},
    ]

    from fidm_tpu.diffusion import LossType, ModelMeanType, ModelVarType

    def loss_fn(params, mb, k):
        return _loss_for_batch(
            params, state.apply_fn, SCHED, mb, k,
            loss_type=LossType.MSE, var_type=ModelVarType.LEARNED_RANGE,
            mean_type=ModelMeanType.EPSILON,
            use_injection=True, injection_schedule="all", vb_weight=0.0,
        )[0]

    g0 = jax.grad(loss_fn)(state.params, halves[0], keys[0])
    g1 = jax.grad(loss_fn)(state.params, halves[1], keys[1])
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    manual = state.apply_gradients(grads=grads)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(manual.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_gradient_accumulation_trains_and_validates_divisibility():
    _, state = _make_state(1e-3)
    step = make_train_step(SCHED, donate=False, accum_steps=2)
    batch = _batch(jax.random.PRNGKey(1), B=4)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    with pytest.raises(AssertionError, match="not divisible"):
        step(state, _batch(jax.random.PRNGKey(2), B=3), jax.random.PRNGKey(0))


def test_preemption_resume_roundtrip(tmp_path):
    """Full preempt -> resume -> finish cycle: the redone epoch re-saves at
    the same step id (orbax would raise StepAlreadyExists without the
    overwrite handling in CheckpointManager.save)."""
    import signal as _signal

    from fidm_tpu.training import FitConfig, fit, make_eval_step

    _, state = _make_state()
    step = make_train_step(SCHED, donate=False)
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(3)]
    mgr = CheckpointManager(str(tmp_path / "ck"))

    calls = {"n": 0}

    def step_with_preempt(state, batch, key):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), _signal.SIGTERM)
        return step(state, batch, key)

    state1, _ = fit(state, step_with_preempt, make_eval_step(SCHED),
                    batches, batches[:1], jax.random.PRNGKey(0),
                    FitConfig(num_epochs=2, log_fn=lambda *a: None),
                    checkpoint_manager=mgr)

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state1
    )
    restored, meta = mgr.restore("latest", abstract)
    start_epoch = meta["epoch"] + 1  # cli/train.py resume convention
    assert start_epoch == 0  # the interrupted epoch is redone

    # resumed run: same epoch numbering, completes and re-saves step 0
    # (and step 1) without StepAlreadyExists
    state2, history = fit(restored, step, make_eval_step(SCHED),
                          batches, batches[:1], jax.random.PRNGKey(0),
                          FitConfig(num_epochs=2, log_fn=lambda *a: None),
                          checkpoint_manager=mgr, start_epoch=start_epoch)
    assert [h["epoch"] for h in history] == [0, 1]
    assert mgr.latest_step() == 1
    mgr.close()


def test_use_labels_false_ignores_label_key():
    """An unconditional model trained from a label-bearing loader works
    with use_labels=False (and fails with a clear error without it)."""
    _, state = _make_state()
    batch = _batch(jax.random.PRNGKey(1))
    batch["label"] = jnp.zeros((2,), jnp.int32)

    step = make_train_step(SCHED, donate=False, use_labels=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    with pytest.raises(ValueError, match="num_classes"):
        make_train_step(SCHED, donate=False)(state, batch,
                                             jax.random.PRNGKey(0))


def test_overwrite_interrupted_recovery(tmp_path):
    """A crash between the backup-rename and the new save must not lose the
    step: the next CheckpointManager construction rolls the backup back."""
    _, state = _make_state()
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, keep_last_n=3)
    mgr.save(0, state, metadata={"epoch": 0}, val_loss=1.0)
    # simulate: overwrite began (old step renamed aside) then the process died
    mgr._begin_overwrite(0)
    assert mgr.latest_step() is None
    mgr.close()
    mgr2 = CheckpointManager(d, keep_last_n=3)
    assert mgr2.latest_step() == 0
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, state
    )
    restored, meta = mgr2.restore("latest", abstract)
    assert meta["epoch"] == 0
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr2.close()


def test_overwrite_completed_discards_backup(tmp_path):
    """Normal redone-epoch overwrite: the second save at the same step wins
    and no backup directory is left behind."""
    _, state = _make_state()
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, keep_last_n=3)
    mgr.save(0, state, metadata={"epoch": 0})
    mgr.save(0, state, metadata={"epoch": 99})
    assert not os.path.isdir(mgr._backup_root())
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, state
    )
    _, meta = mgr.restore("latest", abstract)
    assert meta["epoch"] == 99
    mgr.close()


def test_ema_with_donated_step_runs():
    """init_ema must COPY the params: with the default donate=True step, an
    aliased EMA tree donates the same buffer twice and crashes on step 1
    (regression — the cli.train --ema_decay path)."""
    from fidm_tpu.training.ema import init_ema

    model, state = _make_state()
    state = state.replace(ema_params=init_ema(state.params))
    step = make_train_step(SCHED, ema_decay=0.5)  # donate=True default
    batch = _batch(jax.random.PRNGKey(1))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    # EMA actually tracked (differs from both init and live params)
    leaf = state.params["base"]["in_0_conv"]["kernel"]
    eleaf = state.ema_params["base"]["in_0_conv"]["kernel"]
    assert not np.allclose(np.asarray(leaf), np.asarray(eleaf))


def test_early_stopping_snapshot_survives_donation():
    """The best-weights snapshot must be a real copy: the donating train
    step deletes the live buffers next epoch (regression: restoring the
    snapshot raised 'Array has been deleted')."""
    from fidm_tpu.training.early_stopping import EarlyStopping

    model, state = _make_state()
    es = EarlyStopping(patience=1, restore_best_weights=True)
    es.update(1.0, state.params)
    # simulate the donation invalidating the live buffers
    step = make_train_step(SCHED)  # donate=True
    state, _ = step(state, _batch(jax.random.PRNGKey(1)),
                    jax.random.PRNGKey(2))
    stop, best = es.update(2.0, state.params)
    assert stop
    # every snapshot leaf is still readable
    for leaf in jax.tree_util.tree_leaves(best):
        np.asarray(leaf)


def test_param_mask_freezes_instead_of_gradient_ascent():
    """make_optimizer(param_mask=...): mask=False params get EXACTLY zero
    updates (optax.masked alone passes raw gradients through — gradient
    ascent on 'frozen' weights)."""
    params = {"frozen": jnp.ones(()), "trainable": jnp.ones(())}
    tx = make_optimizer(optax.constant_schedule(0.1),
                        param_mask={"frozen": False, "trainable": True})
    opt_state = tx.init(params)
    grads = {"frozen": jnp.asarray(0.5), "trainable": jnp.asarray(0.5)}
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    assert float(new["frozen"]) == 1.0
    assert float(new["trainable"]) != 1.0
    # callable masks follow the same contract
    tx2 = make_optimizer(optax.constant_schedule(0.1),
                         param_mask=lambda p: {"frozen": False,
                                               "trainable": True})
    u2, _ = tx2.update(grads, tx2.init(params), params)
    assert float(optax.apply_updates(params, u2)["frozen"]) == 1.0


def test_best_marker_carries_full_metadata(tmp_path):
    """best.json keeps the training metadata (mean_type etc.) — the
    rotating step that also holds it can be pruned, and cli.evaluate
    prefers 'best' when resolving the parameterization."""
    _, state = _make_state()
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, keep_last_n=1)
    mgr.save(0, state, metadata={"mean_type": "velocity", "epoch": 0},
             val_loss=1.0)
    meta = mgr.restore_metadata("best")
    assert meta["mean_type"] == "velocity"
    assert meta["val_loss"] == 1.0
    mgr.close()


def test_threaded_loader_identical_results():
    """FitConfig(threaded_loader=True) must change WHERE batches are decoded
    (a background thread), never WHAT trains: identical params and history
    vs the inline path on the same loaders/keys (round-3 verdict #6)."""
    from fidm_tpu.training import FitConfig, fit, make_eval_step

    batches = [_batch(jax.random.PRNGKey(i)) for i in range(4)]

    def run(threaded):
        _, state = _make_state()
        step = make_train_step(SCHED, donate=False)
        return fit(
            state, step, make_eval_step(SCHED), batches, batches[:1],
            jax.random.PRNGKey(0),
            FitConfig(num_epochs=2, log_fn=lambda *a: None,
                      handle_preemption=False, threaded_loader=threaded),
        )

    s0, h0 = run(False)
    s1, h1 = run(True)
    assert [(h["train_loss"], h["val_loss"]) for h in h0] == \
           [(h["train_loss"], h["val_loss"]) for h in h1]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s0.params, s1.params)
