"""Train state, optimizer, and the pjit-sharded train/eval steps.

TPU-native replacement for the reference per-batch hot loop
(`train_inpainting.py:15-79`): the whole
q_sample -> inject -> UNet forward -> masked-MSE -> backward -> clip ->
AdamW update sequence compiles into ONE XLA program, sharded over the
device mesh (batch on the "data" axis, gradients all-reduced over ICI by
XLA). The reference's per-step host syncs (`.to(device)` copies and
`loss.item()`, `train_inpainting.py:30-32,68`) do not exist here.

Optimizer parity: AdamW betas=(0.9, 0.999) + global-norm clip 1.0
(`train_inpainting.py:64,377-413`).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh

from ..diffusion import gaussian as gd
from ..diffusion.losses import training_losses
from ..diffusion.schedules import DiffusionSchedule
from ..parallel.mesh import batch_sharding, replicated

__all__ = ["TrainState", "make_optimizer", "make_train_step", "make_eval_step"]


class TrainState(train_state.TrainState):
    """Flax TrainState with optional EMA parameters.

    `apply_fn` is the InpaintingUNet apply. Set `ema_params` (via
    `training.ema.init_ema`) and pass `ema_decay` to `make_train_step` to
    maintain an exponential moving average for eval/checkpointing — a
    quality feature the reference training loop lacks.
    """

    ema_params: Any = None


def make_optimizer(
    lr_schedule,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    param_mask: Optional[Any] = None,
):
    """AdamW + global-norm clipping; optional trainable-param mask.

    `param_mask` (pytree of bools or callable params -> pytree) FREEZES the
    False entries: the optimizer runs only on the True subset and the rest
    get exactly zero updates. (Plain `optax.masked(tx, mask)` alone would
    pass raw gradients through for masked-out params — gradient ascent on
    the "frozen" weights.)"""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr_schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    if param_mask is not None:
        not_tree = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda b: not b, t)
        inverse = (
            (lambda params: not_tree(param_mask(params)))
            if callable(param_mask) else not_tree(param_mask)
        )
        tx = optax.chain(
            optax.masked(tx, param_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    return tx


def _loss_for_batch(
    params,
    apply_fn,
    sched: DiffusionSchedule,
    batch,
    key,
    *,
    loss_type,
    var_type,
    mean_type,
    use_injection,
    injection_schedule,
    vb_weight,
    loss_weight="none",
    loss_weight_gamma=None,
    label_dropout=0.0,
    null_label=None,
    use_labels=True,
):
    t_key, loss_key = jax.random.split(jax.random.fold_in(key, 0))
    B = batch["image"].shape[0]
    t = jax.random.randint(t_key, (B,), 0, sched.num_timesteps)

    # class-conditional training: pass batch labels through, optionally
    # dropping a fraction to the null token (classifier-free guidance);
    # use_labels=False ignores a label-bearing loader (unconditional model)
    y = batch.get("label") if use_labels else None
    if y is not None and label_dropout > 0.0:
        assert null_label is not None, "label_dropout requires null_label"
        from ..sampling.cfg import drop_labels

        y = drop_labels(jax.random.fold_in(key, 1), y, label_dropout,
                        null_label)

    def model_fn(x_t, tt, masked_image, mask):
        if y is not None:
            return apply_fn({"params": params}, x_t, tt, masked_image, mask, y)
        return apply_fn({"params": params}, x_t, tt, masked_image, mask)

    terms = training_losses(
        sched,
        model_fn,
        batch["image"],
        t,
        loss_key,
        mask=batch["mask"],
        masked_image=batch["masked_image"],
        loss_type=loss_type,
        var_type=var_type,
        mean_type=mean_type,
        use_injection=use_injection,
        injection_schedule=injection_schedule,
        vb_weight=vb_weight,
        loss_weight=loss_weight,
        loss_weight_gamma=loss_weight_gamma,
    )
    return terms["loss"], terms


def make_train_step(
    sched: DiffusionSchedule,
    *,
    loss_type=gd.LossType.MSE,
    var_type=gd.ModelVarType.LEARNED_RANGE,
    mean_type=gd.ModelMeanType.EPSILON,
    use_injection: bool = True,
    injection_schedule: str = "all",
    vb_weight: float = 0.0,
    loss_weight: str = "none",
    loss_weight_gamma=None,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    param_transform: Optional[Callable] = None,
    ema_decay: Optional[float] = None,
    label_dropout: float = 0.0,
    null_label: Optional[int] = None,
    use_labels: bool = True,
    accum_steps: int = 1,
    spatial: bool = False,
):
    """Build the jitted (optionally mesh-sharded) train step.

    If the batch contains a "label" array, it is passed to the model as `y`
    (class-conditional training); `label_dropout` > 0 replaces labels with
    `null_label` at that rate per step — classifier-free guidance training
    (sampling-side counterpart: `sampling.cfg.classifier_free`).
    `use_labels=False` ignores a label-bearing loader (for unconditional
    models whose datasets carry class metadata anyway).

    `accum_steps` > 1 enables gradient accumulation: the batch is split
    into that many microbatches along axis 0, gradients are averaged over
    a `lax.scan` of forward/backward passes, and ONE optimizer update is
    applied — activation memory scales with the microbatch, so effective
    batch sizes beyond HBM limits become possible (combine with
    `UNetConfig.remat` for the largest). Each microbatch draws its own
    timesteps/noise (distinct fold of the step key).

    Returns step(state, batch, key) -> (state, metrics). `batch` is a dict of
    NHWC arrays {image, masked_image, mask}. The per-step RNG is derived from
    (key, state.step) so a single base key drives a whole epoch
    deterministically.

    `param_transform` maps the trained pytree to the full model params before
    apply — e.g. `lambda lora: merge_lora(base_params, lora)` for LoRA, where
    `state.params` holds only the low-rank factors and the base stays frozen.

    `spatial=True` (needs `mesh` with a "model" axis) trains with the batch's
    image dims H-sharded over that axis — GSPMD spatial partitioning, the
    memory/latency layout for very large images where batch-parallel shards
    run out of HBM per sample. Pre-shard batches with
    `parallel.shard_batch(batch, mesh, spatial=True)`; the jitted step then
    respects that placement (XLA inserts the conv halo exchanges and their
    backward-pass transposes; GroupNorm/attention/loss reductions become
    cross-device collectives automatically). Gradients are parity-tested
    against the unsharded step (tests/test_tp.py). On real multi-chip TPU
    trace under `ops.registry.pallas_override(False, "attention")` — the
    Pallas kernel is an opaque custom call the SPMD partitioner can't split
    (same caveat as TP, parallel/tp.py).
    """
    assert accum_steps >= 1

    def step(state: TrainState, batch, key):
        key = jax.random.fold_in(key, state.step)

        def loss_fn(params, mb, k):
            if param_transform is not None:
                params = param_transform(params)
            return _loss_for_batch(
                params, state.apply_fn, sched, mb, k,
                loss_type=loss_type, var_type=var_type, mean_type=mean_type,
                use_injection=use_injection,
                injection_schedule=injection_schedule, vb_weight=vb_weight,
                loss_weight=loss_weight,
                loss_weight_gamma=loss_weight_gamma,
                label_dropout=label_dropout, null_label=null_label,
                use_labels=use_labels,
            )

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps == 1:
            (loss, terms), grads = grad_fn(state.params, batch, key)
        else:
            B = batch["image"].shape[0]
            assert B % accum_steps == 0, (
                f"batch {B} not divisible by accum_steps {accum_steps}"
            )
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, B // accum_steps)
                                    + x.shape[1:]),
                batch,
            )
            keys = jax.random.split(key, accum_steps)

            def accum_body(acc, xs):
                mb, k = xs
                (l, t), g = grad_fn(state.params, mb, k)
                acc_g, acc_l, acc_t = acc
                return (
                    jax.tree_util.tree_map(jnp.add, acc_g, g),
                    acc_l + l,
                    jax.tree_util.tree_map(jnp.add, acc_t, t),
                ), None

            # zero-init accumulators with the body's exact output structure
            # (eval_shape only traces, so the fwd/bwd compiles once, inside
            # the scan)
            (lt_shape, g_shape) = jax.eval_shape(
                grad_fn, state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro), keys[0],
            )
            zeros = lambda tree: jax.tree_util.tree_map(  # noqa: E731
                lambda sd: jnp.zeros(sd.shape, sd.dtype), tree
            )
            (grads, loss, terms), _ = jax.lax.scan(
                accum_body,
                (zeros(g_shape), zeros(lt_shape[0]), zeros(lt_shape[1])),
                (micro, keys),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            terms = jax.tree_util.tree_map(lambda t: t * inv, terms)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        if ema_decay is not None and state.ema_params is not None:
            from .ema import update_ema

            new_state = new_state.replace(
                ema_params=update_ema(state.ema_params, new_state.params,
                                      ema_decay)
            )
        metrics = {
            "loss": loss,
            "mse": terms.get("mse", loss),
            "grad_norm": grad_norm,
            # fraction of pixels being inpainted (tqdm "coverage" stat,
            # train_inpainting.py:34-38)
            "mask_coverage": batch["mask"].mean(),
        }
        if "vb" in terms:
            metrics["vb"] = terms["vb"]
        return new_state, metrics

    if mesh is None:
        if spatial:
            raise ValueError("spatial=True requires a mesh")
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    if spatial and mesh.shape.get("model", 1) <= 1:
        raise ValueError(
            f"spatial=True needs a 'model' mesh axis > 1; mesh is "
            f"{dict(mesh.shape)}")

    # State keeps whatever placement the caller gave it (replicated, or
    # fsdp-sharded via parallel.shard_params); only the batch is re-sharded.
    # A single sharding acts as a pytree prefix for the whole batch dict, so
    # any batch keys (incl. rank-1 "label") shard along axis 0. In spatial
    # mode the batch keeps the caller's placement (image leaves H-sharded,
    # low-rank leaves batch-sharded — shard_batch(spatial=True) builds it;
    # a single prefix spec can't express the per-rank split).
    return jax.jit(
        step,
        in_shardings=(None, None if spatial else batch_sharding(mesh),
                      replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    sched: DiffusionSchedule,
    *,
    loss_type=gd.LossType.MSE,
    var_type=gd.ModelVarType.LEARNED_RANGE,
    mean_type=gd.ModelMeanType.EPSILON,
    use_injection: bool = True,
    injection_schedule: str = "all",
    vb_weight: float = 0.0,
    loss_weight: str = "none",
    loss_weight_gamma=None,
    mesh: Optional[Mesh] = None,
    param_transform: Optional[Callable] = None,
    use_labels: bool = True,
):
    """Validation loss step (`train_inpainting.py:82-131`), jitted."""

    def step(state: TrainState, batch, key):
        params = state.params
        if param_transform is not None:
            params = param_transform(params)
        loss, terms = _loss_for_batch(
            params, state.apply_fn, sched, batch, key,
            loss_type=loss_type, var_type=var_type, mean_type=mean_type,
            use_injection=use_injection,
            injection_schedule=injection_schedule, vb_weight=vb_weight,
            loss_weight=loss_weight, loss_weight_gamma=loss_weight_gamma,
            use_labels=use_labels,
        )
        return {"loss": loss, "mse": terms.get("mse", loss)}

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step, in_shardings=(None, batch_sharding(mesh), replicated(mesh))
    )
