"""LoRA partition and int8 quantization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.lora import (
    init_lora,
    lora_param_count,
    merge_lora,
    select_lora_targets,
)
from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.quant import (
    dequantize_params,
    quantize_params,
    quantize_tensor,
    quantized_size_bytes,
)

CFG = UNetConfig(
    image_size=16, in_channels=9, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=2, num_head_channels=16, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = InpaintingUNet(CFG)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    mi = jnp.zeros((1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, t, mi, mask)
    return model, variables


def test_lora_targets_attention_kernels(model_and_params):
    _, variables = model_and_params
    targets = select_lora_targets(variables["params"])
    joined = ["/".join(t) for t in targets]
    assert any("qkv" in j for j in joined)
    assert any("proj" in j for j in joined)
    assert all(("_attn" in j or "mid_attn" in j) for j in joined)


def test_lora_zero_init_is_identity(model_and_params):
    model, variables = model_and_params
    lora = init_lora(jax.random.PRNGKey(1), variables["params"], rank=4)
    merged = merge_lora(variables["params"], lora)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    t = jnp.array([5])
    mi = jnp.zeros((1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 1))
    out0 = model.apply(variables, x, t, mi, mask)
    out1 = model.apply({"params": merged}, x, t, mi, mask)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_lora_gradients_flow_only_through_lora(model_and_params):
    model, variables = model_and_params
    # perturb ALL base params: the zero-init output conv would otherwise
    # block every upstream gradient at exact init
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    base = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    args = (x, jnp.array([5]), jnp.zeros((1, 16, 16, 3)),
            jnp.ones((1, 16, 16, 1)))

    def loss(l):
        out = model.apply({"params": merge_lora(base, l)}, *args)
        # target 1.0: at zero-init the output is exactly 0, so sum(out**2)
        # would have an identically-zero gradient
        return jnp.sum((out - 1.0) ** 2)

    g = jax.grad(loss)(lora)
    # b factors get nonzero grads (a @ db path)
    b_norms = [float(jnp.abs(v["b"]).sum()) for k, v in g.items()
               if k != "__meta__"]
    assert any(n > 0 for n in b_norms)
    assert lora_param_count(lora) > 0
    # lora params are a small fraction of the model
    total = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(base))
    assert lora_param_count(lora) < total * 0.2


def test_lora_training_reduces_loss(model_and_params):
    """A few LoRA-only AdamW steps reduce the masked-MSE loss."""
    import optax

    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step

    model, variables = model_and_params
    base = variables["params"]
    from fidm_tpu.lora import merge_lora as merge

    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    sched = DiffusionSchedule.create("linear", 50)
    tx = make_optimizer(optax.constant_schedule(1e-2))
    state = TrainState.create(apply_fn=model.apply, params=lora, tx=tx)
    step = make_train_step(sched, param_transform=lambda l: merge(base, l),
                           donate=False)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 0.5,
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "mask": jnp.ones((2, 16, 16, 1)),
    }
    losses = []
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_quantize_roundtrip_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q = quantize_tensor(x)
    assert q["q"].dtype == jnp.int8
    deq = np.asarray(q["q"].astype(jnp.float32) * q["scale"])
    err = np.abs(deq - np.asarray(x)).max()
    # max error bounded by scale/2 per channel
    assert err <= float(np.asarray(q["scale"]).max()) * 0.51 + 1e-8


def test_quantize_params_tree(model_and_params):
    _, variables = model_and_params
    params = variables["params"]
    qp = quantize_params(params, min_size=1024)
    deq = dequantize_params(qp)
    # structure preserved
    assert jax.tree_util.tree_structure(deq) == jax.tree_util.tree_structure(
        params
    )
    # memory shrinks meaningfully
    assert quantized_size_bytes(qp) < 0.55 * quantized_size_bytes(params)
    # dequantized values close to originals
    for a, b in zip(jax.tree_util.tree_leaves(deq),
                    jax.tree_util.tree_leaves(params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=0.05)


def test_quantized_model_output_close(model_and_params):
    model, variables = model_and_params
    qp = quantize_params(variables["params"], min_size=1024)
    deq = {"params": dequantize_params(qp)}
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    args = (x, jnp.array([5]), jnp.zeros((1, 16, 16, 3)),
            jnp.ones((1, 16, 16, 1)))
    out0 = np.asarray(model.apply(variables, *args))
    out1 = np.asarray(model.apply(deq, *args))
    assert np.abs(out0 - out1).max() < 0.15
