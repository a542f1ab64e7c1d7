"""Pallas kernel correctness (interpreter mode on CPU) vs XLA fallbacks."""
import jax
import jax.numpy as jnp
import numpy as np

from fidm_tpu.ops.attention import (
    _attention_pallas,
    _attention_reference,
    qkv_attention,
)
from fidm_tpu.ops.registry import set_use_pallas, use_pallas


def test_attention_reference_matches_naive():
    """The fallback reproduces the exact reference semantics: dual
    1/sqrt(sqrt(d)) scaling + fp32 softmax (nn.py:222-235)."""
    key = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(key, (3, 2, 2, 16, 8))
    out = _attention_reference(q, k, v)
    # naive float64 computation
    qn, kn, vn = (np.asarray(a, np.float64) for a in (q, k, v))
    scale = 1.0 / np.sqrt(np.sqrt(8))
    w = np.einsum("bhtd,bhsd->bhts", qn * scale, kn * scale)
    w = np.exp(w - w.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    expected = np.einsum("bhts,bhsd->bhtd", w, vn)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_attention_pallas_interpret_matches_fallback():
    key = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(key, (3, 2, 4, 64, 64), jnp.float32)
    ref = _attention_reference(q, k, v)
    pal = _attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_attention_pallas_interpret_bf16():
    key = jax.random.PRNGKey(2)
    q, k, v = jax.random.normal(key, (3, 1, 2, 64, 64)).astype(jnp.bfloat16)
    ref = _attention_reference(q, k, v)
    pal = _attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(pal, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_attention_pallas_grad_matches_reference():
    """The custom VJP (Pallas forward, einsum backward) must produce the
    reference gradients — this is the path real-architecture training takes
    on TPU (head_dim 64); without it, value_and_grad through the kernel
    fails outright."""
    from fidm_tpu.ops.attention import _attention_pallas_diff

    key = jax.random.PRNGKey(3)
    q, k, v = jax.random.normal(key, (3, 2, 2, 16, 64), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 16, 64))

    def loss_pal(q, k, v):
        return jnp.sum(_attention_pallas_diff(q, k, v, True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_reference(q, k, v) * cot)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_registry_override():
    set_use_pallas(False)
    assert not use_pallas("attention")
    set_use_pallas(True, op="attention")
    assert use_pallas("attention")
    set_use_pallas(None, op="attention")
    set_use_pallas(None)
    # default on CPU: off
    if jax.default_backend() == "cpu":
        assert not use_pallas("attention")


def test_qkv_attention_dispatch_cpu_uses_fallback():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 64))
    out = qkv_attention(q, q, q)
    assert out.shape == q.shape


def test_long_sequence_dispatches_to_xla(monkeypatch):
    """Seq 4096 (the 64x64 attention level of a 1024^2 model) must NOT take
    the single-block Pallas kernel: its f32 score matrix alone is 64 MiB of
    scoped VMEM vs the 16 MiB hardware limit — a measured COMPILE-TIME
    failure on the chip (examples/resolution_1024.py). The dispatch
    estimates the footprint and falls back to the XLA path."""
    from fidm_tpu.ops import attention as A

    def boom(*a, **k):
        raise AssertionError("Pallas kernel taken for a VMEM-oversized seq")

    monkeypatch.setattr(A, "_attention_pallas_diff", boom)
    set_use_pallas(True, op="attention")  # force-enable even on CPU
    try:
        # smallest power-of-two shape over the budget (35.6 MiB estimated)
        # — the monkeypatch proves the dispatch branch; running the full
        # measured-OOM shape (4096) here would just burn ~seconds of
        # 1-core CPU einsum for no extra coverage.
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2048, 64),
                              jnp.bfloat16)
        out = qkv_attention(q, q, q)  # must ride _attention_reference
        assert out.shape == q.shape
        # the known-good anchor stays on the kernel: S=1024/D=64 is 9 MiB
        # (the 512^2 model's attention level, measured working on-chip);
        # 4096 is the measured on-chip compile-time OOM shape.
        from fidm_tpu.ops.attention import _kernel_vmem_bytes, _VMEM_BUDGET_BYTES

        assert _kernel_vmem_bytes(1024, 64) <= _VMEM_BUDGET_BYTES
        assert _kernel_vmem_bytes(2048, 64) > _VMEM_BUDGET_BYTES
        assert _kernel_vmem_bytes(4096, 64) > _VMEM_BUDGET_BYTES
    finally:
        set_use_pallas(None, op="attention")
