"""Spatial self-attention op with a Pallas-fused TPU kernel and an XLA fallback.

Computes the exact attention semantics of the reference `QKVAttention`
(`/root/reference/code/nn.py:215-235`): q and k are each pre-scaled by
1/sqrt(sqrt(head_dim)) (so the product carries the standard 1/sqrt(d) factor
split symmetrically), the softmax runs in float32 regardless of activation
dtype (`nn.py:233`), and the result is cast back to the input dtype.

Shapes are token-major NHWC-style: q, k, v are [B, H, S, D] (batch, heads,
sequence, head_dim). At the reference architecture's attention sites the
sequence is tiny (256 tokens at 16x16, 64 at 8x8), so the fused kernel keeps
the whole S x S score matrix in VMEM in one block per (batch, head). That
single-block design has a hard ceiling: `_kernel_vmem_bytes` estimates the
block's scoped-VMEM footprint (f32 q/k/v/o plus the two S x S f32
score/prob matrices — the quadratic term dominates) and `qkv_attention`
dispatches any sequence whose estimate exceeds `_VMEM_BUDGET_BYTES`
(12 MiB) to the XLA path, which tiles the softmax-matmul chain itself.
Under that estimator the effective kernel cutoff at D=64 is S <= 1184
(12.4 MiB; the next multiple of 8 estimates 12.6 MiB and is diverted).
Measured anchors: S=1024/D=64 (the 512^2 model's attention level,
9 MiB estimated) compiles and runs on the kernel; S=4096 (the 64x64 level
of a 1024^2 model, 132 MiB estimated — 128 MiB of that the two score
matrices) fails AT COMPILE TIME on the ~16 MiB Mosaic scoped-vmem limit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .registry import use_pallas

__all__ = ["qkv_attention"]


def _attention_reference(q, k, v):
    """XLA einsum fallback — exact reference semantics (`nn.py:222-235`)."""
    ch = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32))).astype(q.dtype)
    weight = jnp.einsum("bhtd,bhsd->bhts", q * scale, k * scale)
    weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", weight, v)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Fused attention for one (batch, head): whole sequence resident in VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32) * scale
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # numerically-stable fp32 softmax (reference casts scores to fp32, nn.py:233)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas(q, k, v, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, d = q.shape
    scale = float(d) ** -0.25
    kernel = functools.partial(_attention_kernel, scale=scale)

    grid = (b * h,)
    spec = pl.BlockSpec(
        (1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    qf = q.reshape(b * h, s, d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=interpret,
    )(qf, k.reshape(b * h, s, d), v.reshape(b * h, s, d))
    return out.reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_pallas_diff(q, k, v, interpret=False):
    """Pallas forward with an XLA backward (the kernel itself has no VJP).

    The backward differentiates the einsum reference — mathematically the
    same function — recomputing the forward; attention is ~0.2% of a UNet
    step here, so the recompute is free and training stays one jittable
    program with the fused kernel on the forward pass.
    """
    return _attention_pallas(q, k, v, interpret)


def _attention_diff_fwd(q, k, v, interpret):
    return _attention_pallas(q, k, v, interpret), (q, k, v)


def _attention_diff_bwd(interpret, res, g):
    del interpret
    q, k, v = res
    _, vjp = jax.vjp(_attention_reference, q, k, v)
    return vjp(g)


_attention_pallas_diff.defvjp(_attention_diff_fwd, _attention_diff_bwd)


# Scoped-VMEM budget for the single-block kernel. The hardware limit is
# 16 MiB (the Mosaic "scoped vmem" stack); 12 MiB leaves headroom for the
# compiler's own temporaries, giving an effective dispatch cutoff of
# S <= 1184 at D=64 (see module docstring). Measured anchors:
# S=1024/D=64 (the 512^2 model) estimates 9 MiB and compiles+runs;
# S=4096 estimates 132 MiB and is exactly the measured compile-time OOM
# (examples/resolution_1024.py).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel_vmem_bytes(s: int, d: int) -> int:
    """Estimated scoped-VMEM footprint of one (batch, head) kernel block:
    f32 copies of q/k/v/o ([S, D] each) plus the score and prob matrices
    ([S, S] f32 — the dominant term, quadratic in sequence length).

    This is a HEURISTIC, not Mosaic's real allocation: the BlockSpec stages
    inputs at their input dtype (often bf16) and the f32 casts / softmax
    intermediates (max, exp) are compiler temporaries the formula can only
    approximate. It is anchored to two measured points — S=1024 works,
    S=4096 OOMs at compile time — and deliberately conservative in
    between; re-validate the anchors before trusting it on new
    shape/dtype regimes."""
    return 4 * (4 * s * d + 2 * s * s)


def qkv_attention(q, k, v):
    """Multi-head attention over [B, H, S, D] tensors."""
    s, d = q.shape[-2], q.shape[-1]
    if (use_pallas("attention") and d % 64 == 0 and s % 8 == 0
            and _kernel_vmem_bytes(s, d) <= _VMEM_BUDGET_BYTES):
        return _attention_pallas_diff(q, k, v, False)
    return _attention_reference(q, k, v)
