"""Weight-only int8 quantization for inference.

TPU-native replacement for the reference's CPU dynamic quantization
(`test_quant.py:108-158`: `torch.quantization.quantize_dynamic` over
Conv2d/Linear with device-shuttling) and the external PTQ4DM path
(`scripts/quantize_model.py`). Here kernels are quantized per-output-channel
to int8 symmetric (absmax scaling), halving+ parameter HBM footprint; they
dequantize on the fly at apply time, which XLA fuses into the consuming
conv/matmul — no host round-trips, no separate quantized module classes.

A Pallas stochastic-rounding quantizer is used on TPU for the quantize step
itself (reduces bias vs round-to-nearest); the XLA fallback rounds to
nearest.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.registry import use_pallas

__all__ = ["quantize_params", "dequantize_params", "quantized_size_bytes",
           "quantize_tensor", "dequantize_tensor"]


def _quantize_pallas(x2d: jnp.ndarray, seed: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-column (output-channel) int8 quantization with stochastic rounding."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, x_ref, values_ref, scales_ref):
        pltpu.prng_seed(seed_ref[0])
        x = x_ref[:]
        absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        scales_ref[:] = scale
        scaled = x / scale
        # stochastic rounding to integer: floor(x + u), u ~ U[0,1) from the
        # hardware PRNG (pltpu.stochastic_round only targets float dtypes)
        bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        # >>8 keeps 24 bits, so the int32 view is value-preserving; Mosaic
        # lowers int32->f32 but NOT uint32->f32 (measured on the real chip —
        # the CPU interpreter accepts both, so only a TPU run catches this)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 24))
        q = jnp.floor(scaled + u)
        values_ref[:] = jnp.clip(q, -127, 127).astype(jnp.int8)

    n, c = x2d.shape
    values, scales = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.int8),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray([seed], jnp.int32), x2d.astype(jnp.float32))
    return values, scales


def quantize_tensor(x: jnp.ndarray, seed: int = 0) -> Dict:
    """Quantize a kernel to int8 with per-output-channel (last axis) scales."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1]).astype(jnp.float32)
    if use_pallas("quantize") and x2d.shape[0] % 8 == 0 and x2d.shape[1] % 128 == 0:
        values, scales = _quantize_pallas(x2d, seed)
    else:
        absmax = jnp.max(jnp.abs(x2d), axis=0, keepdims=True)
        scales = jnp.maximum(absmax, 1e-8) / 127.0
        values = jnp.clip(jnp.round(x2d / scales), -127, 127).astype(jnp.int8)
    return {"q": values.reshape(shape), "scale": scales[0]}


def dequantize_tensor(q: Dict, dtype=jnp.float32) -> jnp.ndarray:
    return (q["q"].astype(jnp.float32) * q["scale"]).astype(dtype)


def _is_quantizable(path: Tuple[str, ...], leaf, min_size: int) -> bool:
    return path[-1] == "kernel" and leaf.ndim >= 2 and leaf.size >= min_size


def quantize_params(params, min_size: int = 4096, seed: int = 0):
    """Quantize all large kernels in a param tree; biases/norms stay f32.

    Returns a tree where quantized leaves become {"q": int8, "scale": f32}
    dicts; use `dequantize_params` before apply (XLA fuses the dequant
    multiply into the consuming op).
    """
    counter = [0]

    def q_walk(tree, prefix=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = prefix + (k,)
                if isinstance(v, dict):
                    out[k] = q_walk(v, p)
                elif _is_quantizable(p, v, min_size):
                    counter[0] += 1
                    out[k] = quantize_tensor(v, seed=seed + counter[0])
                else:
                    out[k] = v
            return out
        return tree

    return q_walk(params)


def dequantize_params(qparams, dtype=jnp.float32):
    def walk(tree):
        if isinstance(tree, dict):
            if set(tree.keys()) == {"q", "scale"}:
                return dequantize_tensor(tree, dtype)
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(qparams)


def quantized_size_bytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += leaf.size * leaf.dtype.itemsize
    return total
