"""Calibration-based weight quantization (activation-aware scale search).

Completes the PTQ story the reference gestures at
(`scripts/quantize_model.py:96-117` builds a 128-sample calibration loader
for the external PTQ4DM package): instead of absmax scales, per-output-
channel scales are fit on REAL activation statistics so the quantization
error lands where the network is least sensitive.

Method (AWQ/MSE-clipping style, weight-only — int8 *compute* stays
rejected: measured 0.68x bf16 on this XLA build, BENCH.md):

1. `collect_input_moments` runs calibration batches through the model with
   a flax method interceptor and records, for every `nn.Conv`/`nn.Dense`,
   the mean square of each INPUT channel (a diagonal proxy of the layer
   Hessian X^T X — exact for rank-1-diagonal sensitivity, cheap always).
2. `quantize_tensor_calibrated` grid-searches a clipping factor alpha per
   output channel: scale_c = alpha * absmax_c / 127, minimizing the
   activation-weighted weight error sum_i h_i (W_ic - dequant(W)_ic)^2.
   alpha=1 (plain absmax) is in the grid, so the calibrated objective is
   never worse than absmax; clipping large outliers (alpha < 1) trades
   their error for finer resolution everywhere else, which the h-weighting
   accepts exactly when the outlier rows carry little activation energy.
3. `quantize_params_calibrated` walks the param tree like
   `quantize_params`; kernels without captured moments (e.g. unvisited
   branches) fall back to h = 1, i.e. unweighted-MSE-optimal clipping —
   still at least as good as absmax on that objective.

Storage format is identical to `int8.quantize_params`
({"q": int8, "scale": f32} leaves), so `dequantize_params`, the npz
round-trip in `cli.quantize`, and the evaluate-time auto-detection all work
unchanged. Measured end-to-end effect: tests/test_quant_calibration.py
asserts calibrated < absmax output error on a randomized UNet;
examples/quant_calibration.py measures the hole-PSNR deltas on the toy
model (table in BENCH.md).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = [
    "collect_input_moments",
    "quantize_tensor_calibrated",
    "quantize_params_calibrated",
    "DEFAULT_GRID",
]

# clipping-factor search grid; 1.0 (= absmax) always included
DEFAULT_GRID = tuple(np.round(np.linspace(0.4, 1.0, 25), 4))


def collect_input_moments(model, variables, batches) -> Dict[Tuple[str, ...], np.ndarray]:
    """Mean-square input-channel statistics per Conv/Dense module.

    Args:
      model: a flax Module (e.g. InpaintingUNet).
      batches: iterable of argument tuples for `model.apply(variables, *b)` —
        e.g. (x_t, t, masked_image, mask) drawn at random diffusion
        timesteps, the calibration protocol of the reference
        (`scripts/quantize_model.py:96-117`, 128 samples).

    Returns: {module_path_tuple: h} with h = E[x_i^2] per input channel
    (shape [cin]), averaged over batches, batch dim and spatial positions —
    module paths align with the param-tree nesting, so the kernel for path
    p lives at params[p[0]]...[p[-1]]["kernel"].
    """
    import flax.linen as nn

    sums: Dict[Tuple[str, ...], np.ndarray] = {}
    counts: Dict[Tuple[str, ...], int] = {}

    def interceptor(next_fn, args, kwargs, context):
        if (context.method_name == "__call__"
                and isinstance(context.module, (nn.Conv, nn.Dense))
                and args and hasattr(args[0], "ndim")):
            x = args[0]
            path = tuple(context.module.path)
            sq = np.asarray(
                jax.numpy.mean(
                    x.astype(jax.numpy.float32) ** 2,
                    axis=tuple(range(x.ndim - 1)),
                )
            )
            if path in sums:
                sums[path] = sums[path] + sq
                counts[path] += 1
            else:
                sums[path] = sq
                counts[path] = 1
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        for b in batches:
            model.apply(variables, *b)
    return {p: sums[p] / counts[p] for p in sums}


def quantize_tensor_calibrated(
    w, h: Optional[np.ndarray] = None, grid: Sequence[float] = DEFAULT_GRID
) -> Dict:
    """Per-output-channel int8 with activation-weighted clipping search.

    w: kernel [..., cin, cout] (conv HWIO or dense [cin, cout]).
    h: per-input-channel weights [cin] (None = unweighted MSE).
    Returns {"q": int8 like w, "scale": f32 [cout]} — same contract as
    int8.quantize_tensor.
    """
    w = np.asarray(w, np.float32)
    shape = w.shape
    cout = shape[-1]
    x2d = w.reshape(-1, cout)
    if h is not None:
        cin = shape[-2]
        if h.shape != (cin,):
            raise ValueError(f"h must be [{cin}], got {h.shape}")
        # rows are (*spatial, cin) flattened: every spatial tap of input
        # channel i carries the same activation energy h_i
        hrow = np.broadcast_to(
            np.asarray(h, np.float32), shape[:-1]
        ).reshape(-1, 1)
    else:
        hrow = np.ones((x2d.shape[0], 1), np.float32)

    absmax = np.maximum(np.abs(x2d).max(axis=0, keepdims=True), 1e-8)
    best_err = None
    best_q = None
    best_scale = None
    for alpha in grid:
        scale = absmax * (float(alpha) / 127.0)
        q = np.clip(np.round(x2d / scale), -127, 127)
        err = (hrow * (x2d - q * scale) ** 2).sum(axis=0)  # [cout]
        if best_err is None:
            best_err = err
            best_q = q
            best_scale = np.broadcast_to(scale, (1, cout)).copy()
        else:
            better = err < best_err
            best_err = np.where(better, err, best_err)
            best_q = np.where(better[None, :], q, best_q)
            best_scale = np.where(better[None, :], scale, best_scale)
    return {
        "q": best_q.astype(np.int8).reshape(shape),
        "scale": best_scale[0].astype(np.float32),
    }


def quantize_params_calibrated(
    params,
    moments: Optional[Dict[Tuple[str, ...], np.ndarray]] = None,
    min_size: int = 4096,
    grid: Sequence[float] = DEFAULT_GRID,
):
    """Calibrated drop-in for `int8.quantize_params` (same output tree).

    moments: output of `collect_input_moments`; kernels whose module path
    has no entry (or whose cin doesn't match, e.g. feature-grouped convs)
    use unweighted-MSE clipping.
    """
    moments = moments or {}

    def walk(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            elif k == "kernel" and v.ndim >= 2 and v.size >= min_size:
                h = moments.get(prefix)
                if h is not None and h.shape != (v.shape[-2],):
                    h = None
                out[k] = quantize_tensor_calibrated(v, h, grid)
            else:
                out[k] = v
        return out

    return walk(params)
