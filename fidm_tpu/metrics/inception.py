"""FID InceptionV3 (pool3, 2048-d) natively in JAX, with torch-weight import.

The reference computes FID by shelling out to `pytorch_fid`, whose metric is
defined by a *specific* network: the TF-ported "FID Inception" — torchvision
InceptionV3 topology with `count_include_pad=False` average pools inside the
mixed blocks and a max-pool branch in Mixed_7c, evaluated on inputs resized
bilinearly to 299x299 and scaled to [-1,1]
(`/root/reference/code/test_inpainting_better.py:151-223` calls
`pytorch_fid.calculate_fid_given_paths` with dims=2048 = the pool3 tap).

This module is that exact network as a pure JAX function over a params
pytree. Weights import from the standard `pt_inception-2015-12-05` torch
state dict (torchvision-style keys) when supplied locally by the user — this
environment has no network egress, so no pretrained default ships.
BatchNorm (inference mode, eps=1e-3) is folded into the conv weights at
conversion time, so the forward is conv+bias+relu chains that XLA maps
straight onto the MXU.

Parity with a vendored torch oracle of the same architecture is tested in
`tests/test_metric_oracles.py` (oracle: tests/oracle_fid_inception.py;
random weights, <=1e-4).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_torch_inception_weights",
    "inception_pool3",
    "preprocess",
    "InceptionFeatureExtractor",
]

_BN_EPS = 1e-3

# (module, stride, padding) for the stem convs
_STEM = [
    ("Conv2d_1a_3x3", 2, 0),
    ("Conv2d_2a_3x3", 1, 0),
    ("Conv2d_2b_3x3", 1, 1),
    # maxpool 3x3/2 here
    ("Conv2d_3b_1x1", 1, 0),
    ("Conv2d_4a_3x3", 1, 0),
    # maxpool 3x3/2 here
]

# submodule names per mixed-block type (for the converter)
_BLOCK_SUBS = {
    "a": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "b": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "d": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "e": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"],
}

_MIXED = [
    ("Mixed_5b", "a"), ("Mixed_5c", "a"), ("Mixed_5d", "a"),
    ("Mixed_6a", "b"),
    ("Mixed_6b", "c"), ("Mixed_6c", "c"), ("Mixed_6d", "c"),
    ("Mixed_6e", "c"),
    ("Mixed_7a", "d"),
    ("Mixed_7b", "e"), ("Mixed_7c", "e"),
]


def _fold_bn(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """One BasicConv2d (conv no-bias + BN eval) -> folded conv kernel+bias."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float64)  # OIHW
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float64)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float64)
    scale = gamma / np.sqrt(var + _BN_EPS)
    kernel = (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)  # HWIO
    bias = beta - mean * scale
    return {"kernel": kernel.astype(np.float32),
            "bias": bias.astype(np.float32)}


def convert_torch_inception_weights(state_dict: Dict) -> Dict:
    """Torch state dict (torchvision inception / `pt_inception-2015-12-05`
    key layout) -> folded params pytree. `fc.*` / `AuxLogits.*` are ignored
    (the pool3 features never reach them)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params: Dict = {}
    for name, _, _ in _STEM:
        params[name] = _fold_bn(sd, name)
    for name, kind in _MIXED:
        params[name] = {sub: _fold_bn(sd, f"{name}.{sub}")
                        for sub in _BLOCK_SUBS[kind]}
    return params


# --------------------------------------------------------------- forward ops

def _conv(p, x, stride=1, padding=0):
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]), (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(p["bias"]))


def _max_pool(x, stride=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def _avg_pool3_no_pad_count(x):
    """3x3/1 pad-1 average pool with count_include_pad=False — the defining
    quirk of the FID Inception's mixed-block pool branches."""
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pads)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), pads)
    return s / cnt


def _inception_a(p, x):
    b1 = _conv(p["branch1x1"], x)
    b5 = _conv(p["branch5x5_2"], _conv(p["branch5x5_1"], x), padding=2)
    b3 = _conv(p["branch3x3dbl_3"],
               _conv(p["branch3x3dbl_2"], _conv(p["branch3x3dbl_1"], x),
                     padding=1), padding=1)
    bp = _conv(p["branch_pool"], _avg_pool3_no_pad_count(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv(p["branch3x3"], x, stride=2)
    bd = _conv(p["branch3x3dbl_3"],
               _conv(p["branch3x3dbl_2"], _conv(p["branch3x3dbl_1"], x),
                     padding=1), stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(p, x):
    b1 = _conv(p["branch1x1"], x)
    b7 = _conv(p["branch7x7_1"], x)
    b7 = _conv(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _conv(p["branch7x7dbl_1"], x)
    bd = _conv(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv(p["branch_pool"], _avg_pool3_no_pad_count(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv(p["branch3x3_2"], _conv(p["branch3x3_1"], x), stride=2)
    b7 = _conv(p["branch7x7x3_1"], x)
    b7 = _conv(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _inception_e(p, x, pool):
    b1 = _conv(p["branch1x1"], x)
    h = _conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_conv(p["branch3x3_2a"], h, padding=(0, 1)),
                          _conv(p["branch3x3_2b"], h, padding=(1, 0))], -1)
    h = _conv(p["branch3x3dbl_2"], _conv(p["branch3x3dbl_1"], x), padding=1)
    bd = jnp.concatenate([_conv(p["branch3x3dbl_3a"], h, padding=(0, 1)),
                          _conv(p["branch3x3dbl_3b"], h, padding=(1, 0))], -1)
    pooled = (_avg_pool3_no_pad_count(x) if pool == "avg"
              else _max_pool(x, stride=1, padding=1))
    bp = _conv(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """[B,299,299,3] in [-1,1] -> [B,2048] pool3 features."""
    x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv(params["Conv2d_2a_3x3"], x)
    x = _conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x)
    x = _conv(params["Conv2d_3b_1x1"], x)
    x = _conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    for name, kind in _MIXED:
        fn = {"a": _inception_a, "b": _inception_b, "c": _inception_c,
              "d": _inception_d}.get(kind)
        if fn is not None:
            x = fn(params[name], x)
        else:
            x = _inception_e(params[name], x,
                             pool="max" if name == "Mixed_7c" else "avg")
    return x.mean(axis=(1, 2))


def preprocess(images01: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] -> bilinear 299x299 in [-1,1] (pytorch-fid's
    resize_input/normalize_input semantics: align_corners=False, no
    antialias)."""
    B = images01.shape[0]
    x = jax.image.resize(images01, (B, 299, 299, 3), method="bilinear",
                         antialias=False)
    return x * 2.0 - 1.0


class InceptionFeatureExtractor:
    """Pool3 (2048-d) feature extractor for real FID numbers.

    Construct from a converted params pytree or `from_torch_file` with a
    local `pt_inception-2015-12-05`-layout checkpoint. `jit=False` runs
    eagerly (useful on hosts where the one-off XLA compile dominates).
    """

    dim = 2048

    def __init__(self, params: Dict, jit: bool = True):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

        def extract(x01):
            return inception_pool3(self.params, preprocess(x01))

        self._extract = jax.jit(extract) if jit else extract

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(images01), jnp.float32)
        return np.asarray(self._extract(x))

    @classmethod
    def from_torch_file(cls, path: str, jit: bool = True
                        ) -> "InceptionFeatureExtractor":
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):  # a full module was pickled
            sd = sd.state_dict()
        return cls(convert_torch_inception_weights(sd), jit=jit)
