"""LoRA fine-tuning as a pytree partition (native, no PEFT).

The reference README claims LoRA fine-tuning via PEFT on the attention
layers (`/root/reference/README.md:64-67,113`) but no such code exists in the
repo (SURVEY.md). This is the native JAX implementation: low-rank A/B factors
attached to selected kernels (attention qkv/proj by default, optionally conv
and time-embed Dense kernels), merged functionally at apply time so the base
parameters stay frozen and only the LoRA pytree receives gradients —
`jax.grad` w.r.t. the LoRA tree alone gives the partition for free, no
optimizer masking needed.

Conv kernels [Kh,Kw,I,O] factor over the flattened (Kh*Kw*I) x O matrix.
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DEFAULT_TARGETS",
    "select_lora_targets",
    "init_lora",
    "merge_lora",
    "lora_param_count",
]

# attention qkv + output projection kernels (README.md:64-67 scope)
DEFAULT_TARGETS = (r".*_attn/(qkv|proj)$", r"mid_attn/(qkv|proj)$")


def _flatten_with_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.extend(_flatten_with_paths(tree[k], prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def select_lora_targets(params, patterns: Sequence[str] = DEFAULT_TARGETS
                        ) -> List[Tuple[str, ...]]:
    """Paths of 'kernel' leaves whose module path matches any regex."""
    regexes = [re.compile(p) for p in patterns]
    targets = []
    for path, leaf in _flatten_with_paths(params):
        if path[-1] != "kernel":
            continue
        mod_path = "/".join(path[:-1])
        if any(r.search(mod_path) for r in regexes):
            targets.append(path[:-1])
    return targets


def init_lora(key, params, rank: int = 8, alpha: float = 16.0,
              patterns: Sequence[str] = DEFAULT_TARGETS) -> Dict:
    """LoRA pytree {"/".join(path): {"a": [d_in, r], "b": [r, d_out]}}.

    `a` is gaussian-initialized, `b` zero — merged delta starts at zero, so
    step 0 reproduces the base model exactly.
    """
    targets = select_lora_targets(params, patterns)
    if not targets:
        raise ValueError(f"no LoRA targets matched patterns {patterns}")
    lora = {}
    for i, path in enumerate(targets):
        node = params
        for p in path:
            node = node[p]
        kernel = node["kernel"]
        d_in = int(np.prod(kernel.shape[:-1]))
        d_out = kernel.shape[-1]
        k = jax.random.fold_in(key, i)
        lora["/".join(path)] = {
            "a": jax.random.normal(k, (d_in, rank), jnp.float32) / np.sqrt(d_in),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    lora["__meta__"] = {"scaling": jnp.asarray(alpha / rank, jnp.float32)}
    return lora


def merge_lora(params, lora: Dict):
    """Return params with kernel <- kernel + scaling * (a @ b), functionally."""
    scaling = lora["__meta__"]["scaling"]

    def apply_path(tree, path_parts, fn):
        head, *rest = path_parts
        new = dict(tree)
        new[head] = fn(tree[head]) if not rest else apply_path(tree[head], rest, fn)
        return new

    merged = params
    for joined, ab in lora.items():
        if joined == "__meta__":
            continue
        path = joined.split("/")

        def patch(node, ab=ab):
            kernel = node["kernel"]
            delta = (ab["a"] @ ab["b"]) * scaling
            return {**node, "kernel": kernel + delta.reshape(kernel.shape).astype(kernel.dtype)}

        merged = apply_path(merged, path, patch)
    return merged


def lora_param_count(lora: Dict) -> int:
    return sum(
        int(np.prod(v.shape))
        for k, ab in lora.items() if k != "__meta__"
        for v in ab.values()
    )
