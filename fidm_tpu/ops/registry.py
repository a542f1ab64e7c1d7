"""Runtime switches for Pallas kernels vs. XLA fallbacks.

Pallas kernels are enabled by default on real TPU backends and disabled on CPU
(where the tests validate the fallbacks and, separately, the kernels in
interpreter mode). Override globally with `set_use_pallas` or the
FIDM_TPU_PALLAS environment variable ("0"/"1").
"""
from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional

import jax

_overrides: Dict[str, Optional[bool]] = {}
_global_override: Optional[bool] = None

_env = os.environ.get("FIDM_TPU_PALLAS")
if _env is not None:
    _global_override = _env not in ("0", "false", "False")


def set_use_pallas(value: Optional[bool], op: Optional[str] = None) -> None:
    """Force Pallas on/off globally (op=None) or per-op; None restores default."""
    global _global_override
    if op is None:
        _global_override = value
    else:
        _overrides[op] = value


def use_pallas(op: str) -> bool:
    if op in _overrides and _overrides[op] is not None:
        return _overrides[op]
    if _global_override is not None:
        return _global_override
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def pallas_override(value: Optional[bool], op: str):
    """Scoped per-op override: set for the duration of the block, then
    restore whatever was there before. Use around jit tracing when a
    specific program must avoid a kernel (e.g. TP-sharded programs cannot
    partition the opaque Pallas attention custom call) without mutating
    process-global state for every other model in the process."""
    prev = _overrides.get(op)
    _overrides[op] = value
    try:
        yield
    finally:
        _overrides[op] = prev
