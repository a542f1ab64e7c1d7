"""Persistent XLA compilation cache, on by default for every CLI.

The 256² sampling graph costs ~10-15 min of cold compile on this class of
host and the training step 2-7 min; a preempted-and-resumed trainer or a
repeat evaluation re-pays that for nothing. JAX ships a content-addressed
persistent compilation cache — this helper turns it on with a sane default
location so every `fidm_tpu.cli.*` entry point gets warm restarts for free
(the reference's torch stack re-JITs `torch.compile` every process,
`test_quant.py:390-409`).

Precedence: an existing `JAX_COMPILATION_CACHE_DIR` env var wins (jax reads
it natively); otherwise `FIDM_COMPILATION_CACHE`; otherwise
`~/.cache/fidm_tpu/xla`. Point it at durable shared storage (NFS/GCS) for
preemptible fleets. Disable with `FIDM_NO_COMPILATION_CACHE=1`.

For instant cold starts on hosts that never saw the program at all, see the
AOT executable cache (`serving/aot.py`) — that one ships the compiled
program itself; this one memoizes compiles per host/filesystem.
"""
from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable jax's persistent compilation cache; returns the directory used
    (None when disabled or unavailable)."""
    if os.environ.get("FIDM_NO_COMPILATION_CACHE") == "1":
        return None
    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.environ.get("FIDM_COMPILATION_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "fidm_tpu", "xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        return None  # ancient jax without the option: run uncached
    return path
