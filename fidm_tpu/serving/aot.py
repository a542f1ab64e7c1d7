"""Ahead-of-time program cache for the serving layer.

The 256² sampling graph takes ~10-15 min of cold XLA compile on a fresh
host, and the serving dispatcher warms a LADDER of batch shapes (1/2/4/8 —
see server.py), multiplying that cost. This module serializes the compiled
executables themselves (`jax.experimental.serialize_executable`) so a
production host restarts in seconds: programs become deployable artifacts
next to the checkpoint.

No reference equivalent (the reference pays torch/CUDA warmup per process;
its closest analogue is `torch.compile` in `test_quant.py:390-409`, which
recompiles every run). TPU-native answer: XLA executables are bound to
exact input shapes/dtypes, device kind, and jax version — each program file
is keyed by a fingerprint over all of those plus the UNet/sampler configs,
so a stale or mismatched cache entry is silently recompiled rather than
mis-executed.

Format: one pickle file per (batch, sampler) program. Only load cache
directories you trust (pickle).

XLA:CPU caveat (TPU is the target and unaffected): combining this AOT
cache with jax's persistent compilation cache in one process can hit an
XLA:CPU loader bug ("Buffer Definition Event: Function ... not found" at
execution) — the CPU AOT loader mishandles executables that round-trip
through both serialization paths. save_programs bypasses the compilation
cache for its compiles on CPU; if you serve on CPU with a program cache,
also leave the compilation cache off (FIDM_NO_COMPILATION_CACHE=1).
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Optional

import jax

__all__ = ["program_path", "save_programs", "load_programs"]

_FORMAT_VERSION = 1


def _fingerprint(pipeline, batch: int, cfg, batched_key: bool = False) -> str:
    """Identity of one compiled program: anything that would change the
    executable (or make it unsafe to run) must land in here."""
    leaves = jax.tree_util.tree_flatten_with_path(pipeline.variables)[0]
    var_sig = [
        (jax.tree_util.keystr(path), str(x.shape), str(x.dtype))
        for path, x in leaves
    ]
    payload = {
        "format": _FORMAT_VERSION,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "n_devices": jax.device_count(),
        "unet": repr(pipeline.config.unet),
        "schedule": [pipeline.config.schedule, pipeline.config.num_timesteps],
        "rescale_timesteps": pipeline.config.rescale_timesteps,
        "sampler": repr(cfg),
        "batch": batch,
        # per-sample key programs ([batch, 2] key input — the serving
        # per-request isolation layout) are distinct executables from
        # single-key ones
        "key_layout": "batched" if batched_key else "single",
        "variables": var_sig,
    }
    blob = json.dumps(payload, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:20]


def program_path(cache_dir: str, pipeline, batch: int,
                 sampler=None, batched_key: bool = False) -> str:
    cfg = sampler or pipeline.config.sampler
    fp = _fingerprint(pipeline, batch, cfg, batched_key)
    return os.path.join(cache_dir, f"prog_b{batch}_{fp}.aot")


def save_programs(pipeline, cache_dir: str, batch_sizes,
                  sampler=None, overwrite: bool = False,
                  batched_key: bool = False) -> int:
    """Compile (if needed) and persist the sampling program for each batch
    size. Returns the number of programs written. Single-host pipelines
    only (mesh-sharded executables are not portable artifacts)."""
    if pipeline.mesh is not None:
        raise ValueError("AOT program cache supports single-host pipelines "
                         "only (mesh is not None)")
    from jax.experimental import serialize_executable as se

    os.makedirs(cache_dir, exist_ok=True)
    cfg = sampler or pipeline.config.sampler
    written = 0
    for batch in batch_sizes:
        path = program_path(cache_dir, pipeline, batch, cfg, batched_key)
        if os.path.exists(path) and not overwrite:
            continue
        # On XLA:CPU, bypass jax's persistent compilation cache for THIS
        # compile: when lowered.compile() returns an executable
        # deserialized from that cache, re-serializing it produces a
        # broken artifact (missing-function errors at execution, observed
        # on this build). TPU executables round-trip fine, and bypassing
        # there would re-pay the full cold compile, so the workaround is
        # CPU-only.
        if jax.default_backend() == "cpu":
            cc_dir = jax.config.jax_compilation_cache_dir
            jax.config.update("jax_compilation_cache_dir", None)
            try:
                compiled = pipeline.compile_batch(batch, cfg, batched_key)
            finally:
                jax.config.update("jax_compilation_cache_dir", cc_dir)
        else:
            compiled = pipeline.compile_batch(batch, cfg, batched_key)
        # reuse, don't re-jit
        pipeline.install_program(batch, cfg, compiled, batched_key)
        blob, in_tree, out_tree = se.serialize(compiled)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            # num_devices: a meshless jit compiles for device 0 only; the
            # loader must bind the executable to exactly that many devices
            # (deserialize_and_load defaults to ALL local devices)
            pickle.dump({"format": _FORMAT_VERSION, "num_devices": 1,
                         "blob": blob,
                         "in_tree": in_tree, "out_tree": out_tree}, f)
        os.replace(tmp, path)  # atomic: readers never see a partial file
        written += 1
    return written


def load_programs(pipeline, cache_dir: str, batch_sizes,
                  sampler=None, batched_key: bool = False) -> int:
    """Install every matching cached program into the pipeline (exact-shape
    dispatch ahead of the jit cache). Missing or fingerprint-mismatched
    entries are skipped — the caller's normal warmup covers them. Returns
    the number of programs loaded."""
    if pipeline.mesh is not None:
        raise ValueError("AOT program cache supports single-host pipelines "
                         "only (mesh is not None)")
    from jax.experimental import serialize_executable as se

    cfg = sampler or pipeline.config.sampler
    loaded = 0
    for batch in batch_sizes:
        path = program_path(cache_dir, pipeline, batch, cfg, batched_key)
        if not os.path.exists(path):
            continue
        try:
            with open(path, "rb") as f:
                data = pickle.load(f)
            if data.get("format") != _FORMAT_VERSION:
                continue
        except Exception as e:  # unreadable on disk — definitely corrupt
            print(f"AOT program cache: dropping unreadable {path}: {e}")
            try:
                # remove it so the caller's save_programs recompiles and
                # heals the cache (otherwise the exists-check would skip
                # this entry forever and every restart would pay a compile)
                os.remove(path)
            except OSError:
                pass
            continue
        try:
            devs = jax.devices()[:data.get("num_devices", 1)]
            program = se.deserialize_and_load(data["blob"], data["in_tree"],
                                              data["out_tree"],
                                              execution_devices=devs)
        except (KeyError, ValueError) as e:  # malformed payload: corrupt
            print(f"AOT program cache: dropping malformed {path}: {e}")
            try:
                os.remove(path)
            except OSError:
                pass
            continue
        except Exception as e:
            # device-load failure — can be TRANSIENT (busy chip, tunnel
            # churn): skip without deleting what may be a valid 10-minute
            # compile artifact; the jit path covers this process run.
            # (Entries that load but cannot EXECUTE are healed by
            # InpaintingServer.warmup.)
            print(f"AOT program cache: skipping {path} "
                  f"(device load failed: {e})")
            continue
        pipeline.install_program(batch, cfg, program, batched_key)
        loaded += 1
    return loaded
