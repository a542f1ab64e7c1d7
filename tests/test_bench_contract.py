"""bench.py emit-early contract (round-5 fix for the r04 rc=124 timeout).

The driver tail-parses bench.py's stdout with an external timeout. Under a
fully cold compile cache each sampler program costs ~10-15 min through the
TPU remote-compile tunnel, so the contract is:

  1. the headline JSON line is printed+flushed IMMEDIATELY after the first
     timed measurement (one compile), BEFORE the exact-anchor leg compiles
     a second program;
  2. the exact leg is skipped when elapsed wall-clock exceeds
     FIDM_BENCH_BUDGET_S, so a cold run always emits within one compile;
  3. when the exact leg does run, the augmented line is printed LAST (the
     tail-parse then picks up the richer record).

These tests run bench.py as a real subprocess on CPU with a shrunk model
(FIDM_BENCH_WIDTH / FIDM_BENCH_IMAGE_SIZE) — the same code path the driver
executes, minus the tunnel.
"""
import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

SMOKE_ENV = {
    "FIDM_BENCH_PLATFORM": "cpu",
    "FIDM_BENCH_WIDTH": "32",
    "FIDM_BENCH_IMAGE_SIZE": "64",
    "FIDM_BENCH_STEPS": "4",
    "FIDM_BENCH_BATCH": "2",
    "FIDM_BENCH_REPEATS": "1",
    "FIDM_BENCH_CHILD": "1",  # skip the tunnel-outage retry wrapper
}


def _run_bench(extra_env):
    env = {**os.environ, **SMOKE_ENV, **extra_env}
    r = subprocess.run([sys.executable, os.path.abspath(BENCH)], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    parsed = [json.loads(ln) for ln in lines]
    return parsed, r.stderr


@pytest.mark.slow
def test_cold_budget_exceeded_emits_headline_and_skips_exact_leg():
    # budget 0 => the exact-anchor leg must be skipped; exactly one JSON
    # line, parseable, with the driver-required fields.
    parsed, stderr = _run_bench({"FIDM_BENCH_BUDGET_S": "0"})
    assert len(parsed) == 1
    (line,) = parsed
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in line
    assert "exact_time_per_sample_s" not in line
    assert line["value"] > 0
    assert "skipping exact-anchor leg" in stderr


@pytest.mark.slow
def test_warm_budget_emits_headline_first_then_augmented_last():
    parsed, _ = _run_bench({"FIDM_BENCH_BUDGET_S": "1e9"})
    assert len(parsed) == 2
    first, last = parsed
    # headline first (no exact anchor yet), augmented last — the driver's
    # tail-parse always lands on a complete record either way.
    assert "exact_time_per_sample_s" not in first
    assert "exact_time_per_sample_s" in last
    assert last["metric"] == first["metric"]
    assert last["value"] == first["value"]
    assert last["exact_time_per_sample_s"] > 0
