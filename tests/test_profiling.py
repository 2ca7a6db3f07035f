"""Profiling harness tests (utils/profiling.py — SURVEY.md §5 tracing)."""

import os

import jax.numpy as jnp
import numpy as np

from cuda_fft_convolution_tpu.utils.profiling import Timer, benchmark, trace


def test_benchmark_returns_sane_stats(rng):
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    stats = benchmark(lambda a: a @ a, x, warmup=1, iters=3)
    assert stats["iters"] == 3
    assert 0 < stats["min_s"] <= stats["median_s"]
    assert stats["mean_s"] > 0


def test_timer_accumulates():
    t = Timer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.total == dt
    t.start()
    t.stop()
    assert t.total >= dt
    t.reset()
    assert t.total == 0.0


def test_trace_writes_files(tmp_path, rng):
    x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
    with trace(str(tmp_path)):
        (x @ x).block_until_ready()
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "profiler trace produced no files"
