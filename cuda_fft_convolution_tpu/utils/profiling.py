"""Profiling & timing harness.

The reference vendors two timer stacks it never calls (src/cutil.h:613,
common/helper_timer.h:28 — SURVEY.md §5 "tracing: none wired in"). Here
profiling is a first-class utility:

  - ``trace(dir)``: context manager around ``jax.profiler`` — produces a
    TensorBoard-loadable XPlane trace of every XLA/Pallas op.
  - ``benchmark(fn, *args)``: wall-clock timing with warmup and
    block_until_ready (async dispatch means naive timing measures nothing).
  - ``Timer``: the cutCreateTimer/cutStartTimer analogue for host phases.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): fn()`` then
    ``tensorboard --logdir /tmp/trace``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(out) -> None:
    """Truly wait for ``out``: block_until_ready PLUS a tiny D2H fetch.

    On some remote TPU runtimes (observed on the tunneled v5e here)
    block_until_ready returns before remote execution finishes — only a
    host fetch round-trips through actual completion. The fetched slice is
    4 elements, so the added cost is one tunnel RTT."""
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    from cuda_fft_convolution_tpu.utils.transfer import fetch

    fetch(jax.numpy.ravel(leaf)[:4])


def benchmark(fn, *args, warmup: int = 2, iters: int = 10) -> dict:
    """Median/mean wall time of ``fn(*args)`` with REAL device sync (see
    device_sync — block_until_ready alone lies on tunneled runtimes).

    Returns {"mean_s", "median_s", "min_s", "iters"}."""
    for _ in range(max(warmup, 1)):
        device_sync(fn(*args))
    times = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    return {
        "mean_s": sum(times) / n,
        "median_s": times[n // 2],
        "min_s": times[0],
        "iters": n,
    }


@dataclasses.dataclass
class Timer:
    """Accumulating host-side phase timer (≈ cutStartTimer/cutStopTimer,
    src/cutil.h:613-660, which the reference never calls)."""

    total: float = 0.0
    _t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "Timer.stop() without start()"
        dt = time.perf_counter() - self._t0
        self.total += dt
        self._t0 = None
        return dt

    def reset(self) -> None:
        self.total = 0.0
        self._t0 = None
