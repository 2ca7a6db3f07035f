#!/usr/bin/env python
"""Measure mode='fftmap' through the tiled engine (baked FFT canvas) vs the
direct engine at the headline config (2048² × 100 64² kernels, fp32).

The canvas route reuses the headline's tiled machinery, so the delta is the
fftmap row's answer to BENCH's fftmap_parity_GPixF_s (round-3e: 1.689 on
the direct engine).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/bench_fftmap_tiled.py
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402

import cuda_fft_convolution_tpu as fc  # noqa: E402

H = W = 2048
KH = KW = 64
N = 100


def _probed(fn):
    def wrapped(*args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def _time(fn, *args, warmup=2, iters=3):
    for _ in range(warmup):
        probe, _ = fn(*args)
        np.asarray(probe)
    t0 = time.perf_counter()
    for _ in range(iters):
        probe, _ = fn(*args)
        np.asarray(probe)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
    kerns = jnp.asarray(
        rng.standard_normal((N, KH, KW, 1)).astype(np.float32)
    )
    gpixf = H * W * N / 1e9

    # correctness first: tiled canvas vs direct maps at a small config
    sm_d = np.asarray(
        fc.fft_conv(
            np.asarray(data[:256, :256]), KH, KW,
            np.asarray(kerns[:3]), mode="fftmap", algorithm="direct",
        )
    )
    sm_t = np.asarray(
        fc.fft_conv(
            np.asarray(data[:256, :256]), KH, KW,
            np.asarray(kerns[:3]), mode="fftmap", algorithm="tiled",
        )
    )
    assert sm_t.shape == sm_d.shape, (sm_t.shape, sm_d.shape)
    rel = float(
        np.max(np.abs(sm_t - sm_d)) / np.max(np.abs(sm_d))
    )
    print("small-config parity rel err:", rel, flush=True)

    rows = {}
    for name, algo in (("tiled", "tiled"), ("auto", "auto"),
                       ("direct", "direct")):
        shot = _probed(
            lambda d, k, a=algo: fc.fft_conv(
                d, KH, KW, k, mode="fftmap", algorithm=a
            )
        )
        t = _time(shot, data, kerns)
        rows[name] = {"ms": round(t * 1e3, 2),
                      "GPixF_s": round(gpixf / t, 3)}
        print(name, rows[name], flush=True)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
