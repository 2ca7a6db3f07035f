#!/usr/bin/env python
"""Verbatim bench.py prefix (accuracy -> headline -> amortized+streaming)
then the bigk config, with stage markers — reproduces the in-bench 4x
degradation or exonerates the prefix."""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cuda_fft_convolution_tpu as fc


def _probed(fn):
    def wrapped(*args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def _time_fn(fn, *args, warmup=2, iters=5, sync_every=1):
    for _ in range(warmup):
        probe, _ = fn(*args)
        np.asarray(probe)
    t0 = time.perf_counter()
    probe = None
    for i in range(iters):
        probe, _ = fn(*args)
        if (i + 1) % sync_every == 0:
            np.asarray(probe)
    np.asarray(probe)
    return (time.perf_counter() - t0) / iters


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
H = W = 2048
N, KH, KW, F = 100, 64, 64, 1
data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, KH, KW, F)).astype(np.float32))
jax.block_until_ready((data, kernels))

# --- accuracy block (verbatim)
dh = np.asarray(data[:512, :512, :])
ks = np.asarray(kernels[:8, :, :, :])
got = np.array(fc.fft_conv(dh, KH, KW, ks, mode="full"))
del got
emit(kind="stage", name="accuracy")

# --- headline (verbatim: warmup 2, iters 5)
one_shot = _probed(
    lambda d, k: fc.fft_conv(d, KH, KW, k, mode="same", algorithm="auto")
)
t_head = _time_fn(one_shot, data, kernels)
emit(kind="stage", name="headline", ms=round(t_head * 1e3, 1))

# --- tiled amortized + streaming (verbatim)
sdt = fc.fft_data_tiled(data, KH, KW, trim_mode="same")
skt = fc.fft_kernels(kernels, spectral=sdt)
jax.block_until_ready((sdt.re, skt.re))
conv_t = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
t_tiled = _time_fn(conv_t, sdt, skt)
t_stream = _time_fn(conv_t, sdt, skt, iters=6, sync_every=3)
del sdt, skt
emit(kind="stage", name="amortized", ms=round(t_tiled * 1e3, 1),
     stream_ms=round(t_stream * 1e3, 1))

# --- bigk (verbatim: warmup 2, iters 3)
NB = 16
kbig = jnp.asarray(rng.standard_normal((NB, 512, 512, F)).astype(np.float32))
bigk_shot = _probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
t_bigk = _time_fn(bigk_shot, data, kbig, iters=3)
emit(kind="bigk_after_full_prefix", ms=round(t_bigk * 1e3, 1))
emit(kind="done")
