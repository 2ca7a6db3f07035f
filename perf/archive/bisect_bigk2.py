#!/usr/bin/env python
"""Bisect stage 2: direct-2160 configs and batch8 before bigk."""
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


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=2):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
H = W = 2048
N, KH, KW, F = 100, 64, 64, 1
data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, KH, KW, F)).astype(np.float32))
jax.block_until_ready((data, kernels))
kbig = jnp.asarray(rng.standard_normal((16, 512, 512, F)).astype(np.float32))
bigk_shot = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
emit(kind="bigk_first", ms=round(tfn(bigk_shot, data, kbig), 1))

# fftmap parity one-shot (direct 2160 circular maps)
fftmap_shot = probed(lambda d, k: fc.fft_conv(d, KH, KW, k, mode="fftmap"))
emit(kind="fftmap", ms=round(tfn(fftmap_shot, data, kernels), 1))
emit(kind="bigk_after_fftmap", ms=round(tfn(bigk_shot, data, kbig), 1))

# amortized direct + pipelined (resident 2160 spectra)
sd = fc.fft_data(data, KH, KW)
sk = fc.fft_kernels(kernels, spectral=sd)
conv_d = probed(lambda s, k: fc.conv_spectral(s, k))
emit(kind="amort_direct", ms=round(tfn(conv_d, sd, sk), 1))
conv_p = probed(lambda s, k: fc.conv_spectral_pipelined(s, k, chunk_size=16))
emit(kind="pipelined", ms=round(tfn(conv_p, sd, sk), 1))
del sd, sk
emit(kind="bigk_after_direct", ms=round(tfn(bigk_shot, data, kbig), 1))

# batch8 (8 x 1024^2 tiled)
bdata = jnp.asarray(rng.standard_normal((8, 1024, 1024, F)).astype(np.float32))
sdb = fc.fft_data_tiled(bdata, KH, KW, trim_mode="same")
skb = fc.fft_kernels(kernels, spectral=sdb)
conv_b = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
emit(kind="batch8", ms=round(tfn(conv_b, sdb, skb), 1))
del sdb, skb, bdata
emit(kind="bigk_after_batch8", ms=round(tfn(bigk_shot, data, kbig), 1))
import gc

gc.collect()
np.asarray(probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
emit(kind="bigk_after_drain", ms=round(tfn(bigk_shot, data, kbig), 1))
emit(kind="done")
