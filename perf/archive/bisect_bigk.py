#!/usr/bin/env python
"""Bisect why the bigk 16x512^2 one-shot measures ~57 ms in a clean process
but ~225 ms inside bench.py: run it after increasing prefixes of the bench's
earlier configs, in one process each stage."""
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

# now the headline one-shot (fused bf16x3 kernel compiles/loads)
one_shot = probed(
    lambda d, k: fc.fft_conv(d, KH, KW, k, mode="same", algorithm="auto")
)
emit(kind="headline", ms=round(tfn(one_shot, data, kernels), 1))

emit(kind="bigk_after_headline", ms=round(tfn(bigk_shot, data, kbig), 1))

# amortized tiled + streaming (the bench's next configs)
sdt = fc.fft_data_tiled(data, KH, KW, trim_mode="same")
skt = fc.fft_kernels(kernels, spectral=sdt)
conv_t = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
emit(kind="amortized", ms=round(tfn(conv_t, sdt, skt), 1))
del sdt, skt

emit(kind="bigk_after_amortized", ms=round(tfn(bigk_shot, data, kbig), 1))

# bf16 variant of the one-shot (another executable)
emit(kind="bf16", ms=round(tfn(
    one_shot, data.astype(jnp.bfloat16), kernels.astype(jnp.bfloat16)
), 1))
emit(kind="bigk_after_bf16", ms=round(tfn(bigk_shot, data, kbig), 1))
emit(kind="done")
