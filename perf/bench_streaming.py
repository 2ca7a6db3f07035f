#!/usr/bin/env python
"""Round-3 candidates #2/#3: batched-frame scaling + streaming queueing.

(a) B-scaling: amortized tiled serving at B = 1, 2, 4, 8 frames per call
    (1024² so B=8 fits HBM) — how much of the per-call RTT does frame
    batching recover, and does device time scale linearly?
(b) sync_every sweep on the headline amortized call: round 2 measured
    sync_every=3 WORSE than 1 (queueing) — map the curve and the working-set
    effect at sync_every in {1, 2, 3, 6}.
"""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc

def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out
    return jax.jit(w)

def tfn(fn, *a, warmup=2, iters=4, sync_every=1):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    p = None
    for i in range(iters):
        p, _ = fn(*a)
        if (i + 1) % sync_every == 0:
            np.asarray(p)
    np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3

def emit(**kw): print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)
N, K = 100, 64
kernels = jnp.asarray(rng.standard_normal((N, K, K, 1)).astype(np.float32))

# (a) B-scaling at 1024² frames
for B in (1, 2, 4, 8):
    data = jnp.asarray(
        rng.standard_normal((B, 1024, 1024, 1)).astype(np.float32)
    )
    sd = fc.fft_data_tiled(data, K, K)
    sk = fc.fft_kernels(kernels, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    t = tfn(conv, sd, sk, iters=3)
    gpixf = B * 1024 * 1024 * N / 1e9
    emit(kind="batch_scaling", B=B, ms=round(t, 2),
         gpixf=round(gpixf / t * 1e3, 2), ms_per_frame=round(t / B, 2))
    del sd, sk, data

# (b) sync_every sweep on the 2048² headline amortized call
data = jnp.asarray(rng.standard_normal((2048, 2048, 1)).astype(np.float32))
sd = fc.fft_data_tiled(data, K, K)
sk = fc.fft_kernels(kernels, spectral=sd)
jax.block_until_ready((sd.re, sk.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
gpixf = 2048 * 2048 * N / 1e9
for se in (1, 2, 3, 6):
    t = tfn(conv, sd, sk, iters=6, sync_every=se)
    emit(kind="sync_every", sync_every=se, ms=round(t, 2),
         gpixf=round(gpixf / t * 1e3, 2))
emit(kind="done")
