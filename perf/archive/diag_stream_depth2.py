#!/usr/bin/env python
"""Streaming-depth sweep, part 2: headline tiled 'same' (2048²×100) and
the large-kernel config (2048²×16 of 512²) — how much of the ~30 ms RTT
deeper pipelines recover."""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import cuda_fft_convolution_tpu as fc


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4].astype(jnp.float32), out
    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=3, sync_every=1):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last, _ = fn(*a)
        if (i + 1) % sync_every == 0:
            np.asarray(last)
    np.asarray(last)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
H = W = 2048
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kernels = jnp.asarray(
    rng.standard_normal((100, 64, 64, 1)).astype(np.float32)
)
gpixf = H * W * 100 / 1e9

sdt = fc.fft_data_tiled(data, 64, 64, trim_mode="same")
skt = fc.fft_kernels(kernels, spectral=sdt)
jax.block_until_ready((sdt.re, skt.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
for se in (3, 6, 9):
    drain()
    t = tfn(conv, sdt, skt, iters=se * 2, sync_every=se)
    emit(kind=f"headline_tiled_sync{se}", ms=round(t, 1),
         gpixf=round(gpixf / (t / 1e3), 2))
del sdt, skt, kernels
drain()

kbig = jnp.asarray(rng.standard_normal((16, 512, 512, 1)).astype(np.float32))
sdbk = fc.fft_data_tiled(data, 512, 512, trim_mode="same")
skbk = fc.fft_kernels(kbig, spectral=sdbk)
jax.block_until_ready((sdbk.re, skbk.re))
for se in (2, 4, 8):
    drain()
    t = tfn(conv, sdbk, skbk, iters=se * 2, sync_every=se)
    emit(kind=f"bigkernel_sync{se}", ms=round(t, 1),
         gpixf=round(H * W * 16 / 1e9 / (t / 1e3), 2))
emit(kind="done")
