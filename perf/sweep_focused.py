#!/usr/bin/env python
"""Focused geometry sweep: lane-aligned Hermitian width (Wc multiple of 128)
won the broad sweep's vw axis; find the best vh, compare Wc=128 vs 256,
then measure precision tiers, the fused Pallas kernel, and a stage
breakdown at the winner. One JSON line per measurement."""
import json, os, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cuda_fft_convolution_tpu as fc

def probed(fn):
    def wrapped(*args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out
    return jax.jit(wrapped)

def time_fn(fn, *args, warmup=2, iters=4):
    for _ in range(warmup):
        p, _ = fn(*args); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*args); np.asarray(p)
    return (time.perf_counter() - t0) / iters

def emit(**kw):
    print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)
H = W = 2048; N, K, F = 100, 64, 1
data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))
jax.block_until_ready((data, kernels))
gpixf = H * W * N / 1e9

results = []
# vw=192 → Wc=128; vw=448 → Wc=256; incumbent (64,384) for reference.
GEOMS = [(24,192),(32,192),(48,192),(64,192),(96,192),(128,192),
         (64,448),(96,448),(64,384)]
for vh, vw in GEOMS:
    bh, bw = vh + K - 1, vw + K - 1
    try:
        sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
        t = time_fn(conv, sd, sk)
        emit(kind="geom", vh=vh, vw=vw, wc=bw//2+1, ms=round(t*1e3, 2),
             gpixf=round(gpixf/t, 2))
        results.append((t, vh, vw))
        del sd, sk
    except Exception as e:
        emit(kind="geom", vh=vh, vw=vw, error=repr(e)[:200])

results.sort()
_, vh, vw = results[0]
bh, bw = vh + K - 1, vw + K - 1
emit(kind="best", vh=vh, vw=vw)
sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
sk = fc.fft_kernels(kernels, spectral=sd)
jax.block_until_ready((sd.re, sk.re))
conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))

# one-shot at best geometry (headline path, includes forward FFTs)
one = probed(lambda d, kk: fc.conv_spectral(
    fc.fft_data_tiled(d, K, K, block_h=bh, block_w=bw),
    fc.fft_kernels(kk, fft_h=bh, fft_w=bw), mode="same"))
t = time_fn(one, data, kernels, iters=3)
emit(kind="oneshot_best", ms=round(t*1e3, 2), gpixf=round(gpixf/t, 2))

# streaming at best geometry
for _ in range(1):
    t0 = time.perf_counter()
    p = None
    for i in range(6):
        p, _ = conv(sd, sk)
        if (i+1) % 3 == 0: np.asarray(p)
    t = (time.perf_counter()-t0)/6
emit(kind="streaming_best", ms=round(t*1e3, 2), gpixf=round(gpixf/t, 2))

# precision tiers at best geometry (+ accuracy vs HIGHEST output)
ref = np.array(fc.conv_spectral(sd, sk, mode="same")[:2])
scale = float(np.max(np.abs(ref)))
for prec in ("high", "default"):
    fc.set_config(matmul_precision=prec)
    try:
        convp = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
        t = time_fn(convp, sd, sk, iters=3)
        out = np.array(fc.conv_spectral(sd, sk, mode="same")[:2])
        emit(kind="precision", precision=prec, ms=round(t*1e3, 2),
             gpixf=round(gpixf/t, 2),
             rel_err_vs_highest=float(f"{np.max(np.abs(out-ref))/scale:.2e}"))
    except Exception as e:
        emit(kind="precision", precision=prec, error=repr(e)[:200])
fc.set_config(matmul_precision="highest")

# fused Pallas block-conv at best geometry
fc.set_config(use_fused_block_conv=True)
try:
    convf = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
    t = time_fn(convf, sd, sk, iters=3)
    out = np.array(fc.conv_spectral(sd, sk, mode="same")[:2])
    emit(kind="fused", ms=round(t*1e3, 2), gpixf=round(gpixf/t, 2),
         rel_err_vs_unfused=float(f"{np.max(np.abs(out-ref))/scale:.2e}"))
except Exception as e:
    emit(kind="fused", error=repr(e)[:300])
fc.set_config(use_fused_block_conv=None)

# stage breakdown at best geometry
from cuda_fft_convolution_tpu.ops.spectral_mac import spectral_mac_planes
from cuda_fft_convolution_tpu.ops.dft import irfft2_mm_planes
nbh, nbw = sd.re.shape[0], sd.re.shape[1]
wc = bw // 2 + 1
dfr = sd.re.reshape(nbh*nbw, F, bh, wc); dfi = sd.im.reshape(nbh*nbw, F, bh, wc)
jax.block_until_ready((dfr, dfi))
mac = probed(lambda a,b,c,d: spectral_mac_planes(a,b,c,d))
emit(kind="stage", stage="mac_only", ms=round(time_fn(mac, dfr, dfi, sk.re, sk.im, iters=3)*1e3, 2))
def macinv(a,b,c,d):
    pr, pi = spectral_mac_planes(a,b,c,d)
    return irfft2_mm_planes(pr, pi, bh, bw, window=(K-1, vh, K-1, vw))
mi = probed(macinv)
emit(kind="stage", stage="mac_plus_winv", ms=round(time_fn(mi, dfr, dfi, sk.re, sk.im, iters=3)*1e3, 2))
emit(kind="stage", stage="full", ms=round(time_fn(conv, sd, sk, iters=3)*1e3, 2))
emit(kind="done")
