#!/usr/bin/env python
"""Geometry sweep for the overlap-save tiled engine on the attached TPU.

Times the amortized serving path (precomputed block + bank spectra →
conv_spectral 'same') for the headline config (2048² × 100 × 64², F=1)
across explicit (block_h, block_w) = (vh+K-1, vw+K-1) choices, plus a
stage breakdown and precision tiers at the incumbent geometry.

One JSON line per measurement (flushed immediately — safe to tail).
"""
import itertools, json, os, sys, time
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

# oracle for accuracy spot-check (one kernel, full mode, small region)
def check(sd, sk):
    out = np.array(fc.conv_spectral(sd, sk, mode="same"))
    return float(np.mean(np.abs(out)))

VHS = [16, 24, 32, 48, 64, 128]
VWS = [128, 192, 256, 384]
mean_ref = None
for vh, vw in itertools.product(VHS, VWS):
    bh, bw = vh + K - 1, vw + K - 1
    try:
        sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
        t = time_fn(conv, sd, sk)
        m = check(sd, sk)
        if mean_ref is None:
            mean_ref = m
        emit(kind="geom", vh=vh, vw=vw, bh=bh, bw=bw,
             wc=bw // 2 + 1, ms=round(t * 1e3, 2),
             gpixf=round(gpixf / t, 2),
             mean_ok=bool(abs(m - mean_ref) / mean_ref < 1e-3))
        del sd, sk
    except Exception as e:
        emit(kind="geom", vh=vh, vw=vw, error=repr(e)[:200])

# --- stage breakdown at the incumbent geometry (vh=64, vw=384)
from cuda_fft_convolution_tpu.ops.spectral_mac import spectral_mac_planes
from cuda_fft_convolution_tpu.ops.dft import irfft2_mm_planes
import functools

bh, bw = 127, 447
sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
sk = fc.fft_kernels(kernels, spectral=sd)
jax.block_until_ready((sd.re, sk.re))
nbh, nbw = sd.re.shape[0], sd.re.shape[1]
dflat_re = sd.re.reshape(nbh * nbw, F, bh, bw // 2 + 1)
dflat_im = sd.im.reshape(nbh * nbw, F, bh, bw // 2 + 1)
jax.block_until_ready((dflat_re, dflat_im))

mac_only = probed(lambda dr, di, kr, ki: spectral_mac_planes(dr, di, kr, ki))
t_mac = time_fn(mac_only, dflat_re, dflat_im, sk.re, sk.im, iters=3)
emit(kind="stage", stage="mac_only", ms=round(t_mac * 1e3, 2))

def mac_hinv(dr, di, kr, ki):
    pr, pi = spectral_mac_planes(dr, di, kr, ki)
    # H-axis inverse only ≈ window rows, keep spectral cols (approximate by
    # windowed inverse with full cols? irfft2_mm_planes does both axes; use
    # the real thing: windowed full inverse)
    return irfft2_mm_planes(pr, pi, bh, bw, window=(K - 1, bh - K + 1, K - 1, bw - K + 1))
mh = probed(mac_hinv)
t_mhw = time_fn(mh, dflat_re, dflat_im, sk.re, sk.im, iters=3)
emit(kind="stage", stage="mac_plus_windowed_inverse", ms=round(t_mhw * 1e3, 2))

conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
t_full = time_fn(conv, sd, sk, iters=3)
emit(kind="stage", stage="full_conv_spectral", ms=round(t_full * 1e3, 2))

# --- precision tiers at incumbent geometry
for prec in ("high", "default"):
    fc.set_config(matmul_precision=prec)
    try:
        t = time_fn(conv, sd, sk, iters=3)
        out = np.array(fc.conv_spectral(sd, sk, mode="same"))
        emit(kind="precision", precision=prec, ms=round(t * 1e3, 2),
             gpixf=round(gpixf / t, 2))
    except Exception as e:
        emit(kind="precision", precision=prec, error=repr(e)[:200])
fc.set_config(matmul_precision="highest")

# --- fused Pallas block-conv at incumbent geometry
fc.set_config(use_fused_block_conv=True)
try:
    conv_f = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
    t = time_fn(conv_f, sd, sk, iters=3)
    emit(kind="fused", vh=64, vw=384, ms=round(t * 1e3, 2), gpixf=round(gpixf / t, 2))
except Exception as e:
    emit(kind="fused", error=repr(e)[:300])
fc.set_config(use_fused_block_conv=None)
emit(kind="done")
