#!/usr/bin/env python
"""Diagnose the giant-bank direct config (F=31, 9.3GB bank, 3.2s/call) and
the 512^2 large-kernel config (tiled-auto vs direct)."""
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
def tfn(fn, *a, warmup=1, iters=2):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a); np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3
def emit(**kw): print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)

# --- giant-bank direct: isolate MAC vs inverse vs chunking
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
NKD, KD = 224, 12
bank = jnp.asarray(rng.standard_normal((NKD, KD, KD, 31)).astype(np.float32))
sdf = fc.fft_data(feats, KD, KD)
skf = fc.fft_kernels(bank, spectral=sdf)
jax.block_until_ready((sdf.re, skf.re))
emit(kind="info", fft=(sdf.fft_h, sdf.fft_w),
     bank_gb=round(2 * skf.re.size * 4 / 1e9, 2))

# full path as benched
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
emit(kind="dpm_direct_full", ms=round(tfn(conv, sdf, skf), 1))

# pallas MAC variant
convp = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap", use_pallas=True))
try:
    emit(kind="dpm_direct_pallas", ms=round(tfn(convp, sdf, skf), 1))
except Exception as e:
    emit(kind="dpm_direct_pallas", error=repr(e)[:200])

# MAC-only on one chunk of 33 (einsum)
from cuda_fft_convolution_tpu.ops.spectral_mac import (
    spectral_mac_planes, spectral_mac_pallas_planes)
dr, di = sdf.re[None], sdf.im[None]
kr, ki = skf.re[:33], skf.im[:33]
jax.block_until_ready((dr, kr))
m1 = probed(lambda a,b,c,d: spectral_mac_planes(a,b,c,d))
emit(kind="mac33_einsum", ms=round(tfn(m1, dr, di, kr, ki), 1))
m2 = probed(lambda a,b,c,d: spectral_mac_pallas_planes(a,b,c,d))
try:
    emit(kind="mac33_pallas", ms=round(tfn(m2, dr, di, kr, ki), 1))
except Exception as e:
    emit(kind="mac33_pallas", error=repr(e)[:200])

# explicit broadcast-mul-reduce MAC (no dot_general): 33 kernels
def mac_mulsum(a, b, c, d):
    pr = jnp.sum(a[:, None] * c[None] - b[:, None] * d[None], axis=2)
    pi = jnp.sum(a[:, None] * d[None] + b[:, None] * c[None], axis=2)
    return pr, pi
m4 = probed(mac_mulsum)
emit(kind="mac33_mulsum", ms=round(tfn(m4, dr, di, kr, ki), 1))

# inverse+MAC fused for one chunk (the actual chunked-conv body)
from cuda_fft_convolution_tpu.api import _conv_from_spectra_chunked
cc = probed(lambda a,b,c,d: _conv_from_spectra_chunked(
    a, b, c, d, sdf.fft_h, sdf.fft_w, None, 13))
emit(kind="conv_chunk13_full224", ms=round(tfn(cc, dr, di, skf.re, skf.im), 1))

# whole-bank MAC einsum (no chunking, no inverse): 224 kernels
m3 = probed(lambda a,b,c,d: spectral_mac_planes(a,b,c,d))
try:
    emit(kind="mac256_einsum", ms=round(tfn(m3, dr, di, skf.re, skf.im), 1))
except Exception as e:
    emit(kind="mac256_einsum", error=repr(e)[:200])

# inverse-only on a 33-kernel product
from cuda_fft_convolution_tpu.ops.conv import irfft2_norm_planes
pr = jnp.asarray(rng.standard_normal((1, 33, sdf.fft_h, sdf.cfft_w)).astype(np.float32))
pi = jnp.asarray(rng.standard_normal((1, 33, sdf.fft_h, sdf.cfft_w)).astype(np.float32))
jax.block_until_ready((pr, pi))
inv = probed(lambda a,b: irfft2_norm_planes(a, b, sdf.fft_h, sdf.fft_w))
emit(kind="inv33", ms=round(tfn(inv, pr, pi), 1))
del sdf, skf, pr, pi, bank

# --- large-kernel 512^2: tiled-auto vs direct engine
data = jnp.asarray(rng.standard_normal((2048, 2048, 1)).astype(np.float32))
kbig = jnp.asarray(rng.standard_normal((4, 512, 512, 1)).astype(np.float32))
jax.block_until_ready((data, kbig))
f_auto = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
emit(kind="bigk_auto", ms=round(tfn(f_auto, data, kbig), 1))
f_dir = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same", algorithm="direct"))
emit(kind="bigk_direct", ms=round(tfn(f_dir, data, kbig), 1))
emit(kind="done")
