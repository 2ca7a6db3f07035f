#!/usr/bin/env python
"""Fused block-conv v2 (stacked full-width MXU dots) vs unfused pipeline,
on the real TPU: correctness + timing at candidate geometries + mbh tiers."""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.ops.block_conv import block_conv_pallas

def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out
    return jax.jit(w)
def tfn(fn, *a, warmup=2, iters=4):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a); np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3
def emit(**kw): print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)
H = W = 2048; N, K = 100, 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, K, K, 1)).astype(np.float32))
jax.block_until_ready((data, kernels))
gpixf = H * W * N / 1e9

for vh, vw in [(64, 384), (64, 192), (128, 384), (64, 512)]:
    bh, bw = vh + K - 1, vw + K - 1
    try:
        sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        oh, ow = sd.out_h, sd.out_w
        fused = probed(lambda s, kk: block_conv_pallas(
            s.re[None], s.im[None], kk.re, kk.im, bh, bw, K, K, oh, ow))
        t = tfn(fused, sd, sk)
        # correctness vs unfused 'full'
        got = np.array(fused(sd, sk)[1][0, :2, :128, :128])
        want = np.array(fc.conv_spectral(sd, sk, mode="full"))[:2, :128, :128]
        err = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
        emit(kind="fused_v2", vh=vh, vw=vw, ms=round(t, 2),
             gpixf=round(gpixf / t * 1e3, 2), rel_err=float(f"{err:.2e}"))
        del sd, sk
    except Exception as e:
        emit(kind="fused_v2", vh=vh, vw=vw, error=repr(e)[:300])
emit(kind="done")
