#!/usr/bin/env python
"""Fused block-conv v4 (radix-2 H stage) on the real TPU.

Headline config (2048x2048x1 image, 100 kernels 64x64x1) at the v4 plan:
blocks (256, Lw), valid (192, vw), planned kernel envelope (65, Lw-vw+1) —
every MXU dot dimension 128-native. Compares against v3 at the same plan.
"""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.ops.block_conv import (
    block_conv_pallas, radix_h_legal,
)

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

CASES = [
    # (lh, lw, vh, vw, mbh, karatsuba, radix)
    (256, 511, 192, 384, 1, False, True),
    (256, 511, 192, 384, 2, False, True),
    (256, 511, 192, 384, 2, True, True),
    (256, 575, 192, 512, 1, False, True),
    (256, 575, 192, 512, 2, False, True),
    (256, 511, 192, 384, 2, False, False),   # v3 at the same plan
    (256, 639, 192, 512, 1, False, True),    # wc=320
]

want_ref = None
for lh, lw, vh, vw, mbh, kar, radix in CASES:
    kh, kw = lh - vh + 1, lw - vw + 1
    tag = dict(lh=lh, lw=lw, vh=vh, vw=vw, mbh=mbh, karatsuba=kar,
               radix=radix)
    if radix and not radix_h_legal(lh, vh):
        emit(kind="fused_v4", error="radix illegal", **tag)
        continue
    try:
        sd = fc.fft_data_tiled(data, kh, kw, block_h=lh, block_w=lw)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        oh, ow = sd.out_h, sd.out_w
        fused = probed(lambda s, kk: block_conv_pallas(
            s.re[None], s.im[None], kk.re, kk.im, lh, lw, kh, kw, oh, ow,
            mbh=mbh, karatsuba=kar, radix_h=radix))
        t = tfn(fused, sd, sk)
        got = np.array(fused(sd, sk)[1][0, :2, :128, :128])
        if want_ref is None:
            want_ref = np.array(
                fc.conv_spectral(sd, sk, mode="full"))[:2, :128, :128]
        err = float(np.max(np.abs(got - want_ref)) / np.max(np.abs(want_ref)))
        emit(kind="fused_v4", ms=round(t, 2),
             gpixf=round(gpixf / t * 1e3, 2), rel_err=float(f"{err:.2e}"),
             **tag)
        del sd, sk
    except Exception as e:
        emit(kind="fused_v4", error=repr(e)[:300], **tag)
emit(kind="done")
