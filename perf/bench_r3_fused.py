#!/usr/bin/env python
"""Round-3 fused-kernel levers on the attached TPU: split-bf16 3-pass dots
(fused_precision='bf16x3') and (MBH, MBW) block grouping. Measures the
amortized-tiled headline and the f64-oracle accuracy at both precisions."""
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


def tfn(fn, *a, warmup=2, iters=4):
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
N, KH, KW = 100, 64, 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, KH, KW, 1)).astype(np.float32))
jax.block_until_ready((data, kernels))

# --- accuracy config first (512^2 x 8 kernels, fused engages at the v4 plan)
dh = np.asarray(data[:512, :512, :])
ks = np.asarray(kernels[:8])


def oracle_err(got):
    oh, ow = 512, 512
    err = 0.0
    for i in range(8):
        ref = np.real(
            np.fft.ifft2(
                np.fft.fft2(dh[:, :, 0].astype(np.float64), (512 + 63, 512 + 63))
                * np.fft.fft2(ks[i, :, :, 0].astype(np.float64), (512 + 63, 512 + 63))
            )
        )[31 : 31 + oh, 31 : 31 + ow]
        err = max(err, np.max(np.abs(got[i] - ref)) / np.max(np.abs(ref)))
    return err


got_hi = np.array(fc.fft_conv(dh, KH, KW, ks, mode="same", algorithm="tiled"))
emit(kind="acc_highest", relerr=float(f"{oracle_err(got_hi):.3e}"))

try:
    fc.set_config(fused_precision="bf16x3")
    got_b3 = np.array(
        fc.fft_conv(dh, KH, KW, ks, mode="same", algorithm="tiled")
    )
    emit(kind="acc_bf16x3", relerr=float(f"{oracle_err(got_b3):.3e}"))
finally:
    fc.set_config(fused_precision="highest")

# --- amortized-tiled headline timings
sdt = fc.fft_data_tiled(data, KH, KW, trim_mode="same")
skt = fc.fft_kernels(kernels, spectral=sdt)
jax.block_until_ready((sdt.re, skt.re))

conv_hi = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
emit(kind="tiled_highest_ms", ms=round(tfn(conv_hi, sdt, skt), 1))

try:
    fc.set_config(fused_precision="bf16x3")
    conv_b3 = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    emit(kind="tiled_bf16x3_ms", ms=round(tfn(conv_b3, sdt, skt), 1))
    # streaming steady state at bf16x3
    for _ in range(2):
        p, _ = conv_b3(sdt, skt)
        np.asarray(p)
    t0 = time.perf_counter()
    p = None
    for i in range(6):
        p, _ = conv_b3(sdt, skt)
        if (i + 1) % 3 == 0:
            np.asarray(p)
    np.asarray(p)
    emit(kind="stream_bf16x3_ms", ms=round((time.perf_counter() - t0) / 6 * 1e3, 1))
finally:
    fc.set_config(fused_precision="highest")

# --- forced (mbh, mbw) group experiments on the raw kernel (v4 plan)
from cuda_fft_convolution_tpu.ops.block_conv import block_conv_pallas

d_re = sdt.re[None] if not sdt.batched else sdt.re
d_im = sdt.im[None] if not sdt.batched else sdt.im
for mbh, mbw in [(4, 1), (2, 2), (4, 2)]:
    try:
        f = probed(
            lambda a, b, c, d, _mbh=mbh, _mbw=mbw: block_conv_pallas(
                a, b, c, d, 256, 511, 65, 128, sdt.out_h, sdt.out_w,
                mbh=_mbh, mbw=_mbw, radix_h=True,
            )
        )
        emit(kind=f"group_{mbh}x{mbw}_ms",
             ms=round(tfn(f, d_re, d_im, skt.re, skt.im, iters=3), 1))
    except Exception as e:
        emit(kind=f"group_{mbh}x{mbw}_ms", error=repr(e)[:160])

emit(kind="done")
