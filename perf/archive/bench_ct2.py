#!/usr/bin/env python
"""Big-kernel (2560-point, beyond the dense cap): CT-MXU vs XLA VPU FFT
through the public one-shot API, N=16 bank of 512^2 kernels."""
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
        leaf = jnp.ravel(leaf)[:4]
        if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
            leaf = jnp.real(leaf).astype(jnp.float32)
        return leaf, out

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
kbig = jnp.asarray(rng.standard_normal((16, 512, 512, 1)).astype(np.float32))
data_l = jnp.asarray(rng.standard_normal((2048, 2048, 1)).astype(np.float32))
jax.block_until_ready((kbig, data_l))

shot_ct = probed(
    lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same", algorithm="direct")
)
emit(kind="bigk16_direct_ct", ms=round(tfn(shot_ct, data_l, kbig), 1))

try:
    fc.set_config(use_matmul_fft=False)
    shot_fft = probed(
        lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same",
                                 algorithm="direct")
    )
    emit(kind="bigk16_direct_xlafft", ms=round(tfn(shot_fft, data_l, kbig), 1))
finally:
    fc.set_config(use_matmul_fft=None)

shot_auto = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
emit(kind="bigk16_auto", ms=round(tfn(shot_auto, data_l, kbig), 1))

# accuracy of the CT path vs f64 oracle on a small slice
d_small = np.asarray(data_l[:300, :300, :])
k_small = np.asarray(kbig[:1, :260, :260, :])
got = np.asarray(
    fc.fft_conv(d_small, 260, 260, k_small, mode="full", algorithm="direct",
                policy="fast")
)
oh, ow = 300 + 260 - 1, 300 + 260 - 1
ref = np.real(
    np.fft.ifft2(
        np.fft.fft2(d_small[:, :, 0].astype(np.float64), (oh, ow))
        * np.fft.fft2(k_small[0, :, :, 0].astype(np.float64), (oh, ow))
    )
)
err = np.max(np.abs(got[0] - ref)) / np.max(np.abs(ref))
emit(kind="ct_small_relerr", val=float(err))
emit(kind="done")
