#!/usr/bin/env python
"""Measure the two-stage Cooley–Tukey MXU transform vs the dense MXU-DFT and
XLA's VPU FFT, at the amortized-direct size (2160, dense-legal) and the
big-kernel size (2560, beyond the dense cap). Decides MATMUL_CT_MIN_AXIS."""
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
from cuda_fft_convolution_tpu.ops import dft


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=3):
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
L = 2160
data = jnp.asarray(rng.standard_normal((1, 2048, 2048)).astype(np.float32))
kerns = jnp.asarray(rng.standard_normal((100, 64, 64)).astype(np.float32))
spec_r = jnp.asarray(
    rng.standard_normal((20, L, L // 2 + 1)).astype(np.float32)
)
spec_i = jnp.asarray(
    rng.standard_normal((20, L, L // 2 + 1)).astype(np.float32)
)
jax.block_until_ready((data, kerns, spec_r, spec_i))

emit(kind="info", ct2160=dft.ct_factor(L), ct2560=dft.ct_factor(2560))

# dense at 2160 (the status quo for the amortized-direct engine)
f_dense = probed(lambda x: dft.rfft2_mm_planes(x, L, L))
emit(kind="fwd2160_dense_data", ms=round(tfn(f_dense, data), 1))
fk_dense = probed(lambda x: dft.rfft2_mm_planes(x, L, L))
emit(kind="fwd2160_dense_kern100", ms=round(tfn(fk_dense, kerns), 1))
i_dense = probed(lambda a, b: dft.irfft2_mm_planes(a, b, L, L))
emit(kind="inv2160_dense_20", ms=round(tfn(i_dense, spec_r, spec_i), 1))

# CT at 2160 (forced via the env knob, fresh traces)
os.environ["FFTCONV_CT_MIN_AXIS"] = "1024"
f_ct = probed(lambda x: dft.rfft2_ct_planes(x, L, L))
emit(kind="fwd2160_ct_data", ms=round(tfn(f_ct, data), 1))
fk_ct = probed(lambda x: dft.rfft2_ct_planes(x, L, L))
emit(kind="fwd2160_ct_kern100", ms=round(tfn(fk_ct, kerns), 1))
i_ct = probed(lambda a, b: dft.irfft2_ct_planes(a, b, L, L))
emit(kind="inv2160_ct_20", ms=round(tfn(i_ct, spec_r, spec_i), 1))
del os.environ["FFTCONV_CT_MIN_AXIS"]

# XLA VPU FFT at 2160 for reference
f_fft = probed(
    lambda x: jnp.fft.rfft2(jnp.pad(x, ((0, 0), (0, L - 2048), (0, L - 2048))))
)
emit(kind="fwd2160_xlafft_data", ms=round(tfn(f_fft, data), 1))
i_fft = probed(
    lambda a, b: jnp.fft.irfft2(jax.lax.complex(a, b), s=(L, L))
)
emit(kind="inv2160_xlafft_20", ms=round(tfn(i_fft, spec_r, spec_i), 1))

# correctness spot-check: CT vs dense at 2160 on device
pa, _ = f_ct(data)
pb, _ = f_dense(data)
diff = jax.jit(
    lambda x: (
        jnp.max(jnp.abs(dft.rfft2_ct_planes(x, L, L)[0]
                        - dft.rfft2_mm_planes(x, L, L)[0])),
        jnp.max(jnp.abs(dft.rfft2_mm_planes(x, L, L)[0])),
    )
)
os.environ["FFTCONV_CT_MIN_AXIS"] = "1024"
d, m = diff(data[:, :256, :256])
emit(kind="ct_vs_dense_relerr", val=float(d / m))
del os.environ["FFTCONV_CT_MIN_AXIS"]

del spec_r, spec_i

# --- big-kernel config at 2560 (beyond the dense cap): CT vs XLA FFT,
# through the public one-shot API, N=16 bank of 512² kernels
kbig = jnp.asarray(rng.standard_normal((16, 512, 512, 1)).astype(np.float32))
data_l = jnp.asarray(rng.standard_normal((2048, 2048, 1)).astype(np.float32))
jax.block_until_ready((kbig, data_l))

shot_ct = probed(
    lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same", algorithm="direct")
)
emit(kind="bigk16_direct_ct", ms=round(tfn(shot_ct, data_l, kbig, iters=2), 1))

try:
    fc.set_config(use_matmul_fft=False)
    shot_fft = probed(
        lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same",
                                 algorithm="direct")
    )
    emit(kind="bigk16_direct_xlafft",
         ms=round(tfn(shot_fft, data_l, kbig, iters=2), 1))
finally:
    fc.set_config(use_matmul_fft=None)

shot_auto = probed(
    lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same")
)
emit(kind="bigk16_auto", ms=round(tfn(shot_auto, data_l, kbig, iters=2), 1))

emit(kind="done")
