#!/usr/bin/env python
"""Bench-procedure finals for the bf16 tier:
(1) headline-config one-shot with store_dtype='bfloat16' (tier forces the
    UNFUSED tiled path — fused kernel is fp32-gated) vs the fp32 fused
    44.6 ms: decides whether the bf16_GPixF_s row adopts the tier;
(2) conv_spectral at 576-kernel bf16 giant bank through the new
    store_bytes-aware planner (chunked upcast MAC), per-call + streamed —
    decides the dpm_direct row's NKD.
"""
import gc, json, os, time
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

# (1) headline config, bf16 tier one-shot
H = W = 2048
F, N, KH, KW = 1, 100, 64, 64
data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, KH, KW, F)).astype(np.float32))
shot16 = probed(
    lambda d, k: fc.fft_conv(d, KH, KW, k, mode="same",
                             store_dtype="bfloat16")
)
t = tfn(shot16, data.astype(jnp.bfloat16), kernels.astype(jnp.bfloat16))
emit(kind="headline_oneshot_bf16tier", ms=round(t, 1),
     gpixf=round(H * W * N / 1e9 / (t / 1e3), 2))
shot32 = probed(lambda d, k: fc.fft_conv(d, KH, KW, k, mode="same"))
t = tfn(shot32, data, kernels)
emit(kind="headline_oneshot_fp32", ms=round(t, 1),
     gpixf=round(H * W * N / 1e9 / (t / 1e3), 2))
del data, kernels, shot16, shot32
drain()

# (2) giant-bank direct via conv_spectral at 576 bf16 (planner-chunked)
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
KD = 12
bank = jnp.asarray(rng.standard_normal((576, KD, KD, 31)).astype(np.float32))
sd16 = fc.fft_data(feats, KD, KD, store_dtype="bfloat16")
sk = fc.fft_kernels(bank, spectral=sd16, store_dtype="bfloat16")
np.asarray(probed(lambda a: a[0, 0, :16])(sk.re)[0])
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
try:
    t = tfn(conv, sd16, sk, iters=2)
    emit(kind="conv_spectral_bf16_576", ms=round(t, 1),
         gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
    drain()
    t = tfn(conv, sd16, sk, iters=4, sync_every=2)
    emit(kind="conv_spectral_bf16_576_stream", ms=round(t, 1),
         gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
except Exception as e:
    emit(kind="conv_spectral_bf16_576", error=repr(e)[:400])
emit(kind="done")
