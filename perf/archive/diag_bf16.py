#!/usr/bin/env python
"""Measure the bf16 serving tier on the DPM/HOG configs (BASELINE
configs[4]: bf16 inputs, fp32 spectral accumulation).

The F=31 paths are traffic-bound (PERF.md round-3): bf16-stored spectra
halve the MAC read bytes and the resident bank footprint, so the tier
should approach 2x on the direct giant-bank config and also lift the
unfused tiled path. Also checks on-device tier accuracy vs the fp32 run.
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


def tfn(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
KD, NK = 12, 1024
bank = jnp.asarray(rng.standard_normal((NK, KD, KD, 31)).astype(np.float32))
gpixf_tiled = 512 * 512 * NK / 1e9

# --- tiled 'same' DPM path: fp32 tier vs bf16 tier -----------------------
sdd = fc.fft_data_tiled(feats, KD, KD, trim_mode="same")
skd = fc.fft_kernels(bank, spectral=sdd)
jax.block_until_ready((sdd.re, skd.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
t32 = tfn(conv, sdd, skd)
emit(kind="dpm_tiled_f32", ms=round(t32, 1),
     gpixf=round(gpixf_tiled / (t32 / 1e3), 2))
_, out32 = conv(sdd, skd)
err_ref = jax.jit(lambda o: jnp.max(jnp.abs(o)))(out32)
del sdd, skd
drain()

sdd16 = fc.fft_data_tiled(feats, KD, KD, trim_mode="same",
                          store_dtype="bfloat16")
skd16 = fc.fft_kernels(bank, spectral=sdd16, store_dtype="bfloat16")
jax.block_until_ready((sdd16.re, skd16.re))
t16 = tfn(conv, sdd16, skd16)
emit(kind="dpm_tiled_bf16", ms=round(t16, 1),
     gpixf=round(gpixf_tiled / (t16 / 1e3), 2),
     speedup=round(t32 / t16, 2))
_, out16 = conv(sdd16, skd16)
rel = jax.jit(
    lambda a, b, s: jnp.max(jnp.abs(a.astype(jnp.float32) - b)) / s
)(out16, out32, err_ref)
emit(kind="dpm_tiled_bf16_relerr", rel=float(np.asarray(rel)))
del sdd16, skd16, out32, out16, err_ref, rel
drain()

# --- direct giant-bank path ----------------------------------------------
# fp32 at NKD=288 (the benched config), then bf16 at 288 (apples-to-apples)
# and bf16 at 576 (the capacity story: same HBM as the fp32 bank).
sdf = fc.fft_data(feats, KD, KD)
for nkd, dt in ((288, "float32"), (288, "bfloat16"), (576, "bfloat16")):
    drain()
    sd = (sdf if dt == "float32"
          else fc.fft_data(feats, KD, KD, store_dtype="bfloat16"))
    kb = jnp.concatenate([bank, bank])[:nkd] if nkd > NK else bank[:nkd]
    sk = fc.fft_kernels(kb, spectral=sd, store_dtype=dt)
    np.asarray(probed(lambda a: a[0, 0, :16])(sk.re)[0])
    bytes_gb = 2 * sk.re.size * sk.re.dtype.itemsize / 1e9
    convd = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
    t = tfn(convd, sd, sk, iters=2)
    emit(kind=f"dpm_direct_{dt}_{nkd}", ms=round(t, 1),
         gpixf=round(512 * 512 * nkd / 1e9 / (t / 1e3), 2),
         bank_gb=round(bytes_gb, 2))
    del sd, sk, kb, convd
    drain()
emit(kind="done")
