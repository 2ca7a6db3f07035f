#!/usr/bin/env python
"""Streaming-depth sweep on the bf16 DPM configs: with the bf16 tier the
resident bank halved (5.2 GB), so more in-flight per-call working sets
(~1.07 GB of maps each) fit next to it — deeper pipelines amortize more
of the ~30 ms tunnel RTT. Sweep sync_every for the tiled 'same' and the
576-kernel direct configs."""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
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
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
KD, NK = 12, 1024
bank = jnp.asarray(rng.standard_normal((NK, KD, KD, 31)).astype(np.float32))
gpixf = 512 * 512 * NK / 1e9

# tiled 'same' bf16 tier
sdd = fc.fft_data_tiled(feats, KD, KD, trim_mode="same",
                        store_dtype="bfloat16")
skd = fc.fft_kernels(bank, spectral=sdd, store_dtype="bfloat16")
jax.block_until_ready((sdd.re, skd.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
for se in (3, 6, 9):
    drain()
    t = tfn(conv, sdd, skd, iters=se * 2, sync_every=se)
    emit(kind=f"dpm_tiled_bf16_sync{se}", ms=round(t, 1),
         gpixf=round(gpixf / (t / 1e3), 2))
del sdd, skd
drain()

# direct 576 bf16
sd16 = fc.fft_data(feats, KD, KD, store_dtype="bfloat16")
sk = fc.fft_kernels(bank[:576], spectral=sd16, store_dtype="bfloat16")
np.asarray(probed(lambda a: a[0, 0, :16])(sk.re)[0])
convd = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
for se in (2, 4, 6):
    drain()
    t = tfn(convd, sd16, sk, iters=se * 2, sync_every=se)
    emit(kind=f"dpm_direct_bf16_576_sync{se}", ms=round(t, 1),
         gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
emit(kind="done")
