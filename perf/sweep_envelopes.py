#!/usr/bin/env python
"""Tune block plans for the 32² and 128² kernel envelopes (2048² image,
100-kernel banks, F=1): the analytic-auto geometry vs v4-style radix plans
with every dot dimension 128-native. Winners go into autotune._BUILTIN.

Measured via the amortized serving call (precomputed spectra, baked 'same'
window) — the same shape bench.py's amortized metric uses.
"""
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

def tfn(fn, *a, warmup=2, iters=4):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a); np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3

def emit(**kw): print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)
H = W = 2048
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))

# (K, label, block_h, block_w, plan_kh, plan_kw); block None = auto dispatch
CASES = [
    (16, "auto", None, None, None, None),
    # v4: Lh=256 (M=128, vh=224, kh_eff=33), Lw=511 (wc=256, vw=384)
    (16, "v4_256x511", 256, 511, 33, 128),
    # v3-ish smaller H: Lh=128 (vh=112, kh_eff=17), Lw=511
    (16, "v3_128x511", 128, 511, 17, 128),
    (8, "auto", None, None, None, None),
    (8, "v4_256x511", 256, 511, 33, 128),
    (8, "v3_128x511", 128, 511, 17, 128),
    (32, "auto", None, None, None, None),
    # v4: Lh=128 (M=64, vh=96, kh_eff=33), Lw=511 (wc=256, vw=384)
    (32, "v4_128x511", 128, 511, 33, 128),
    # v4 narrower W overlap: Lw=447 (wc=224, vw=384, kw_eff=64)
    (32, "v4_128x447", 128, 447, 33, 64),
    (128, "auto", None, None, None, None),
    # v4: Lh=512 (M=256, vh=384, kh_eff=129), Lw=895 (wc=448, vw=768)
    (128, "v4_512x895", 512, 895, 129, 128),
    # v4 with wc=512 exact: Lw=1023 (vw=768, kw_eff=256)
    (128, "v4_512x1023", 512, 1023, 129, 256),
]

for K, label, lh, lw, pkh, pkw in CASES:
    N = 100
    kernels = jnp.asarray(
        rng.standard_normal((N, K, K, 1)).astype(np.float32)
    )
    tag = dict(K=K, label=label)
    try:
        if lh is None:
            sd = fc.fft_data_tiled(data, K, K, trim_mode="same")
        else:
            sd = fc.fft_data_tiled(
                data, pkh, pkw, block_h=lh, block_w=lw, trim_mode="same",
                trim_kernel_h=K, trim_kernel_w=K,
            )
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t = tfn(conv, sd, sk)
        got = np.array(conv(sd, sk)[1][:1, 300:364, 300:364])
        ref = np.array(
            fc.fft_conv(np.asarray(data), kernels=[np.asarray(kernels[0])],
                        mode="same", algorithm="direct")[0]
        )[300:364, 300:364]
        err = float(np.max(np.abs(got[0] - ref)) / np.max(np.abs(ref)))
        emit(kind="envelope", ms=round(t, 2),
             gpixf=round(H * W * N / 1e9 / t * 1e3, 2),
             rel_err=float(f"{err:.2e}"),
             blocks=[sd.block_h, sd.block_w], **tag)
        del sd, sk
    except Exception as e:
        emit(kind="envelope", error=repr(e)[:250], **tag)
    del kernels
emit(kind="done")
