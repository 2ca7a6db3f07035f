#!/usr/bin/env python
"""bf16-tier direct-engine variants: the native-bf16 MAC wants F-minor
(2,1)-tiled operands and XLA hoists the whole-bank relayout out of the
chunk loop (576-kernel bank: compile OOM, two 5 GB copies). Measure
(a) FFTCONV_BF16_MAC_UPCAST=1: f32 dots fed by converts fused into the
operand reads — bf16 bytes off HBM, no layout constraint; at 288 vs the
native-bf16 53.1 ms and at 576 for feasibility (the capacity story:
576 bf16 kernels resident in the HBM of 288 f32 ones);
(b) conv_spectral_pipelined at 576 (host-side chunk dispatch bounds any
relayout to a chunk).
"""
import gc, json, os, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ["FFTCONV_BF16_MAC_UPCAST"] = sys.argv[1] if len(sys.argv) > 1 else "1"
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc

UP = os.environ["FFTCONV_BF16_MAC_UPCAST"]


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4].astype(jnp.float32), out
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


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
KD = 12
bank = jnp.asarray(
    rng.standard_normal((576, KD, KD, 31)).astype(np.float32)
)

sd16 = fc.fft_data(feats, KD, KD, store_dtype="bfloat16")
for nkd in (288, 576):
    drain()
    sk = fc.fft_kernels(bank[:nkd], spectral=sd16, store_dtype="bfloat16")
    np.asarray(probed(lambda a: a[0, 0, :16])(sk.re)[0])
    convd = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
    try:
        t = tfn(convd, sd16, sk)
        emit(kind=f"direct_bf16_upcast{UP}_{nkd}", ms=round(t, 1),
             gpixf=round(512 * 512 * nkd / 1e9 / (t / 1e3), 2))
    except Exception as e:
        emit(kind=f"direct_bf16_upcast{UP}_{nkd}", error=repr(e)[:300])
    if nkd == 576:
        drain()
        convp = probed(
            lambda s, k: fc.conv_spectral_pipelined(s, k, chunk_size=96)
        )
        try:
            t = tfn(convp, sd16, sk)
            emit(kind=f"pipelined_bf16_upcast{UP}_576", ms=round(t, 1),
                 gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
        except Exception as e:
            emit(kind=f"pipelined_bf16_upcast{UP}_576", error=repr(e)[:300])
    del sk, convd
    drain()
emit(kind="done")
