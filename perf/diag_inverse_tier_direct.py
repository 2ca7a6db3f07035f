"""Inverse-precision tier on the DIRECT-engine bench rows.

The direct engine's inverse transforms are its flop share (e.g. the
fftmap-parity config: 100 full 2160² inverse syntheses ≈ 5 TFLOP at
HIGHEST's 31 TF/s ≈ 160 ms of the ~240 ms call). Measures per-call wall
at inverse_precision='highest' vs the new 'high' default on:

  - fftmap parity (2048² × 100 64² kernels, direct, circular maps)
  - DPM giant bank (512²×31 features × 576 12² kernels, bf16 tier —
    EXPECTED UNCHANGED: the bf16 tier pins DEFAULT-precision bf16 dots)

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/diag_inverse_tier_direct.py
"""

import gc
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import cuda_fft_convolution_tpu as fc  # noqa: E402


def probed(fn):
    def wrapped(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def timeit(fn, *a, iters=3, warm=1, sync_every=1):
    for _ in range(warm):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    p = None
    for i in range(iters):
        p, _ = fn(*a)
        if (i + 1) % sync_every == 0:
            np.asarray(p)
    np.asarray(p)
    return (time.perf_counter() - t0) / iters


def drain():
    gc.collect()
    np.asarray(probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])


rng = np.random.default_rng(0)
H = W = 2048
N, KH, KW = 100, 64, 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kernels = jnp.asarray(
    rng.standard_normal((N, KH, KW, 1)).astype(np.float32)
)
jax.block_until_ready((data, kernels))
gpixf = H * W * N / 1e9

results = {}
for tier in ("highest", "high"):
    fc.set_config(inverse_precision=tier)
    sd = fc.fft_data(data, KH, KW)
    sk = fc.fft_kernels(kernels, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    conv = probed(lambda s, k: fc.conv_spectral(s, k))
    t_call = timeit(conv, sd, sk, iters=3)
    t_stream = timeit(conv, sd, sk, iters=8, sync_every=4)
    del sd, sk
    drain()
    results[f"fftmap_direct_{tier}"] = {
        "percall_ms": round(t_call * 1e3, 2),
        "GPixF_s": round(gpixf / t_call, 3),
        "stream4_GPixF_s": round(gpixf / t_stream, 3),
    }
    print(tier, json.dumps(results[f"fftmap_direct_{tier}"]), flush=True)

fc.set_config(inverse_precision="high")
print(json.dumps(results))
