#!/usr/bin/env python
"""Round-4g follow-up: v5-peaks END-TO-END with working invalidation.

The first r4g run exposed a dispatch-staleness bug: register_radix_w_plan
cleared only the kernel wrappers, so the already-traced conv_blocks_peaks
kept serving v4 — the 'api_v5_registered' row was v4@512 twice (and its
parity check compared v4 with itself). With invalidate_jit_consumers()
in place this script measures the real story at the fp32 F=1 serving
config (2048² × 100 64² kernels, 'same'):

  1. v4-peaks @ the tuned (256,511) plan    (today's dispatch)
  2. v4-peaks @ (256,512)                   (same spectra as v5, no DIF)
  3. v5-peaks @ (256,512) via registration  (candidate)

with ONE shared bank so values/positions must agree across all three
(positions exactly; values to fp tolerance).
"""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.models import detect_peaks


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4].astype(jnp.float32), out
    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=5, sync_every=1):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        for _ in range(min(sync_every, iters - done)):
            p, _ = fn(*a)
            done += 1
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(23)
emit(kind="start", backend=jax.default_backend())

from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    _RADIX_W_TABLE_PEAKS, register_radix_w_plan,
)

H = Wd = 2048
N, F, K = 100, 1, 64
data_j = jnp.asarray(rng.standard_normal((H, Wd, F)).astype(np.float32))
bank_j = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))

results = {}

# (label, block_h, block_w, register_v5)
plans = [
    ("v4_tuned_511", 256, 511, False),
    ("v4_at_512", 256, 512, False),
    ("v5_at_512", 256, 512, True),
]
for label, bh, bw, reg in plans:
    sd = fc.fft_data_tiled(
        data_j, 65, bw - 384 + 1, block_h=bh, block_w=bw,
        trim_mode="same", trim_kernel_h=K, trim_kernel_w=K,
    )
    sk = fc.fft_kernels(bank_j, spectral=sd, storage="planar",
                        correlation=True)
    jax.block_until_ready((sd.re, sk.re))
    if reg:
        register_radix_w_plan(bh, bw, bw - 384 + 1, head="peaks")
    # fresh jit wrapper per case: v4_at_512 and v5_at_512 share avals, so
    # a shared wrapper would serve the earlier case's stale executable
    peaks = probed(lambda s, k: detect_peaks(s, k, mode="same"))
    row = {"case": label, "blocks": [bh, bw]}
    try:
        row["ms"] = round(tfn(peaks, sd, sk), 1)
        row["ms_stream"] = round(
            tfn(peaks, sd, sk, iters=18, sync_every=9), 1
        )
        _, (v, p) = peaks(sd, sk)
        results[label] = (np.asarray(v), np.asarray(p))
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    finally:
        if reg:
            _RADIX_W_TABLE_PEAKS.discard((bh, bw, bw - 384 + 1, 4, 1))
    emit(**row)
    del sd, sk
    drain()

ref = results.get("v4_tuned_511")
for label in ("v4_at_512", "v5_at_512"):
    if ref is not None and label in results:
        v, p = results[label]
        emit(case=f"parity_{label}_vs_tuned",
             val_match=bool(np.allclose(v, ref[0], rtol=1e-4)),
             pos_match=int(np.sum(np.all(p == ref[1], axis=-1))), n=N)
emit(kind="done")
