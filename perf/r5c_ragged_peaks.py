#!/usr/bin/env python
"""Round-5c: (1) the fused single-dispatch RaggedConvStream at the bench
cell-array config (512² × 16 cells of 9/17/33/64), tiled vs direct group
plans, vs the round-4 one-shot-API baseline — VERDICT #5's ≥1.0 GPix·F/s
(≤ ~4.2 ms/frame) bar; (2) the autotune table's missing detection-head
cells (VERDICT #7): 32²-envelope bf16 peaks and F=8 bf16 peaks, candidate
plans A/B'd through the detect_peaks API."""
import gc
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cuda_fft_convolution_tpu as fc  # noqa: E402
from cuda_fft_convolution_tpu.models import detect_peaks  # noqa: E402


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=18, sync_every=9):
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


def t_stream(stream, frame, iters=18, sync_every=9):
    fut = stream.submit(frame)
    fut.result()
    stream.flush()
    t0 = time.perf_counter()
    fut = None
    done = 0
    while done < iters:
        for _ in range(min(sync_every, iters - done)):
            fut = stream.submit(frame)
            done += 1
        fut.result()
    return (time.perf_counter() - t0) / iters * 1e3


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(11)
emit(kind="start", backend=jax.default_backend())

# ---------------- (1) ragged serving ----------------
F = 1
rag_data = jnp.asarray(rng.standard_normal((512, 512, F)).astype(np.float32))
rag_cells = [
    jnp.asarray(rng.standard_normal((k, k, F)).astype(np.float32))
    for k in (9, 17, 33, 64)
    for _ in range(4)
]
jax.block_until_ready(rag_data)
gpixf = 512 * 512 * len(rag_cells) / 1e9
# round-4 baseline: the bucketed one-shot API per frame
rag_fn = probed(
    lambda d: jnp.concatenate([
        jnp.ravel(o)
        for o in fc.fft_conv(d, kernels=rag_cells, mode="same")
    ])
)
ms = tfn(rag_fn, rag_data, iters=12, sync_every=6)
emit(case="ragged_oneshot_api_sync6", ms_frame=round(ms, 2),
     gpixf=round(gpixf / ms * 1e3, 3))
for alg in ("tiled", "direct"):
    try:
        stream = fc.RaggedConvStream(
            (512, 512, F), rag_cells, depth=9, algorithm=alg, mode="same"
        )
        ms = t_stream(stream, rag_data)
        emit(case=f"ragged_stream_{alg}_sync9", ms_frame=round(ms, 2),
             gpixf=round(gpixf / ms * 1e3, 3))
        # parity vs the bucketed one-shot (on-device reduce — maps are
        # ~16 MB each and D2H through this tunnel is ~1.4 MB/s)
        maps = stream.submit(rag_data).result()
        want = fc.fft_conv(rag_data, kernels=rag_cells, mode="same")
        relfn = probed(
            lambda gs, ws: jnp.max(jnp.stack([
                jnp.max(jnp.abs(g - w)) / (jnp.max(jnp.abs(w)) + 1e-30)
                for g, w in zip(gs, ws)
            ]))
        )
        emit(case=f"ragged_stream_{alg}_parity",
             rel=float(np.asarray(relfn(tuple(maps), tuple(want))[0][0])))
        stream.flush()
        del stream
    except Exception as e:  # noqa: BLE001
        emit(case=f"ragged_stream_{alg}_sync9", err=repr(e)[:220])
    gc.collect()
del rag_data, rag_cells
gc.collect()

# ---------------- (2) peaks autotune cells ----------------
# 32²-envelope bf16 peaks (1024² × 64 of 32², F=1): candidates = the
# tier's conv plan (128,511) fallback vs the taller-cell (256,511)
# (the r4b lesson: the peaks epilogue amortizes per grid step).
data32 = jnp.asarray(rng.standard_normal((1024, 1024, 1)).astype(np.float32))
bank32 = jnp.asarray(rng.standard_normal((64, 32, 32, 1)).astype(np.float32))
gp32 = 1024 * 1024 * 64 / 1e9
for tag, bh, bw, pkh, pkw in (
    ("pk32_bf16_128x511", 128, 511, 33, 128),
    ("pk32_bf16_256x511", 256, 511, 65, 128),
):
    try:
        sd = fc.fft_data_tiled(
            data32, pkh, pkw, block_h=bh, block_w=bw, trim_mode="same",
            trim_kernel_h=32, trim_kernel_w=32, store_dtype="bfloat16",
        )
        sk = fc.fft_kernels(
            bank32, spectral=sd, store_dtype="bfloat16",
            storage="planar", correlation=True,
        )
        jax.block_until_ready((sd.re, sk.re))
        fn = probed(lambda s, k: detect_peaks(s, k, mode="same"))
        ms = tfn(fn, sd, sk)
        emit(case=tag, ms_frame=round(ms, 2),
             gpixf=round(gp32 / ms * 1e3, 2))
        del sd, sk
    except Exception as e:  # noqa: BLE001
        emit(case=tag, err=repr(e)[:220])
    gc.collect()

# F=8 bf16 peaks (the dpm_f8 config, 1024² × 64 of 32², F=8): the conv
# entry (256,511) vs the half-height (128,511).
data8 = jnp.asarray(
    rng.standard_normal((1024, 1024, 8)).astype(np.float32)
)
bank8 = jnp.asarray(
    rng.standard_normal((64, 32, 32, 8)).astype(np.float32)
)
for tag, bh, bw, pkh, pkw in (
    ("pkF8_bf16_256x511", 256, 511, 65, 128),
    ("pkF8_bf16_128x511", 128, 511, 33, 128),
):
    try:
        sd = fc.fft_data_tiled(
            data8, pkh, pkw, block_h=bh, block_w=bw, trim_mode="same",
            trim_kernel_h=32, trim_kernel_w=32, store_dtype="bfloat16",
        )
        sk = fc.fft_kernels(
            bank8, spectral=sd, store_dtype="bfloat16",
            storage="planar", correlation=True,
        )
        jax.block_until_ready((sd.re, sk.re))
        fn = probed(lambda s, k: detect_peaks(s, k, mode="same"))
        ms = tfn(fn, sd, sk)
        emit(case=tag, ms_frame=round(ms, 2),
             gpixf=round(gp32 / ms * 1e3, 2))
        del sd, sk
    except Exception as e:  # noqa: BLE001
        emit(case=tag, err=repr(e)[:220])
    gc.collect()
emit(kind="done")
