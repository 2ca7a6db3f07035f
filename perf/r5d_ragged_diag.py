#!/usr/bin/env python
"""Round-5d: why is the fused RaggedConvStream slower than the bucketed
one-shot API (r5c: 18.4-24.0 vs 5.8 ms/frame)? Decompose: (1) the
stream's two-dispatch submit (exec + separate probe jit) vs (2) a
single-dispatch probed fused program, (3) each group plan timed alone,
(4) the one-shot baseline, (5) a trace of fft_conv's auto engines per
bucket for comparison."""
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
from cuda_fft_convolution_tpu.runtime.plan import make_plan  # noqa: E402


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


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(11)
emit(kind="start", backend=jax.default_backend())
F = 1
frame = jnp.asarray(rng.standard_normal((512, 512, F)).astype(np.float32))
cells = [
    jnp.asarray(rng.standard_normal((k, k, F)).astype(np.float32))
    for k in (9, 17, 33, 64)
    for _ in range(4)
]
jax.block_until_ready(frame)
gpixf = 512 * 512 * len(cells) / 1e9

for alg in ("tiled", "direct"):
    groups: dict = {}
    for i, k in enumerate(cells):
        groups.setdefault(tuple(k.shape), []).append(i)
    plans = [
        make_plan((512, 512, F), (len(idx),) + shape, algorithm=alg,
                  mode="same")
        for shape, idx in groups.items()
    ]
    kffts = tuple(
        p.kernel_fft(jnp.stack([cells[i] for i in idx]))
        for p, idx in zip(plans, groups.values())
    )
    jax.block_until_ready(kffts)

    # (3) each group alone, single-dispatch probed
    for p, kf, shape in zip(plans, kffts, groups.keys()):
        fn = probed(lambda fr, _p=p, _kf=kf: _p.trace_frame(fr, _kf))
        ms = tfn(fn, frame)
        emit(case=f"group_{alg}_{shape[0]}", ms_frame=round(ms, 2))
    # (2) fused single-dispatch probed
    fused = probed(
        lambda fr: tuple(p.trace_frame(fr, kf)
                         for p, kf in zip(plans, kffts))
    )
    ms = tfn(fused, frame)
    emit(case=f"fused_probed_{alg}", ms_frame=round(ms, 2),
         gpixf=round(gpixf / ms * 1e3, 3))
    del plans, kffts, fused
    gc.collect()

# (4) one-shot API baseline at sync9 for like-for-like
one = probed(
    lambda d: jnp.concatenate([
        jnp.ravel(o) for o in fc.fft_conv(d, kernels=cells, mode="same")
    ])
)
ms = tfn(one, frame)
emit(case="oneshot_api_sync9", ms_frame=round(ms, 2),
     gpixf=round(gpixf / ms * 1e3, 3))
emit(kind="done")
