#!/usr/bin/env python
"""Round-5b: (a) on-chip parity of the precision-fixed v5x (the XLA-side
sliver einsums now run HIGHEST — r5a measured 6.3e-5 at DEFAULT, over the
fp32 bar), (b) the bf16 v5x winner at its measured group (1,3) with the
out_dtype composition, (c) END-TO-END through production dispatch with
the round-5 registrations applied in-process (tuned geometry (64,64,1,
bf16) → (256,512), radix-w plan sliver='xla', group (1,3)): streamed +
one-shot conv, out_dtype='bfloat16' row, and on-device parity vs the
direct engine."""
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
from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_pallas,
    register_fused_group,
    register_radix_w_plan,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402
from cuda_fft_convolution_tpu.runtime.autotune import (  # noqa: E402
    register_tuned_geometry,
)


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


rng = np.random.default_rng(5)
H = Wd = 2048
N = 100
emit(kind="start", backend=jax.default_backend())

# (a) parity with the HIGHEST-precision sliver prologue
data = jnp.asarray(rng.standard_normal((1, 1, H, Wd)).astype(np.float32))
d32 = fft_data_blocks(data, 256, 512, 65, 129, origin_h=32, origin_w=64,
                      win_h=H, win_w=Wd)
k32 = tuple(
    jnp.asarray(rng.standard_normal((4, 1, 256, 257)).astype(np.float32))
    for _ in range(2)
)
ref = block_conv_pallas(*d32, *k32, 256, 512, 65, 129, H, Wd,
                        radix_h=False, wstack=True)
got = block_conv_pallas(*d32, *k32, 256, 512, 65, 129, H, Wd,
                        radix_h=True, radix_w=True, xsliver=True)
sc = jnp.max(jnp.abs(ref))
emit(case="parity_f32_v5x_fixed", rel=float(np.asarray(
    probed(lambda a, b: a / b)(jnp.max(jnp.abs(got - ref)), sc)[0][0]
)))
del ref, got, d32, k32
gc.collect()

# (b) kernel-level bf16 v5x at the measured default group (1,3) + bf16out
d16 = fft_data_blocks(data, 256, 512, 65, 129, origin_h=32, origin_w=64,
                      win_h=H, win_w=Wd)
d16 = (d16[0].astype(jnp.bfloat16), d16[1].astype(jnp.bfloat16))
k16 = tuple(
    jnp.asarray(rng.standard_normal((N, 1, 256, 257)).astype(np.float32))
    .astype(jnp.bfloat16)
    for _ in range(2)
)
jax.block_until_ready((d16[0], k16[0]))
for tag, kwargs in (
    ("bf16_v5x_g13", dict()),
    ("bf16_v5x_g13_bf16out", dict(out_dtype="bfloat16")),
):
    fn = probed(
        lambda a, b, c, d, _k=dict(kwargs): block_conv_pallas(
            a, b, c, d, 256, 512, 65, 129, H, Wd,
            radix_h=True, radix_w=True, xsliver=True, mbh=1, mbw=3, **_k)
    )
    ms = tfn(fn, *d16, *k16)
    emit(case=tag, ms_stream=round(ms, 2),
         gpixf=round(H * Wd * N / ms / 1e6, 2))
del d16, k16
gc.collect()

# (c) end-to-end through production dispatch with round-5 registrations
register_radix_w_plan(256, 512, 129, spec_bytes=2, f=1, sliver="xla")
register_fused_group(256, 257, 192, 384, 1, 2, 1, 3)
register_tuned_geometry(64, 64, 192, 384, f=1, fused=True, block_h=256,
                        block_w=512, store_dtype="bfloat16")

img = jnp.asarray(rng.standard_normal((H, Wd, 1)).astype(np.float32))
bank = jnp.asarray(
    rng.standard_normal((N, 64, 64, 1)).astype(np.float32)
)
sd = fc.fft_data_tiled(img, 64, 64, trim_mode="same",
                       store_dtype="bfloat16")
emit(case="api_plan", block=(sd.block_h, sd.block_w),
     env=(sd.max_kh, sd.max_kw))
sk = fc.fft_kernels(bank, spectral=sd, store_dtype="bfloat16",
                    storage="planar")
jax.block_until_ready((sd.re, sk.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
ms = tfn(conv, sd, sk)
emit(case="api_bf16_v5x_stream", ms_stream=round(ms, 2),
     gpixf=round(H * Wd * N / ms / 1e6, 2))
ms1 = tfn(conv, sd, sk, iters=3, sync_every=1)
emit(case="api_bf16_v5x_oneshot", ms=round(ms1, 2),
     gpixf=round(H * Wd * N / ms1 / 1e6, 2))
convb = probed(
    lambda s, k: fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16")
)
msb = tfn(convb, sd, sk)
emit(case="api_bf16_v5x_bf16out_stream", ms_stream=round(msb, 2),
     gpixf=round(H * Wd * N / msb / 1e6, 2))
# on-device parity vs the direct engine at the tier (tier envelope ~5e-3)
want = fc.conv_spectral(fc.fft_data(img, 64, 64), [bank[i] for i in
                        range(4)], mode="same")
want = jnp.stack([jnp.asarray(w) for w in want])
got = fc.conv_spectral(sd, fc.fft_kernels(bank[:4], spectral=sd,
                       store_dtype="bfloat16", storage="planar"),
                       mode="same")
rel = probed(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
emit(case="api_bf16_v5x_vs_direct_rel",
     rel=float(np.asarray(rel(jnp.asarray(got), want)[0][0])))
emit(kind="done")
