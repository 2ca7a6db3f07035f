#!/usr/bin/env python
"""Round-5a: the v5x kernel (XLA-hoisted Nyquist sliver + rank-1 MXU
update) A/B'd against every regime where the v5 in-kernel sliver was the
diagnosed loss (VERDICT r4 #1 / PERF.md rounds 4b + 4e):

  A. bf16io headline (2048²×100 of 64²) — the production serving tier,
     still on the dense/v3-v4 W stage: tier-tuned baselines vs v5x at
     (256,512), plus the out_dtype='bfloat16' composition (VERDICT #3).
  B. fp32 headline — v5 (builtin) vs v5x; if v5x wins here too the
     builtin flips to sliver='xla'.
  C. F ∈ {2, 4} fp32 (the r4e losers) and F = 8 bf16 at (256,512).
  D. peaks head — f32 v5-peaks vs v5x-peaks; bf16 v3-peaks (tier
     baseline) vs v5x-peaks.

Kernel-level (block_conv_pallas / block_conv_peaks_pallas direct), maps
streamed sync/9 like the bench serving rows; on-chip parity reduced
on-device (complex/maps never fetched)."""
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

from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_pallas,
    block_conv_peaks_pallas,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = out[0] if isinstance(out, tuple) else out
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
emit(kind="start", backend=jax.default_backend(),
     device=str(jax.devices()[0]))


def blocks_for(data, bh, bw, pkh, pkw, dt):
    d_re, d_im = fft_data_blocks(
        data, bh, bw, pkh, pkw, origin_h=pkh // 2, origin_w=pkw // 2,
        win_h=H, win_w=Wd,
    )
    return d_re.astype(dt), d_im.astype(dt)


def bank_for(n, f, bh, bw, dt, seed=7):
    r = np.random.default_rng(seed)
    k_re = jnp.asarray(
        r.standard_normal((n, f, bh, bw // 2 + 1)).astype(np.float32)
    ).astype(dt)
    k_im = jnp.asarray(
        r.standard_normal((n, f, bh, bw // 2 + 1)).astype(np.float32)
    ).astype(dt)
    return k_re, k_im


def run_case(tag, d_re, d_im, k_re, k_im, bh, bw, pkh, pkw, peaks=False,
             **kwargs):
    row = {"case": tag}
    try:
        if peaks:
            fn = probed(
                lambda a, b, c, d, _k=dict(kwargs): block_conv_peaks_pallas(
                    a, b, c, d, bh, bw, pkh, pkw, H, Wd, **_k)
            )
        else:
            fn = probed(
                lambda a, b, c, d, _k=dict(kwargs): block_conv_pallas(
                    a, b, c, d, bh, bw, pkh, pkw, H, Wd, **_k)
            )
        row["ms_stream"] = round(tfn(fn, d_re, d_im, k_re, k_im), 2)
        row["gpixf"] = round(
            H * Wd * k_re.shape[0] / row["ms_stream"] / 1e6, 2
        )
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:220]
    emit(**row)
    return row


# ---------------- Part A+B: headline F=1 ----------------
F, N = 1, 100
data = jnp.asarray(rng.standard_normal((1, F, H, Wd)).astype(np.float32))

# on-chip parity first (small bank): v5x vs v3 at both tiers
d32 = blocks_for(data, 256, 512, 65, 129, jnp.float32)
k32 = bank_for(4, F, 256, 512, jnp.float32)
try:
    ref = block_conv_pallas(*d32, *k32, 256, 512, 65, 129, H, Wd,
                            radix_h=False, wstack=True)
    got = block_conv_pallas(*d32, *k32, 256, 512, 65, 129, H, Wd,
                            radix_h=True, radix_w=True, xsliver=True)
    sc = jnp.max(jnp.abs(ref))
    emit(case="parity_f32_v5x_vs_v3", rel=float(np.asarray(
        probed(lambda a, b: a / b)(jnp.max(jnp.abs(got - ref)), sc)[0][0]
    )))
    del ref, got
except Exception as e:  # noqa: BLE001
    emit(case="parity_f32_v5x_vs_v3", err=repr(e)[:220])
del d32, k32
gc.collect()

for tier, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
    k511 = bank_for(N, F, 256, 511, dt)
    k128 = bank_for(N, F, 128, 511, dt)
    k512 = bank_for(N, F, 256, 512, dt)
    d511 = blocks_for(data, 256, 511, 65, 128, dt)
    d128 = blocks_for(data, 128, 511, 65, 128, dt)
    d512 = blocks_for(data, 256, 512, 65, 129, dt)
    jax.block_until_ready((d511[0], d128[0], d512[0]))
    if tier == "bf16":
        # tier-tuned baseline (autotune (64,64,1,bf16) → (128,511))
        run_case("bf16_v3_128x511_tuned", *d128, *k128, 128, 511, 65, 128)
        run_case("bf16_v4_256x511", *d511, *k511, 256, 511, 65, 128,
                 radix_h=True)
        run_case("bf16_v5_256x512", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True)
        run_case("bf16_v5x_256x512", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True, xsliver=True)
        run_case("bf16_v5x_256x512_g22", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True, xsliver=True, mbh=2, mbw=2)
        run_case("bf16_v5x_256x512_g12", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True, xsliver=True, mbh=1, mbw=2)
        # out_dtype composition (VERDICT #3): bf16 spectra + bf16 maps
        run_case("bf16_v3_128x511_bf16out", *d128, *k128, 128, 511, 65,
                 128, out_dtype="bfloat16")
        run_case("bf16_v5x_256x512_g22_bf16out", *d512, *k512, 256, 512,
                 65, 129, radix_h=True, radix_w=True, xsliver=True,
                 mbh=2, mbw=2, out_dtype="bfloat16")
    else:
        # fp32: v5 builtin (g(2,2) pinned) vs v5x
        run_case("f32_v5_256x512_g22", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True, mbh=2, mbw=2)
        run_case("f32_v5x_256x512_g22", *d512, *k512, 256, 512, 65, 129,
                 radix_h=True, radix_w=True, xsliver=True, mbh=2, mbw=2)
        run_case("f32_v5x_256x512_g22_bf16out", *d512, *k512, 256, 512,
                 65, 129, radix_h=True, radix_w=True, xsliver=True,
                 mbh=2, mbw=2, out_dtype="bfloat16")
        run_case("f32_v5_256x512_g22_bf16out", *d512, *k512, 256, 512,
                 65, 129, radix_h=True, radix_w=True, mbh=2, mbw=2,
                 out_dtype="bfloat16")
    # ---------------- Part D: peaks ----------------
    if tier == "bf16":
        run_case("bf16_peaks_v3_256x511", *d511, *k511, 256, 511, 65,
                 128, peaks=True, radix_h=False)
        run_case("bf16_peaks_v5x_256x512", *d512, *k512, 256, 512, 65,
                 129, peaks=True, radix_w=True, xsliver=True)
    else:
        run_case("f32_peaks_v5_256x512", *d512, *k512, 256, 512, 65,
                 129, peaks=True, radix_w=True)
        run_case("f32_peaks_v5x_256x512", *d512, *k512, 256, 512, 65,
                 129, peaks=True, radix_w=True, xsliver=True)
    del k511, k128, k512, d511, d128, d512
    gc.collect()

# ---------------- Part C: multi-F ----------------
NC = 32
for F in (2, 4):
    dataf = jnp.asarray(
        rng.standard_normal((1, F, H, Wd)).astype(np.float32)
    )
    d511 = blocks_for(dataf, 256, 511, 65, 128, jnp.float32)
    d512 = blocks_for(dataf, 256, 512, 65, 129, jnp.float32)
    k511 = bank_for(NC, F, 256, 511, jnp.float32)
    k512 = bank_for(NC, F, 256, 512, jnp.float32)
    jax.block_until_ready((d511[0], d512[0]))
    run_case(f"f32_F{F}_v4_256x511_tuned", *d511, *k511, 256, 511, 65,
             128, radix_h=True)
    run_case(f"f32_F{F}_v5x_256x512", *d512, *k512, 256, 512, 65, 129,
             radix_h=True, radix_w=True, xsliver=True)
    del dataf, d511, d512, k511, k512
    gc.collect()

# F=8 bf16 at the tier-tuned (256,511) v4 vs v5x (VMEM may abort — the
# model says it is over the bf16 bar; measured answer either way)
F = 8
dataf = jnp.asarray(rng.standard_normal((1, F, H, Wd)).astype(np.float32))
d511 = blocks_for(dataf, 256, 511, 65, 128, jnp.bfloat16)
d512 = blocks_for(dataf, 256, 512, 65, 129, jnp.bfloat16)
k511 = bank_for(NC, F, 256, 511, jnp.bfloat16)
k512 = bank_for(NC, F, 256, 512, jnp.bfloat16)
jax.block_until_ready((d511[0], d512[0]))
run_case("bf16_F8_v4_256x511_tuned", *d511, *k511, 256, 511, 65, 128,
         radix_h=True, mbh=1, mbw=1)
run_case("bf16_F8_v5x_256x512", *d512, *k512, 256, 512, 65, 129,
         radix_h=True, radix_w=True, xsliver=True, mbh=1, mbw=1)
emit(kind="done")
