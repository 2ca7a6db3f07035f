#!/usr/bin/env python
"""Round-4c: end-to-end measurements after the v5/peaks integration.

  1. fft_conv auto at the fp32 headline — the tuned plan is now the v5
     DIF (256,512)/(65,129) geometry with radix_w registered: the row
     should drop from ~44.6 ms one-shot / ~19 ms streamed toward the
     kernel-level 35.7 / ~13.
  2. detect_peaks API at the peaks-tuned plans (bf16 now plans (256,511)
     instead of the conv-tuned (128,511)) with the cheaper reduction
     epilogue (broadcast -inf masks, hoisted flat iota) — streamed
     ms/frame vs the maps rows.
  3. conv_spectral maps at the same spectra for the like-for-like delta.
"""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.models import detect_peaks
from cuda_fft_convolution_tpu.ops.tiled import choose_block_plan


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


rng = np.random.default_rng(17)
H = Wd = 2048
N, K = 100, 64
emit(kind="start", backend=jax.default_backend())

# ---- 1. fp32 headline through fft_conv auto (v5 plan + radix_w) -------
data_hwf = jnp.asarray(rng.standard_normal((H, Wd, 1)).astype(np.float32))
bank = jnp.asarray(rng.standard_normal((N, K, K, 1)).astype(np.float32))
plan = choose_block_plan(H, Wd, K, K)
emit(case="headline_plan", plan=list(plan) if plan else None)
conv_auto = probed(
    lambda d, k: fc.fft_conv(d, kernels=k, mode="same")
)
row = {"case": "headline_f32_auto"}
try:
    row["ms"] = round(tfn(conv_auto, data_hwf, bank), 1)
    row["ms_stream"] = round(
        tfn(conv_auto, data_hwf, bank, iters=18, sync_every=9), 2
    )
    row["gpixf_stream"] = round(
        H * Wd * N / 1e9 / (row["ms_stream"] / 1e3), 2
    )
except Exception as e:  # noqa: BLE001
    row["err"] = repr(e)[:200]
emit(**row)
# parity vs the direct engine at a slice
try:
    _, auto_out = conv_auto(data_hwf, bank)
    direct = probed(
        lambda d, k: fc.fft_conv(d, kernels=k, mode="same",
                                 algorithm="direct")
    )
    _, want = direct(data_hwf, bank)
    rel = jax.jit(
        lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b))
    )(auto_out, want)
    emit(case="headline_parity", rel=float(np.asarray(rel)))
    del auto_out, want
except Exception as e:  # noqa: BLE001
    emit(case="headline_parity", err=repr(e)[:200])
drain()

# ---- 2/3. peaks vs maps at the peaks-tuned plans -----------------------
for label, dt in (("bf16", "bfloat16"), ("f32", "float32")):
    pk_plan = choose_block_plan(H, Wd, K, K, store_dtype=dt, head="peaks")
    emit(case=f"peaks_plan_{label}", plan=list(pk_plan) if pk_plan else None)
    if pk_plan is None:
        continue
    lh, lw, pkh, pkw = pk_plan
    sd = fc.fft_data_tiled(
        data_hwf, pkh, pkw, block_h=lh, block_w=lw, trim_mode="same",
        trim_kernel_h=K, trim_kernel_w=K, store_dtype=dt,
    )
    sk = fc.fft_kernels(bank, spectral=sd, store_dtype=dt,
                        storage="planar", correlation=True)
    jax.block_until_ready((sd.re, sk.re))
    row = {"case": f"peaks_api_{label}"}
    peaks = probed(lambda s, k: detect_peaks(s, k, mode="same"))
    conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    try:
        row["peaks_ms"] = round(tfn(peaks, sd, sk), 1)
        row["peaks_ms_stream"] = round(
            tfn(peaks, sd, sk, iters=18, sync_every=9), 2
        )
        row["maps_ms_stream"] = round(
            tfn(conv, sd, sk, iters=18, sync_every=9), 2
        )
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    if "peaks_ms" in row:
        _, maps = conv(sd, sk)
        _, (vals, pos) = peaks(sd, sk)
        flat = jax.jit(
            lambda mm: jnp.argmax(mm.reshape(mm.shape[0], -1), -1)
        )(maps)
        wpos = np.asarray(flat)
        gpos = (np.asarray(pos[:, 0]) * maps.shape[-1]
                + np.asarray(pos[:, 1]))
        row["peak_match"] = int(np.sum(wpos == gpos))
        del maps, vals, pos
    emit(**row)
    del sd, sk
    drain()
emit(kind="done")

# ---- 4. (MBH, MBW) group sweep at the v5 plan --------------------------
# The analytic _choose_group was tuned for v4-family plans; the v5 DIF
# kernel's VMEM/amortization balance may prefer a different group.
from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_pallas,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402

bh, bw, pkh, pkw = 256, 512, 65, 129
data_cf = jnp.transpose(data_hwf, (2, 0, 1))[None]
d_re, d_im = fft_data_blocks(data_cf, bh, bw, pkh, pkw,
                             origin_h=pkh // 2, origin_w=pkw // 2,
                             win_h=H, win_w=Wd)
k_re = jnp.asarray(
    rng.standard_normal((N, 1, bh, bw // 2 + 1)).astype(np.float32)
)
k_im = jnp.asarray(
    rng.standard_normal((N, 1, bh, bw // 2 + 1)).astype(np.float32)
)
jax.block_until_ready((d_re, k_re))
for mbh, mbw in ((1, 1), (2, 1), (1, 2), (2, 2), (4, 1), (4, 2)):
    row = {"case": "v5_group", "group": [mbh, mbw]}
    try:
        fn = probed(lambda a, b, c, d, _h=mbh, _w=mbw: block_conv_pallas(
            a, b, c, d, bh, bw, pkh, pkw, H, Wd,
            radix_h=True, radix_w=True, mbh=_h, mbw=_w))
        row["ms"] = round(tfn(fn, d_re, d_im, k_re, k_im), 1)
        row["ms_stream"] = round(
            tfn(fn, d_re, d_im, k_re, k_im, iters=18, sync_every=9), 2
        )
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    emit(**row)
    drain()
emit(kind="done_groups")
