#!/usr/bin/env python
"""Round-4g: v5 (radix-2 DIF W stage) peaks kernel vs the v4 one, on-chip.

Round 4b moved the fp32 F=1 conv headline to the v5 DIF plan (35.7 vs
44.4 ms — the (256, 512) blocks' lane-aligned Wc2=256 spectra kill the
(256, 511) plan's 257→384 lane-tile pad), but the detection head stayed
v4 at (256, 511): the autotune comment argued the peaks kernel "has no
W-radix stage". block_conv_peaks_pallas now HAS one
(_make_kernel_v5_peaks: per-segment (max, argmax) reduction over the
P+Q / P−Q DIF halves — interpret parity pinned in tests/test_detect.py).
This script measures whether the same lane-alignment win carries to the
peaks epilogue at the fp32 F=1 serving config, and if so what
(MBH, MBW) group; registration follows measurement (the F=31/fused-deny
lesson: legality ≠ profit).

NOTE: the v5-peaks kernel is a NEW Mosaic family — first compile through
the remote service can take 30-60 min; siblings minutes.
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


rng = np.random.default_rng(17)
emit(kind="start", backend=jax.default_backend())

from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_peaks_pallas, radix_h_legal, radix_w_legal,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402

H = Wd = 2048
N, F = 100, 1
KH = KW = 64
data_hwf = rng.standard_normal((H, Wd, F)).astype(np.float32)
bank = rng.standard_normal((N, KH, KW, F)).astype(np.float32)
data = jnp.asarray(np.moveaxis(data_hwf, -1, 0))[None]  # (1, F, H, W)

# ---- kernel level: v4 @ (256,511) [tuned baseline] vs v5 @ (256,512) ----
cases = [
    ("v4_511", 256, 511, 65, 128, dict(radix_h=True), None),
    ("v5_512_g22", 256, 512, 65, 129, dict(radix_w=True), (2, 2)),
    ("v5_512_g11", 256, 512, 65, 129, dict(radix_w=True), (1, 1)),
    ("v5_512_g21", 256, 512, 65, 129, dict(radix_w=True), (2, 1)),
]
parity = {}
for label, bh, bw, pkh, pkw, kw_args, group in cases:
    vh, vw = bh - pkh + 1, bw - pkw + 1
    assert radix_h_legal(bh, vh)
    if kw_args.get("radix_w"):
        assert radix_w_legal(bw, pkw, vw)
    d_re, d_im = fft_data_blocks(
        data, bh, bw, pkh, pkw, origin_h=pkh // 2, origin_w=pkw // 2,
        win_h=H, win_w=Wd,
    )
    k_re = jnp.asarray(
        rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
    )
    # shared-geometry spectra so parity can compare across plans: use the
    # REAL bank through the API instead for the end-to-end check below;
    # here parity is within-plan (v5 vs v4 at the same 512 blocks)
    k_im = jnp.asarray(
        rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
    )
    row = {"case": label, "blocks": [bh, bw], "group": group}
    try:
        g = {} if group is None else {"mbh": group[0], "mbw": group[1]}
        fn = probed(
            lambda dr, di, kr, ki, _kw=kw_args, _g=g, _bh=bh, _bw=bw,
            _ph=pkh, _pw=pkw: block_conv_peaks_pallas(
                dr, di, kr, ki, _bh, _bw, _ph, _pw, H, Wd, **_kw, **_g
            )
        )
        row["ms"] = round(tfn(fn, d_re, d_im, k_re, k_im), 1)
        row["ms_stream"] = round(
            tfn(fn, d_re, d_im, k_re, k_im, iters=18, sync_every=9), 1
        )
        _, (vals, idxs) = fn(d_re, d_im, k_re, k_im)
        cells = np.asarray(vals).reshape(N, -1)
        ci = cells.argmax(axis=1)
        parity[label] = (
            cells[np.arange(N), ci],
            np.asarray(idxs).reshape(N, -1)[np.arange(N), ci],
        )
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    emit(**row)
    del d_re, d_im, k_re, k_im
    drain()

# within-512-blocks parity (v5 groups vs each other; v4_511 used different
# random spectra so it's timing-only)
ref = parity.get("v5_512_g11")
for label in ("v5_512_g22", "v5_512_g21"):
    if ref is not None and label in parity:
        v, i = parity[label]
        emit(case=f"parity_{label}_vs_g11",
             val_match=bool(np.allclose(v, ref[0], rtol=1e-5)),
             idx_match=int(np.sum(i == ref[1])), n=N)

# ---- end-to-end API: current tuned plan vs the v5 plan registered ----
from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    _RADIX_W_TABLE_PEAKS, register_radix_w_plan,
)
from cuda_fft_convolution_tpu.runtime.autotune import (  # noqa: E402
    register_tuned_geometry, _MEASURED,
)

data_j = jnp.asarray(data_hwf)
bank_j = jnp.asarray(bank)
sd = fc.fft_data_tiled(data_j, KH, KW, trim_mode="same")
sk = fc.fft_kernels(bank_j, spectral=sd, storage="planar",
                    correlation=True)
jax.block_until_ready((sd.re, sk.re))
peaks = probed(lambda s, k: detect_peaks(s, k, mode="same"))
row = {"case": "api_baseline_tuned"}
try:
    row["ms"] = round(tfn(peaks, sd, sk), 1)
    row["ms_stream"] = round(tfn(peaks, sd, sk, iters=18, sync_every=9), 1)
    _, (v0, p0) = peaks(sd, sk)
    v0, p0 = np.asarray(v0), np.asarray(p0)
except Exception as e:  # noqa: BLE001
    row["err"] = repr(e)[:200]
    v0 = p0 = None
emit(**row)
del sd, sk
drain()

# register the v5 peaks plan + geometry, rebuild spectra at 512 blocks
register_radix_w_plan(256, 512, 129, head="peaks")
register_tuned_geometry(
    64, 64, 192, 384, f=1, fused=True, block_h=256, block_w=512,
    head="peaks",
)
try:
    sd5 = fc.fft_data_tiled(
        data_j, 65, 129, block_h=256, block_w=512, trim_mode="same",
        trim_kernel_h=KH, trim_kernel_w=KW,
    )
    sk5 = fc.fft_kernels(bank_j, spectral=sd5, storage="planar",
                         correlation=True)
    jax.block_until_ready((sd5.re, sk5.re))
    row = {"case": "api_v5_registered"}
    try:
        row["ms"] = round(tfn(peaks, sd5, sk5), 1)
        row["ms_stream"] = round(
            tfn(peaks, sd5, sk5, iters=18, sync_every=9), 1
        )
        _, (v5v, p5v) = peaks(sd5, sk5)
        if v0 is not None:
            row["val_match"] = bool(
                np.allclose(np.asarray(v5v), v0, rtol=1e-4)
            )
            row["pos_match"] = int(
                np.sum(np.all(np.asarray(p5v) == p0, axis=-1))
            )
            row["n_kernels"] = N
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    emit(**row)
finally:
    _RADIX_W_TABLE_PEAKS.discard((256, 512, 129, 4, 1))
    _MEASURED.pop((64, 64, 1, "f32", "peaks"), None)
emit(kind="done")
