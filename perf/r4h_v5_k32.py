#!/usr/bin/env python
"""Round-4h: does the v5 DIF W stage pay at the 32²-kernel envelope?

The fp32 F=1 64²-envelope conv plan moved to v5 @ (256,512) (round 4b:
35.7 vs 44.4 ms) because the 512-block spectra are lane-aligned
(Wc2 = 256) where the 511 plan's Wc = 256+1 tile-pads to 384 lanes. The
32² envelope's tuned plan is v4 @ (128,511) valid (96,384) — the same
pad applies, and radix_w_legal holds at (128,512) (kw_eff 129, vw 384,
s1 = 128 lane-aligned). This measures conv AND peaks at:

  v4 @ (128,511) [tuned]  vs  v5 @ (128,512)  (fp32, F=1, 2048²×100 32²)

Groups: the (128,*) family's tuned group via lookup; plus (2,2)/(4,1)
spot checks for v5 (new M=64 H stage changes the VMEM mix).
"""
import gc, json, os, time
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


rng = np.random.default_rng(29)
emit(kind="start", backend=jax.default_backend())

from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_pallas, block_conv_peaks_pallas, radix_h_legal, radix_w_legal,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402

H = Wd = 2048
N, F = 100, 1
data = jnp.asarray(
    rng.standard_normal((1, F, H, Wd)).astype(np.float32)
)

# (label, bh, bw, pkh, pkw, kernel kwargs, group override)
# NOTE first run: block_conv_pallas does NOT auto-set radix_h from
# radix_w (the peaks wrapper does) — conv v5 cases must pass both.
V5C = dict(radix_h=True, radix_w=True)
cases = [
    ("conv_v4_511", 128, 511, 33, 128, dict(radix_h=True), None),
    ("conv_v5_512", 128, 512, 33, 129, V5C, None),
    ("conv_v5_512_g22", 128, 512, 33, 129, V5C, (2, 2)),
    ("conv_v5_512_g41", 128, 512, 33, 129, V5C, (4, 1)),
    ("peaks_v4_511", 128, 511, 33, 128, dict(radix_h=True), None),
    ("peaks_v5_512", 128, 512, 33, 129, dict(radix_w=True), None),
    ("peaks_v5_512_g22", 128, 512, 33, 129, dict(radix_w=True), (2, 2)),
]
if os.environ.get("R4H_CONV_ONLY"):
    cases = [c for c in cases if c[0].startswith("conv")]
vals_seen = {}
for label, bh, bw, pkh, pkw, kw_args, group in cases:
    vh, vw = bh - pkh + 1, bw - pkw + 1
    assert radix_h_legal(bh, vh), (bh, vh)
    if kw_args.get("radix_w"):
        assert radix_w_legal(bw, pkw, vw), (bw, pkw, vw)
    d_re, d_im = fft_data_blocks(
        data, bh, bw, pkh, pkw, origin_h=pkh // 2, origin_w=pkw // 2,
        win_h=H, win_w=Wd,
    )
    # one bank per (bh, bw) geometry, shared across its cases so the
    # conv/peaks answers must agree within the family
    krng = np.random.default_rng(31)
    k_re = jnp.asarray(
        krng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
    )
    k_im = jnp.asarray(
        krng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
    )
    row = {"case": label, "blocks": [bh, bw], "group": group}
    is_peaks = label.startswith("peaks")
    g = {} if group is None else {"mbh": group[0], "mbw": group[1]}
    base = block_conv_peaks_pallas if is_peaks else block_conv_pallas
    try:
        fn = probed(
            lambda dr, di, kr, ki, _b=base, _kw=kw_args, _g=g, _bh=bh,
            _bw=bw, _ph=pkh, _pw=pkw: _b(
                dr, di, kr, ki, _bh, _bw, _ph, _pw, H, Wd, **_kw, **_g
            )
        )
        row["ms"] = round(tfn(fn, d_re, d_im, k_re, k_im), 1)
        row["ms_stream"] = round(
            tfn(fn, d_re, d_im, k_re, k_im, iters=18, sync_every=9), 1
        )
        _, out = fn(d_re, d_im, k_re, k_im)
        # parity is only meaningful WITHIN a (bh, bw) geometry (the random
        # spectra banks differ across block shapes even at a shared seed)
        if is_peaks:
            cells = np.asarray(out[0]).reshape(N, -1)
            ci = cells.argmax(axis=1)
            top = np.asarray(out[1]).reshape(N, -1)[np.arange(N), ci]
            key = ("peaks", bh, bw)
            cur = (cells[np.arange(N), ci], top)
        else:
            m = np.asarray(out[0, :4])
            key = ("conv", bh, bw)
            cur = m
        if key in vals_seen:
            prev = vals_seen[key]
            if is_peaks:
                row["idx_match"] = int(np.sum(cur[1] == prev[1]))
                row["val_match"] = bool(
                    np.allclose(cur[0], prev[0], rtol=1e-4)
                )
            else:
                scale = float(np.max(np.abs(prev)))
                row["rel_err_vs_first"] = float(
                    f"{np.max(np.abs(cur - prev)) / scale:.2e}"
                )
        else:
            vals_seen[key] = cur
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    emit(**row)
    del d_re, d_im, k_re, k_im
    drain()
emit(kind="done")
