#!/usr/bin/env python
"""Round-4b: v4-radix peaks kernel vs the v3 one vs full maps, on-chip.

Round 4a measured the v3-based peaks kernel SLOWER than the v4 maps it
replaces (43.7 vs 38.9 ms bf16io at the DPM plan) — the H stage was the
deficit, not the reduction epilogue. block_conv_peaks_pallas now
auto-selects a v4-based kernel (radix-2 H stage + max/argmax epilogue)
when radix_h_legal; this script times maps / v3-peaks / v4-peaks at the
serving configs and checks on-chip peak parity.
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


rng = np.random.default_rng(13)
emit(kind="start", backend=jax.default_backend())

for label, H, Wd, F, N, K, dt in (
    ("headline_bf16", 2048, 2048, 1, 100, 64, "bfloat16"),
    ("headline_f32", 2048, 2048, 1, 100, 64, "float32"),
    ("dpm_f8", 1024, 1024, 8, 64, 32, "bfloat16"),
):
    data = jnp.asarray(rng.standard_normal((H, Wd, F)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))
    drain()
    sd = fc.fft_data_tiled(data, K, K, trim_mode="same", store_dtype=dt)
    sk = fc.fft_kernels(bank, spectral=sd, store_dtype=dt,
                        storage="planar", correlation=True)
    jax.block_until_ready((sd.re, sk.re))
    row = {"case": label, "tier": dt}
    conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    peaks = probed(lambda s, k: detect_peaks(s, k, mode="same"))
    try:
        row["maps_ms"] = round(tfn(conv, sd, sk), 1)
        row["maps_ms_stream"] = round(
            tfn(conv, sd, sk, iters=18, sync_every=9), 1
        )
    except Exception as e:  # noqa: BLE001
        row["maps_err"] = repr(e)[:160]
    try:
        row["peaks_v4_ms"] = round(tfn(peaks, sd, sk), 1)
        row["peaks_v4_ms_stream"] = round(
            tfn(peaks, sd, sk, iters=18, sync_every=9), 1
        )
    except Exception as e:  # noqa: BLE001
        row["peaks_v4_err"] = repr(e)[:160]
    # parity: argmax of the maps == peaks output
    if "maps_ms" in row and "peaks_v4_ms" in row:
        _, maps = conv(sd, sk)
        _, (vals, pos) = peaks(sd, sk)
        flat = jax.jit(
            lambda m: jnp.argmax(m.reshape(m.shape[0], -1), -1)
        )(maps)
        wpos = np.asarray(flat)
        gpos = (np.asarray(pos[:, 0]) * maps.shape[-1]
                + np.asarray(pos[:, 1]))
        row["peak_match"] = int(np.sum(wpos == gpos))
        row["n_kernels"] = int(N)
        del maps, vals, pos
    emit(**row)
    del sd, sk, data, bank
    drain()

# kernel-level v3 vs v4 at the fused serving plan (bypasses the API to
# force radix_h off — detect_peaks auto-selects v4 now)
from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    block_conv_peaks_pallas, radix_h_legal,
)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks  # noqa: E402

H = Wd = 2048
N, F, K = 100, 1, 64
bh, bw, pkh, pkw = 256, 511, 65, 128
vh = bh - pkh + 1
assert radix_h_legal(bh, vh)
data = jnp.asarray(rng.standard_normal((1, F, H, Wd)).astype(np.float32))
d_re, d_im = fft_data_blocks(data, bh, bw, pkh, pkw, origin_h=pkh // 2,
                             origin_w=pkw // 2, win_h=H, win_w=Wd)
k_re = jnp.asarray(
    rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
)
k_im = jnp.asarray(
    rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
)
for tier in ("f32", "bf16"):
    if tier == "bf16":
        args = (d_re.astype(jnp.bfloat16), d_im.astype(jnp.bfloat16),
                k_re.astype(jnp.bfloat16), k_im.astype(jnp.bfloat16))
    else:
        args = (d_re, d_im, k_re, k_im)
    for vname, rh in (("v3", False), ("v4", True)):
        row = {"case": "kernel_peaks", "tier": tier, "kernel": vname}
        try:
            fn = probed(lambda *a, _rh=rh: block_conv_peaks_pallas(
                *a, bh, bw, pkh, pkw, H, Wd, radix_h=_rh))
            row["ms"] = round(tfn(fn, *args), 1)
        except Exception as e:  # noqa: BLE001
            row["err"] = repr(e)[:200]
        emit(**row)
        drain()
emit(kind="done")
