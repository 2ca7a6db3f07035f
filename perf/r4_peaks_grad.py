#!/usr/bin/env python
"""Round-4 TPU session, part 1: the detection head + the fused-kernel VJP
measured/validated on the real chip.

  1. detect_peaks (fused peaks kernel) vs full-map conv at the headline
     (2048² × 100 × 64², F=1) and bf16 DPM-adjacent configs — the VERDICT
     item-6 'done' condition is ms/frame BELOW the full-map write floor.
  2. jax.grad through fft_conv's tiled engine at a fused-dispatch geometry
     (the round-3 flagship gap): compile + run + parity vs the unfused
     engine's gradient on-chip.

First-of-a-kind Mosaic kernels (the peaks variant) can take 30-60 min to
compile through the remote service — run backgrounded with a generous
timeout.
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


def tfn(fn, *a, warmup=1, iters=5):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(11)
emit(kind="start", backend=jax.default_backend())

# ---- 1. detection head ------------------------------------------------
for label, H, Wd, F, N, K, dt in (
    ("headline", 2048, 2048, 1, 100, 64, "float32"),
    ("headline_bf16", 2048, 2048, 1, 100, 64, "bfloat16"),
    ("dpm_f8", 1024, 1024, 8, 64, 32, "bfloat16"),
):
    data = jnp.asarray(rng.standard_normal((H, Wd, F)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))
    drain()
    sd = fc.fft_data_tiled(data, K, K, trim_mode="same", store_dtype=dt)
    sk = fc.fft_kernels(bank, spectral=sd, store_dtype=dt, storage="planar",
                        correlation=True)
    jax.block_until_ready((sd.re, sk.re))
    row = {"case": label, "tier": dt}
    # full-map serving call (the thing peaks should beat)
    conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    try:
        row["maps_ms"] = round(tfn(conv, sd, sk), 1)
    except Exception as e:  # noqa: BLE001
        row["maps_err"] = repr(e)[:160]
    # peaks head
    peaks = probed(lambda s, k: detect_peaks(s, k, mode="same"))
    try:
        row["peaks_ms"] = round(tfn(peaks, sd, sk), 1)
    except Exception as e:  # noqa: BLE001
        row["peaks_err"] = repr(e)[:160]
    # parity: argmax of the maps == peaks output
    if "maps_ms" in row and "peaks_ms" in row:
        _, maps = conv(sd, sk)
        _, (vals, pos) = peaks(sd, sk)
        flat = jax.jit(lambda m: jnp.argmax(m.reshape(m.shape[0], -1), -1))(maps)
        wpos = np.asarray(flat)
        gpos = np.asarray(pos[:, 0]) * maps.shape[-1] + np.asarray(pos[:, 1])
        row["peak_match"] = int(np.sum(wpos == gpos))
        row["n_kernels"] = int(N)
        del maps, vals, pos
    emit(**row)
    del sd, sk, data, bank
    drain()

# ---- 2. fused-VJP gradient on-chip ------------------------------------
H, Wd, F, N, K = 512, 512, 2, 8, 64
data = jnp.asarray(rng.standard_normal((H, Wd, F)).astype(np.float32))
bank = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))


def loss(k, algorithm):
    out = fc.fft_conv(data, kernels=k, mode="same", algorithm=algorithm)
    return jnp.sum(out ** 2)


row = {"case": "fused_grad"}
try:
    t0 = time.perf_counter()
    g_tiled = jax.jit(jax.grad(lambda k: loss(k, "tiled")))(bank)
    np.asarray(jnp.ravel(g_tiled)[:4])
    row["tiled_grad_compile_run_s"] = round(time.perf_counter() - t0, 1)
    g_direct = jax.jit(jax.grad(lambda k: loss(k, "direct")))(bank)
    scale = float(np.asarray(jax.jit(lambda g: jnp.max(jnp.abs(g)))(g_direct)))
    rel = float(np.asarray(jax.jit(
        lambda a, b: jnp.max(jnp.abs(a - b))
    )(g_tiled, g_direct))) / scale
    row["rel_err_vs_direct"] = rel
    from cuda_fft_convolution_tpu.ops.tiled import (
        choose_block_plan, fused_dispatch_auto,
    )
    lh, lw, pkh, pkw = choose_block_plan(H, Wd, K, K, feature_dim=F)
    row["fused_dispatch"] = bool(
        fused_dispatch_auto(F, lh, lw, lh - pkh + 1, lw - pkw + 1)
    )
except Exception as e:  # noqa: BLE001
    row["err"] = repr(e)[:200]
emit(**row)
emit(kind="done")
