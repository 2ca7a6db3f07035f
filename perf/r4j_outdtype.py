#!/usr/bin/env python
"""Round-4j: the bf16 output-maps option (out_dtype='bfloat16').

At serving geometries the output MAPS are the dominant f32 traffic left:
the DPM/HOG F=31 unfused pipeline is traffic-bound AT its roofline
(PERF.md round 3), and its per-frame in-flight working set (1024 maps of
512² f32 = 1.07 GB) is what caps the streaming pipeline at sync 9
(perf/diag_stream_depth.py). Casting the maps bf16 (a) halves the final
write + reassembly-copy bytes and (b) halves the in-flight set, admitting
a deeper pipeline. Detection consumers tolerate ~4e-3 score rounding —
the same envelope as the bf16 spectra tier.

Measures:
  A. DPM/HOG config (512²×31 bf16 spectra, 1024×12² bank, 'same'):
     f32-out sync9 control vs bf16-out at sync 9/12/15 + parity scalar.
     Target: the round-2 "dpm_hog ≥ 7 GPix·F/s" bar (f32-out sits at
     6.8-7.0 — AT its f32 traffic roofline).
  B. Headline bf16 tier (2048²×100 64², bf16 spectra, fused v4 BF16IO
     kernel): bf16-out one-shot + sync9 vs control — the in-kernel bf16
     store variant's first Mosaic compile happens here.
  C. Headline fp32 spectra + bf16 out (v5 plan): expect ~tie (fp32 is
     MXU-bound; the write is already overlapped) — measured to close it.
  D. Ragged 16-cell bank (BASELINE configs[1]) streamed sync6: the
     one-shot row is RTT-bound (33 ms wall on a ~4 ms workload); this is
     its honest serving counterpart.
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


def tfn(fn, *a, warmup=1, iters=6, sync_every=1):
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


rng = np.random.default_rng(31)
emit(kind="start", backend=jax.default_backend())

# ---------------- A. DPM/HOG F=31, unfused tiled, bf16 tier ------------
FD, NK, KD, HW = 31, 1024, 12, 512
feats = jnp.asarray(rng.standard_normal((HW, HW, FD)).astype(np.float32))
bank = jnp.asarray(
    rng.standard_normal((NK, KD, KD, FD)).astype(np.float32)
)
sdd = fc.fft_data_tiled(feats, KD, KD, trim_mode="same",
                        store_dtype="bfloat16")
skd = fc.fft_kernels(bank, spectral=sdd, store_dtype="bfloat16")
np.asarray(probed(lambda a: a[0, 0, :16])(skd.re)[0])
gpixf = HW * HW * NK / 1e9

conv32 = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
convb = probed(
    lambda s, k: fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16")
)
# parity scalar computed ON DEVICE (fetching 1 GB of maps through the
# tunnel costs minutes; a scalar costs one RTT)
par = probed(
    lambda s, k: (
        lambda a, b: jnp.max(jnp.abs(a - b.astype(jnp.float32)))
        / jnp.max(jnp.abs(a))
    )(
        fc.conv_spectral(s, k, mode="same"),
        fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16"),
    )
)
rel = float(np.asarray(par(sdd, skd)[1]))
emit(kind="dpm_parity", rel_err=rel)
drain()

t = tfn(conv32, sdd, skd, iters=18, sync_every=9)
emit(kind="dpm", case="f32out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
drain()
t = tfn(convb, sdd, skd, iters=18, sync_every=9)
emit(kind="dpm", case="bf16out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
drain()
t = tfn(convb, sdd, skd, iters=24, sync_every=12)
emit(kind="dpm", case="bf16out_sync12", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
drain()
try:
    t = tfn(convb, sdd, skd, iters=30, sync_every=15)
    emit(kind="dpm", case="bf16out_sync15", ms_frame=round(t, 2),
         gpixf_s=round(gpixf / t * 1e3, 3))
except Exception as e:  # depth 15 may exceed HBM
    emit(kind="dpm", case="bf16out_sync15", error=str(e)[:200])
del sdd, skd, feats, bank, conv32, convb, par
drain()

# ---------------- D. ragged 16-cell bank streamed ----------------------
rag_data = jnp.asarray(rng.standard_normal((512, 512, 1)).astype(np.float32))
rag_cells = [
    jnp.asarray(rng.standard_normal((k, k, 1)).astype(np.float32))
    for k in (9, 17, 33, 64) for _ in range(4)
]
rag_fn = probed(
    lambda d: jnp.concatenate([
        jnp.ravel(o) for o in fc.fft_conv(d, kernels=rag_cells, mode="same")
    ])
)
t = tfn(rag_fn, rag_data, iters=3)
emit(kind="ragged", case="oneshot", ms=round(t, 2),
     gpixf_s=round(512 * 512 * 16 / 1e9 / t * 1e3, 3))
t = tfn(rag_fn, rag_data, iters=12, sync_every=6)
emit(kind="ragged", case="sync6", ms=round(t, 2),
     gpixf_s=round(512 * 512 * 16 / 1e9 / t * 1e3, 3))
del rag_data, rag_cells, rag_fn
drain()

# ---------------- B. headline bf16 tier, fused BF16IO ------------------
H = W = 2048
N, KH = 100, 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kern = jnp.asarray(rng.standard_normal((N, KH, KH, 1)).astype(np.float32))
gpixf = H * W * N / 1e9
sdb = fc.fft_data_tiled(data, KH, KH, trim_mode="same",
                        store_dtype="bfloat16")
skb = fc.fft_kernels(kern, spectral=sdb, store_dtype="bfloat16")
jax.block_until_ready((sdb.re, skb.re))
conv32 = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
convb = probed(
    lambda s, k: fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16")
)
parb = probed(
    lambda s, k: (
        lambda a, b: jnp.max(jnp.abs(a - b.astype(jnp.float32)))
        / jnp.max(jnp.abs(a))
    )(
        fc.conv_spectral(s, k, mode="same"),
        fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16"),
    )
)
emit(kind="note", msg="bf16io+bf16out Mosaic compile starts here")
t0c = time.perf_counter()
rel = float(np.asarray(parb(sdb, skb)[1]))
emit(kind="headline_bf16_parity", rel_err=rel,
     first_call_s=round(time.perf_counter() - t0c, 1))
drain()
t = tfn(conv32, sdb, skb, iters=18, sync_every=9)
emit(kind="headline_bf16", case="f32out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
t = tfn(convb, sdb, skb, iters=3)
emit(kind="headline_bf16", case="bf16out_oneshot", ms=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
drain()
t = tfn(convb, sdb, skb, iters=18, sync_every=9)
emit(kind="headline_bf16", case="bf16out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
drain()
t = tfn(convb, sdb, skb, iters=36, sync_every=18)
emit(kind="headline_bf16", case="bf16out_sync18", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
del sdb, skb, conv32, convb, parb
drain()

# ---------------- C. headline fp32 spectra + bf16 out (v5 plan) --------
sdf = fc.fft_data_tiled(data, KH, KH, trim_mode="same")
skf = fc.fft_kernels(kern, spectral=sdf)
jax.block_until_ready((sdf.re, skf.re))
conv32 = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
convb = probed(
    lambda s, k: fc.conv_spectral(s, k, mode="same", out_dtype="bfloat16")
)
emit(kind="note", msg="v5+bf16out Mosaic compile starts here")
t0c = time.perf_counter()
p, _ = convb(sdf, skf)
np.asarray(p)
emit(kind="note", msg="v5+bf16out compiled",
     first_call_s=round(time.perf_counter() - t0c, 1))
t = tfn(conv32, sdf, skf, iters=18, sync_every=9)
emit(kind="headline_f32", case="f32out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
t = tfn(convb, sdf, skf, iters=18, sync_every=9)
emit(kind="headline_f32", case="bf16out_sync9", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))
t = tfn(convb, sdf, skf, iters=36, sync_every=18)
emit(kind="headline_f32", case="bf16out_sync18", ms_frame=round(t, 2),
     gpixf_s=round(gpixf / t * 1e3, 3))

emit(kind="done")
