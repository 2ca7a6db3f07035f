#!/usr/bin/env python
"""Measure the upcast-MAC precision fix (spectral_mac: DEFAULT instead of
HIGHEST on exactly-bf16-valued upcast operands — bit-identical, 1/6 the
MXU passes).

(1) device identity check: DEFAULT vs HIGHEST einsum on bf16-valued f32
    operands must be exactly equal;
(2) microbench of the two precisions on the giant-bank MAC shape — decides
    whether the MAC was MXU-bound (padded M=1→8, K=31→128 dots) or
    VPU/traffic-bound (precision moot);
(3) end-to-end dpm_direct 576 (chunked upcast MAC) vs the recorded
    82.9 ms / 72.4 streamed, and tiled DPM 1024 vs 69.3 / 38.4.
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


def tfn(fn, *a, warmup=1, iters=3, sync_every=1):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last, _ = fn(*a)
        if (i + 1) % sync_every == 0:
            np.asarray(last)
    np.asarray(last)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(3)

# (1)+(2): the direct giant-bank MAC shape, one planner chunk
S, FD, NC = 540 * 271, 31, 96
dr = jnp.asarray(
    rng.standard_normal((1, FD, S)).astype(np.float32)
).astype(jnp.bfloat16).astype(jnp.float32)
kr = jnp.asarray(
    rng.standard_normal((NC, FD, S)).astype(np.float32)
).astype(jnp.bfloat16).astype(jnp.float32)


def mac(prec):
    return probed(
        lambda a, b: jnp.einsum(
            "bfs,nfs->bns", a, b, precision=prec,
            preferred_element_type=jnp.float32,
        )
    )


m_hi, m_def = mac(jax.lax.Precision.HIGHEST), mac(jax.lax.Precision.DEFAULT)
_, o_hi = m_hi(dr, kr)
_, o_def = m_def(dr, kr)
diff = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(o_hi, o_def)
emit(kind="identity_check_max_abs_diff", diff=float(np.asarray(diff)))
del o_hi, o_def
drain()
t_hi = tfn(m_hi, dr, kr)
t_def = tfn(m_def, dr, kr)
emit(kind="mac_chunk_microbench", highest_ms=round(t_hi, 1),
     default_ms=round(t_def, 1), speedup=round(t_hi / t_def, 2))
del dr, kr, m_hi, m_def
drain()

# (3a) dpm_direct 576 end-to-end (chunked upcast MAC now DEFAULT)
feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
KD = 12
bank = jnp.asarray(rng.standard_normal((576, KD, KD, 31)).astype(np.float32))
sd16 = fc.fft_data(feats, KD, KD, store_dtype="bfloat16")
sk = fc.fft_kernels(bank, spectral=sd16, store_dtype="bfloat16")
np.asarray(probed(lambda a: a[0, 0, :16])(sk.re)[0])
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
t = tfn(conv, sd16, sk, iters=2)
emit(kind="dpm_direct_576", ms=round(t, 1), was=82.9,
     gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
drain()
t = tfn(conv, sd16, sk, iters=12, sync_every=6)
emit(kind="dpm_direct_576_stream6", ms=round(t, 1), was=72.4,
     gpixf=round(512 * 512 * 576 / 1e9 / (t / 1e3), 2))
del sd16, sk, conv
drain()

# (3b) tiled DPM 1024 end-to-end
NK = 1024
bank2 = jnp.concatenate([bank, bank])[:NK]
sdd = fc.fft_data_tiled(feats, KD, KD, trim_mode="same",
                        store_dtype="bfloat16")
skd = fc.fft_kernels(bank2, spectral=sdd, store_dtype="bfloat16")
jax.block_until_ready((sdd.re, skd.re))
convt = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
t = tfn(convt, sdd, skd)
emit(kind="dpm_tiled_1024", ms=round(t, 1), was=69.3,
     gpixf=round(512 * 512 * NK / 1e9 / (t / 1e3), 2))
t = tfn(convt, sdd, skd, iters=18, sync_every=9)
emit(kind="dpm_tiled_1024_stream9", ms=round(t, 1), was=38.4,
     gpixf=round(512 * 512 * NK / 1e9 / (t / 1e3), 2))
emit(kind="done")
