#!/usr/bin/env python
"""Diagnose where the tiled inverse stage spends device time, and whether an
Lh-major product layout (H-inverse as one giant contiguous GEMM) beats the
current block-major batched-small-matmul layout. Also: N-scaling to separate
fixed per-call overhead from compute, and a streaming re-check."""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc

P = jax.lax.Precision.HIGHEST
def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out
    return jax.jit(w)
def tfn(fn, *a, warmup=2, iters=5):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a); np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3
def emit(**kw): print(json.dumps(kw), flush=True)

rng = np.random.default_rng(0)
BLK, N, LH, WC, VH, VW = 198, 100, 127, 128, 64, 192

# --- microbench: H-inverse layouts on synthetic product planes
pr = jnp.asarray(rng.standard_normal((BLK*N, LH, WC)).astype(np.float32))
pi = jnp.asarray(rng.standard_normal((BLK*N, LH, WC)).astype(np.float32))
gr = jnp.asarray(rng.standard_normal((VH, LH)).astype(np.float32))
gi = jnp.asarray(rng.standard_normal((VH, LH)).astype(np.float32))
jax.block_until_ready((pr, pi, gr, gi))

def h_batched(pr, pi):
    def mml(m, x):
        return jnp.einsum("kn,...nm->...km", m, x, precision=P,
                          preferred_element_type=jnp.float32)
    t1 = mml(gr, pr); t2 = mml(gi, pi); t3 = mml(gr+gi, pr+pi)
    return t1 - t2, t3 - t1 - t2
emit(kind="micro", variant="h_batched_blockmajor", ms=round(tfn(probed(h_batched), pr, pi), 2))

prl = jnp.asarray(np.transpose(np.asarray(pr).reshape(BLK*N, LH, WC), (1,0,2)).reshape(LH, BLK*N*WC).copy())
pil = jnp.asarray(np.transpose(np.asarray(pi).reshape(BLK*N, LH, WC), (1,0,2)).reshape(LH, BLK*N*WC).copy())
jax.block_until_ready((prl, pil))
def h_lmajor(prl, pil):
    def mm(m, x):
        return jnp.einsum("kn,nm->km", m, x, precision=P,
                          preferred_element_type=jnp.float32)
    t1 = mm(gr, prl); t2 = mm(gi, pil); t3 = mm(gr+gi, prl+pil)
    return t1 - t2, t3 - t1 - t2
emit(kind="micro", variant="h_lmajor_giant_gemm", ms=round(tfn(probed(h_lmajor), prl, pil), 2))

# W-inverse microbench (already last-axis contraction) for reference
mr = jnp.asarray(rng.standard_normal((WC, VW)).astype(np.float32))
mi = jnp.asarray(rng.standard_normal((WC, VW)).astype(np.float32))
xr = jnp.asarray(rng.standard_normal((BLK*N, VH, WC)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((BLK*N, VH, WC)).astype(np.float32))
jax.block_until_ready((mr, mi, xr, xi))
def w_inv(xr, xi):
    def mm(a, b):
        return jnp.einsum("...k,km->...m", a, b, precision=P,
                          preferred_element_type=jnp.float32)
    return mm(xr, mr) + mm(xi, mi)
emit(kind="micro", variant="w_inv_lastaxis", ms=round(tfn(probed(w_inv), xr, xi), 2))

# precision sensitivity of the giant GEMM (passes-bound or not?)
def h_lmajor_hi(prl, pil):
    def mm(m, x):
        return jnp.einsum("kn,nm->km", m, x, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    t1 = mm(gr, prl); t2 = mm(gi, pil); t3 = mm(gr+gi, prl+pil)
    return t1 - t2, t3 - t1 - t2
emit(kind="micro", variant="h_lmajor_default_prec", ms=round(tfn(probed(h_lmajor_hi), prl, pil), 2))
del pr, pi, prl, pil, xr, xi

# --- N-scaling of the real amortized call (fixed overhead vs compute)
H = W = 2048; K = 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
sd = fc.fft_data_tiled(data, K, K, block_h=127, block_w=255)
for n in (100, 25, 6):
    kerns = jnp.asarray(rng.standard_normal((n, K, K, 1)).astype(np.float32))
    sk = fc.fft_kernels(kerns, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
    emit(kind="nscale", n=n, ms=round(tfn(conv, sd, sk, iters=4), 2))
    del sk, kerns

# --- streaming re-check at N=100 (sync every 5, more iters)
kerns = jnp.asarray(rng.standard_normal((100, K, K, 1)).astype(np.float32))
sk = fc.fft_kernels(kerns, spectral=sd)
conv = probed(lambda s, kk: fc.conv_spectral(s, kk, mode="same"))
p, _ = conv(sd, sk); np.asarray(p)
t0 = time.perf_counter(); p = None
for i in range(10):
    p, _ = conv(sd, sk)
    if (i+1) % 5 == 0: np.asarray(p)
emit(kind="stream", sync_every=5, ms=round((time.perf_counter()-t0)/10*1e3, 2))
emit(kind="done")
