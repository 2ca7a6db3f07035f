#!/usr/bin/env python
"""Hardware ceilings through this runtime: write BW, copy BW, GEMM TF/s by
precision, and fused-kernel N-scaling (fixed overhead vs per-kernel cost)."""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.ops.block_conv import block_conv_pallas

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
RTT = None
f = probed(lambda x: x * 2.0)
x8 = jnp.ones((8, 128), jnp.float32); np.asarray(f(x8)[0])
ts = []
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(f(x8)[0]); ts.append(time.perf_counter()-t0)
ts.sort(); RTT = ts[2]*1e3
emit(kind="rtt", ms=round(RTT, 2))

# write-only: broadcast scalar to (100, 2048, 2048) f32 = 1.68 GB
wr = probed(lambda s: jnp.broadcast_to(s, (100, 2048, 2048)) + s)
t = tfn(wr, jnp.float32(1.0))
emit(kind="write_1.68GB", ms=round(t, 2), gbps=round(1.68/( (t-RTT)/1e3 ), 1))

# copy: in+1 out, 1.68 GB read + 1.68 GB write
big = jnp.asarray(rng.standard_normal((100, 2048, 2048)).astype(np.float32))
jax.block_until_ready(big)
cp = probed(lambda a: a + 1.0)
t = tfn(cp, big)
emit(kind="copy_3.36GB", ms=round(t, 2), gbps=round(3.36/((t-RTT)/1e3), 1))
del big

# GEMM 8192^3: 1.1 TFLOP
a = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
jax.block_until_ready((a, b))
fl = 2 * 8192**3 / 1e12
for prec in ("highest", "high", "default"):
    P = dict(highest=jax.lax.Precision.HIGHEST, high=jax.lax.Precision.HIGH,
             default=jax.lax.Precision.DEFAULT)[prec]
    g = probed(lambda a, b: jnp.dot(a, b, precision=P,
                                    preferred_element_type=jnp.float32))
    t = tfn(g, a, b, iters=3)
    emit(kind="gemm8192", precision=prec, ms=round(t, 2),
         tfs=round(fl/((t-RTT)/1e3), 1))
# narrow GEMM like our H-stage: (64, 127) @ (127, 1792) batched 3000
an = jnp.asarray(rng.standard_normal((3000, 64, 127)).astype(np.float32))
bn = jnp.asarray(rng.standard_normal((3000, 127, 1792)).astype(np.float32))
jax.block_until_ready((an, bn))
gn = probed(lambda a, b: jnp.einsum("bij,bjk->bik", a, b,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
t = tfn(gn, an, bn, iters=3)
fln = 2 * 3000 * 64 * 127 * 1792 / 1e12
emit(kind="gemm_narrow64", ms=round(t, 2), tfs=round(fln/((t-RTT)/1e3), 2))
del a, b, an, bn

# fused N-scaling at (64,512)
H = W = 2048; K = 64
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
bh, bw = 127, 575
sd = fc.fft_data_tiled(data, K, K, block_h=bh, block_w=bw)
for n in (100, 25):
    kerns = jnp.asarray(rng.standard_normal((n, K, K, 1)).astype(np.float32))
    sk = fc.fft_kernels(kerns, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    oh, ow = sd.out_h, sd.out_w
    fused = probed(lambda s, kk: block_conv_pallas(
        s.re[None], s.im[None], kk.re, kk.im, bh, bw, K, K, oh, ow))
    t = tfn(fused, sd, sk, iters=4)
    emit(kind="fused_nscale", n=n, ms=round(t, 2))
    del sk
emit(kind="done")
