"""Block-geometry sweep for the large-kernel (512²) tiled config.

The analytic plan picks valid (512, 513) → blocks (1023, 1024), Wc = 513.
A 513-wide Hermitian axis tile-pads to 640 lanes in HBM (1.25× product
traffic); lane-aligned alternatives and taller/wider windows are measured
here at matmul_precision='high' (see perf/diag_high_prec.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/sweep_bigk_geometry.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import cuda_fft_convolution_tpu as fc  # noqa: E402

# defaults: matmul_precision='highest' forwards AND inverse ('high' is
# opt-in — it measured over the 1e-5 bar at this config's transform sizes)


def probed(fn):
    def wrapped(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def timeit(fn, *a, iters=4, warm=1, sync_every=1):
    for _ in range(warm):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    p = None
    for i in range(iters):
        p, _ = fn(*a)
        if (i + 1) % sync_every == 0:
            np.asarray(p)
    np.asarray(p)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
H = W = 2048
K, N = 512, 16
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kbig = jnp.asarray(rng.standard_normal((N, K, K, 1)).astype(np.float32))
jax.block_until_ready((data, kbig))
gpixf = H * W * N / 1e9

# (vh, vw, block_h, block_w) candidates; envelope = block - v + 1 >= 512.
CANDS = [
    (512, 513, 1023, 1024),  # current analytic plan (Wc=513 -> 640 lanes)
    (512, 511, 1023, 1022),  # Wc=512, everything lane-native
    (256, 511, 767, 1022),   # shorter H blocks (less inverse-H flops/pair)
    (512, 1023, 1023, 1534), # wide: Wc=768, fewer blocks, less H per pixel
    (384, 511, 895, 1022),   # mid H
    (512, 767, 1023, 1278),  # Wc=640 native, moderate width
]

ref = None
results = {}
for vh, vw, bh, bw in CANDS:
    pkh, pkw = bh - vh + 1, bw - vw + 1
    try:
        sd = fc.fft_data_tiled(
            data, pkh, pkw, block_h=bh, block_w=bw, trim_mode="same"
        )
        sk = fc.fft_kernels(kbig, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_call = timeit(conv, sd, sk, iters=6)
        t_stream = timeit(conv, sd, sk, iters=16, sync_every=8)
        _, maps = conv(sd, sk)
        arr = np.asarray(maps[:, :128, :128])
        if ref is None:
            ref = arr
            agree = 0.0
        else:
            agree = float(np.max(np.abs(arr - ref)) / np.max(np.abs(ref)))
        del sd, sk
        results[f"{vh}x{vw}@{bh}x{bw}"] = {
            "percall_ms": round(t_call * 1e3, 2),
            "stream8_ms": round(t_stream * 1e3, 2),
            "stream8_GPixF_s": round(gpixf / t_stream, 3),
            "vs_first_rel": float(f"{agree:.2e}"),
        }
        print(f"{vh}x{vw}@{bh}x{bw}",
              json.dumps(results[f"{vh}x{vw}@{bh}x{bw}"]), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{vh}x{vw}@{bh}x{bw} FAILED: {type(e).__name__}: {e}",
              flush=True)

print(json.dumps(results))
