"""XLA-side HIGH precision (3-pass split-bf16) vs HIGHEST on the unfused
MXU-DFT paths.

Round 3 gave the FUSED kernel its bf16x3 tier (≈ XLA HIGH); the UNFUSED
pipeline — which the large-kernel (512²) and F=31 configs run — still pays
HIGHEST (31 TF/s measured) on every transform dot. The big-kernel config is
transform-flop-bound (windowed inverse ≈ 22 of ~41 device ms), so HIGH
(56 TF/s) should buy ~1.5× there if it holds the ≤1e-5 accuracy bar.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/diag_high_prec.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import cuda_fft_convolution_tpu as fc  # noqa: E402


def probed(fn):
    def wrapped(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def timeit(fn, *a, iters=3, warm=1, sync_every=1):
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
data = jnp.asarray(rng.standard_normal((H, W, 1)).astype(np.float32))
kbig = jnp.asarray(rng.standard_normal((16, 512, 512, 1)).astype(np.float32))
jax.block_until_ready((data, kbig))

# accuracy scenario: 512² data × 4 kernels of 512², 'full' maps — tiling
# declines at this ratio so the DIRECT dense path runs (fwd + full inverse);
# the tiled path's dense sizes (1023/1024) match the bigk plan's.
dsm = np.asarray(data[:512, :512, :])
ksm = np.asarray(kbig[:4])
oh, ow = 512 + 512 - 1, 512 + 512 - 1
refs = []
for i in range(4):
    refs.append(
        np.real(
            np.fft.ifft2(
                np.fft.fft2(dsm[:, :, 0].astype(np.float64), (oh, ow))
                * np.fft.fft2(ksm[i, :, :, 0].astype(np.float64), (oh, ow))
            )
        )
    )

results = {}
for name, fwd_p, inv_p in (
    ("baseline_highest", "highest", "highest"),
    ("hybrid_inv_high", "highest", "high"),
    ("all_high", "high", "high"),
):
    prec = name
    fc.set_config(matmul_precision=fwd_p, inverse_precision=inv_p)
    got = np.array(fc.fft_conv(dsm, 512, 512, ksm, mode="full"))
    err = 0.0
    for i in range(4):
        err = max(
            err,
            np.max(np.abs(got[i] - refs[i])) / np.max(np.abs(refs[i])),
        )
    del got

    shot = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
    t_shot = timeit(shot, data, kbig)

    sd = fc.fft_data_tiled(data, 512, 512, trim_mode="same")
    sk = fc.fft_kernels(kbig, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    t_call = timeit(conv, sd, sk, iters=6)
    t_stream = timeit(conv, sd, sk, iters=16, sync_every=8)
    del sd, sk

    gpixf = H * W * 16 / 1e9
    results[prec] = {
        "rel_err_vs_f64": float(f"{err:.3e}"),
        "oneshot_ms": round(t_shot * 1e3, 2),
        "oneshot_GPixF_s": round(gpixf / t_shot, 3),
        "percall_ms": round(t_call * 1e3, 2),
        "stream8_ms": round(t_stream * 1e3, 2),
        "stream8_GPixF_s": round(gpixf / t_stream, 3),
    }
    print(prec, json.dumps(results[prec]), flush=True)

print(json.dumps(results))
