#!/usr/bin/env python
"""Round-4 item 5 (fp32 MXU lever): measure the v5 radix-2 DIF W stage on
the real chip at the headline geometry.

The DIF halves-split (even/odd spectral bins pre-permuted outside the
kernel; P = half synthesis of even bins + Nyquist sliver, Q = twiddled
odd-bin synthesis; x[t'] = P+Q, x[t'+W/2] = P−Q as contiguous slice
stores) cuts W-stage MACs from 2·pad128(Wc)·vw to 4·(W/4)·min(vw, W/2):
at the 512-block/129-pad plan that is 131k vs 295k per row — ~2.25× on W,
~1.25× on the whole kernel MXU bill. This script answers (a) does Mosaic
compile the v5 constructs (lane-block bin splits, segment slice stores,
VPU sliver matvecs), (b) is it actually faster than v4 at the same plan,
for the fp32 (bf16x3) tier and the bf16io tier.

First-of-a-kind Mosaic kernel: the v5 compile may take 30-60 min.
"""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks
from cuda_fft_convolution_tpu.ops.block_conv import (
    block_conv_pallas, radix_h_legal, radix_w_legal,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def tfn(fn, n=5):
    p = fn()
    np.asarray(p)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n * 1e3


def probe_call(*args, **kw):
    @jax.jit
    def run():
        out = block_conv_pallas(*args, **kw)
        return jnp.ravel(out)[:4]
    return run


rng = np.random.default_rng(5)
H = Wd = 2048
N, F, K = 100, 1, 64
data = jnp.asarray(rng.standard_normal((1, F, H, Wd)).astype(np.float32))
emit(kind="start", backend=jax.default_backend())

for tag, bh, bw, pkh, pkw in (
    ("v4_tuned_511", 256, 511, 65, 128),
    ("v5_512", 256, 512, 65, 129),
):
    vh, vw = bh - pkh + 1, bw - pkw + 1
    d_re, d_im = fft_data_blocks(data, bh, bw, pkh, pkw,
                                 origin_h=pkh // 2, origin_w=pkw // 2,
                                 win_h=H, win_w=Wd)
    k_re = jnp.asarray(rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32))
    k_im = jnp.asarray(rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32))
    jax.block_until_ready((d_re, k_re))
    gpixf = H * Wd * N / 1e9
    for tier in ("f32", "bf16"):
        if tier == "bf16":
            dr, di = d_re.astype(jnp.bfloat16), d_im.astype(jnp.bfloat16)
            kr, ki = k_re.astype(jnp.bfloat16), k_im.astype(jnp.bfloat16)
        else:
            dr, di, kr, ki = d_re, d_im, k_re, k_im
        variants = [("v4", dict(radix_h=radix_h_legal(bh, vh)))]
        if radix_w_legal(bw, pkw, vw) and radix_h_legal(bh, vh):
            variants.append(("v5", dict(radix_h=True, radix_w=True)))
        for vname, kwv in variants:
            row = {"plan": tag, "tier": tier, "kernel": vname,
                   "blocks": [bh, bw], "valid": [vh, vw]}
            try:
                fn = probe_call(dr, di, kr, ki, bh, bw, pkh, pkw, H, Wd,
                                **kwv)
                t0c = time.perf_counter()
                ms = tfn(fn)
                row["compile_s"] = round(time.perf_counter() - t0c - ms / 200, 1)
                row["ms"] = round(ms, 1)
                row["gpixf"] = round(gpixf / (ms / 1e3), 2)
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:220]
            emit(**row)
            gc.collect()
    # one parity check per plan (f32 v5 vs v4), small slice fetch
    if radix_w_legal(bw, pkw, vw) and radix_h_legal(bh, vh):
        @jax.jit
        def diff():
            a = block_conv_pallas(d_re, d_im, k_re, k_im, bh, bw, pkh, pkw,
                                  H, Wd, radix_h=True, radix_w=True)
            b2 = block_conv_pallas(d_re, d_im, k_re, k_im, bh, bw, pkh, pkw,
                                   H, Wd, radix_h=True)
            return jnp.max(jnp.abs(a - b2)) / jnp.max(jnp.abs(b2))
        try:
            emit(plan=tag, parity_rel=float(np.asarray(diff())))
        except Exception as e:  # noqa: BLE001
            emit(plan=tag, parity_err=repr(e)[:200])
    del d_re, d_im, k_re, k_im
    gc.collect()
emit(kind="done")
