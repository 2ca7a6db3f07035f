#!/usr/bin/env python
"""Round-4: (MBH, MBW) group sweep at the HEADLINE fused plan, both tiers,
plus the fixed v5 radix-W kernel. Session-2 anomaly to explain: v4 at
blocks (256,512) bf16 measured 32.0 ms where the tuned (256,511) measured
51.6 — the only structural difference is the VMEM-model group choice
(wc 257 vs 256), so the group heuristic is suspected of costing the
headline ~1.6× at both tiers."""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks
from cuda_fft_convolution_tpu.ops.block_conv import (
    block_conv_pallas, block_conv_vmem_bytes, radix_h_legal, radix_w_legal,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def tfn(fn, n=5):
    np.asarray(fn())  # warmup + compile
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
gpixf = H * Wd * N / 1e9

for tag, bh, bw, pkh, pkw, use_v5 in (
    ("511_v4", 256, 511, 65, 128, False),
    ("512_v4", 256, 512, 65, 129, False),
    ("512_v5", 256, 512, 65, 129, True),
):
    vh, vw = bh - pkh + 1, bw - pkw + 1
    d_re, d_im = fft_data_blocks(data, bh, bw, pkh, pkw,
                                 origin_h=pkh // 2, origin_w=pkw // 2,
                                 win_h=H, win_w=Wd)
    k_re = jnp.asarray(rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32))
    k_im = jnp.asarray(rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32))
    jax.block_until_ready((d_re, k_re))
    kwv = dict(radix_h=True, radix_w=True) if use_v5 else dict(
        radix_h=radix_h_legal(bh, vh))
    for tier in ("f32", "bf16"):
        if tier == "bf16":
            dr, di = d_re.astype(jnp.bfloat16), d_im.astype(jnp.bfloat16)
            kr, ki = k_re.astype(jnp.bfloat16), k_im.astype(jnp.bfloat16)
            sb = 2
        else:
            dr, di, kr, ki = d_re, d_im, k_re, k_im
            sb = 4
        for mbh, mbw in ((None, None), (1, 1), (2, 1), (1, 2), (2, 2), (4, 1)):
            row = {"plan": tag, "tier": tier, "group": [mbh, mbw]}
            if mbh is not None and block_conv_vmem_bytes(
                F, bh, bw // 2 + 1, vh, vw, mbh, True, mbw, sb
            ) >= (12 << 20):
                row["skip"] = "vmem-model"
                emit(**row)
                continue
            try:
                fn = probe_call(dr, di, kr, ki, bh, bw, pkh, pkw, H, Wd,
                                mbh=mbh, mbw=mbw, **kwv)
                ms = tfn(fn)
                row["ms"] = round(ms, 1)
                row["gpixf"] = round(gpixf / (ms / 1e3), 2)
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:200]
            emit(**row)
            gc.collect()
    # v5 parity on-chip once
    if use_v5:
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
