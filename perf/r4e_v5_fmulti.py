#!/usr/bin/env python
"""Round-4e: v5 at F ∈ {2, 4} — the f32 F<8 autotune bucket now routes
multi-feature banks through the v5 (256,512) plan (the F≥2 kernel only
compiles since the sliver-MAC unroll fix); the F=31/bf16io lesson is that
the DIF stage can lose where it compiles. Streamed A/B: v4 at the old
(256,511) plan vs v5 at (256,512), 2048²×32 kernels of 64², fp32."""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cuda_fft_convolution_tpu.ops.block_conv import block_conv_pallas
from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks


def probed(fn):
    def w(*a):
        out = fn(*a)
        return jnp.ravel(out)[:4], out
    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=18, sync_every=9):
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(23)
H = Wd = 2048
N = 32
emit(kind="start", backend=jax.default_backend())
for F in (2, 4):
    data = jnp.asarray(
        rng.standard_normal((1, F, H, Wd)).astype(np.float32)
    )
    for tag, bh, bw, pkh, pkw, kwargs in (
        ("v4_511", 256, 511, 65, 128, dict(radix_h=True)),
        ("v5_512", 256, 512, 65, 129, dict(radix_h=True, radix_w=True)),
    ):
        d_re, d_im = fft_data_blocks(
            data, bh, bw, pkh, pkw, origin_h=pkh // 2, origin_w=pkw // 2,
            win_h=H, win_w=Wd,
        )
        k_re = jnp.asarray(
            rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
        )
        k_im = jnp.asarray(
            rng.standard_normal((N, F, bh, bw // 2 + 1)).astype(np.float32)
        )
        jax.block_until_ready((d_re, k_re))
        row = {"F": F, "plan": tag}
        try:
            fn = probed(
                lambda a, b, c, d, _k=dict(kwargs): block_conv_pallas(
                    a, b, c, d, bh, bw, pkh, pkw, H, Wd, **_k)
            )
            row["ms_stream"] = round(tfn(fn, d_re, d_im, k_re, k_im), 2)
        except Exception as e:  # noqa: BLE001
            row["err"] = repr(e)[:200]
        emit(**row)
        del d_re, d_im, k_re, k_im
        gc.collect()
    del data
emit(kind="done")
