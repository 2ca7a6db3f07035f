#!/usr/bin/env python
"""Round-4d: close the v5 group sweep — the analytic chooser picks (1,3)
at the v5 plan, which round-4c's sweep didn't time ((2,2) measured best
of the swept set at 16.73 ms/frame streamed). Time (1,3) and (2,3) so the
pinned builtin group is measured against the live alternative."""
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


rng = np.random.default_rng(17)
H = Wd = 2048
N = 100
bh, bw, pkh, pkw = 256, 512, 65, 129
data_cf = jnp.asarray(
    rng.standard_normal((1, 1, H, Wd)).astype(np.float32)
)
d_re, d_im = fft_data_blocks(data_cf, bh, bw, pkh, pkw, origin_h=pkh // 2,
                             origin_w=pkw // 2, win_h=H, win_w=Wd)
k_re = jnp.asarray(
    rng.standard_normal((N, 1, bh, bw // 2 + 1)).astype(np.float32)
)
k_im = jnp.asarray(
    rng.standard_normal((N, 1, bh, bw // 2 + 1)).astype(np.float32)
)
jax.block_until_ready((d_re, k_re))
emit(kind="start", backend=jax.default_backend())
for mbh, mbw in ((1, 3), (2, 3), (2, 2)):
    row = {"case": "v5_group", "group": [mbh, mbw]}
    try:
        fn = probed(lambda a, b, c, d, _h=mbh, _w=mbw: block_conv_pallas(
            a, b, c, d, bh, bw, pkh, pkw, H, Wd,
            radix_h=True, radix_w=True, mbh=_h, mbw=_w))
        row["ms_stream"] = round(tfn(fn, d_re, d_im, k_re, k_im), 2)
    except Exception as e:  # noqa: BLE001
        row["err"] = repr(e)[:200]
    emit(**row)
    gc.collect()
emit(kind="done")
