#!/usr/bin/env python
"""Re-verify the two gate fixes on the attached chip:
(1) the f32 (63,287)-class plans that crashed Mosaic's scoped-vmem under
    the old unpadded groups now compile AND still beat unfused with the
    padded-model groups;
(2) auto dispatch engages fused at F≤16 and stays unfused at F=31.
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


def tfn(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(7)
N = 64

for F, K, force_list in ((8, 32, (False, True, None)),
                         (16, 32, (False, True, None)),
                         (31, 32, (None,))):
    data = jnp.asarray(
        rng.standard_normal((1024, 1024, F)).astype(np.float32)
    )
    bank = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))
    drain()
    sd = fc.fft_data_tiled(data, K, K, trim_mode="same")
    sk = fc.fft_kernels(bank, spectral=sd)
    jax.block_until_ready((sd.re, sk.re))
    row = {"F": F, "K": K, "tier": "float32"}
    for force in force_list:
        label = {False: "unfused", True: "fused", None: "auto"}[force]
        fc.set_config(use_fused_block_conv=force)
        conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        try:
            t = tfn(conv, sd, sk)
            row[label + "_ms"] = round(t, 1)
        except Exception as e:  # noqa: BLE001
            row[label + "_err"] = repr(e)[:160]
    fc.set_config(use_fused_block_conv=None)
    emit(**row)
    del sd, sk, data, bank
    drain()
emit(kind="done")
