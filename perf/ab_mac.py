#!/usr/bin/env python
"""A/B the 4-contraction vs Karatsuba MAC on the two unfused regimes that
matter (bigk 2048^2 x 16 512^2 one-shot; DPM tiled F=31 amortized), in
SUBPROCESSES so each variant gets a clean backend."""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, time, sys
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
        return jnp.ravel(leaf)[:4], out
    return jax.jit(w)

def tfn(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        p, _ = fn(*a); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a); np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3

rng = np.random.default_rng(0)
tag = sys.argv[1]

data = jnp.asarray(rng.standard_normal((2048, 2048, 1)).astype(np.float32))
kbig = jnp.asarray(rng.standard_normal((16, 512, 512, 1)).astype(np.float32))
jax.block_until_ready((data, kbig))
shot = probed(lambda d, k: fc.fft_conv(d, 512, 512, k, mode="same"))
print(f"RES bigk16_{tag} {tfn(shot, data, kbig, iters=2):.1f}", flush=True)
del data, kbig

feats = jnp.asarray(rng.standard_normal((512, 512, 31)).astype(np.float32))
bank = jnp.asarray(rng.standard_normal((1024, 12, 12, 31)).astype(np.float32))
sdd = fc.fft_data_tiled(feats, 12, 12, trim_mode="same")
skd = fc.fft_kernels(bank, spectral=sdd)
jax.block_until_ready((sdd.re, skd.re))
conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
print(f"RES dpm_tiled_{tag} {tfn(conv, sdd, skd, iters=3):.1f}", flush=True)
"""


def run(tag, karatsuba):
    env = dict(os.environ)
    env["FFTCONV_MAC_KARATSUBA"] = "1" if karatsuba else "0"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    r = subprocess.run(
        [sys.executable, "-c", CHILD, tag], env=env, capture_output=True,
        text=True, timeout=7200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RES"):
            print(json.dumps({"kind": line.split()[1], "ms": float(line.split()[2])}),
                  flush=True)
    if r.returncode != 0:
        print(json.dumps({"kind": f"{tag}_error",
                          "tail": r.stderr.strip().splitlines()[-3:]}))


run("mac4", False)
run("kara", True)
print(json.dumps({"kind": "done"}))
