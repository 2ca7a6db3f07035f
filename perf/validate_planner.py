#!/usr/bin/env python
"""Validate the bank planner's F>1 unchunked headroom model (bank/16 slack,
runtime/planner.py) on a SECOND F>1 geometry near the budget edge — the
round-2 advisor asked for more than the single F=31/N=224 measurement.

Runs the risky near-capacity conv in a SUBPROCESS (an OOM through the axon
runtime poisons the process)."""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu import api
from cuda_fft_convolution_tpu.runtime.planner import plan_bank

rng = np.random.default_rng(0)
# Geometry 2: F=8, 1024^2 data, 24^2 kernels -> fft (1080, 1080) fast;
# size N so the planner's unchunked plan lands just inside the budget.
F, H, KD = 8, 1024, 24
data = jnp.asarray(rng.standard_normal((H, H, F)).astype(np.float32))
sd = fc.fft_data(data, KD, KD)
budget = api._device_memory_budget()
wc = sd.fft_w // 2 + 1
h_pad = -(-sd.fft_h // 8) * 8
wc_pad = -(-wc // 128) * 128
# find the largest N the planner runs UNCHUNKED
lo, hi = 1, 512
while lo < hi:
    mid = (lo + hi + 1) // 2
    p = plan_bank(mid, F, sd.fft_h, sd.fft_w, batch=1, hbm_budget_bytes=budget)
    if p.chunk_size >= mid:
        lo = mid
    else:
        hi = mid - 1
N = lo
print(f"CHILD: N={N} budget={budget>>20}MiB fft=({sd.fft_h},{sd.fft_w})",
      flush=True)
bank = jnp.asarray(rng.standard_normal((N, KD, KD, F)).astype(np.float32))
sk = fc.fft_kernels(bank, spectral=sd, storage="planar")
np.asarray(jax.jit(lambda a: jnp.ravel(a)[:4])(sk.re))  # drain
plan = plan_bank(N, F, sd.fft_h, sd.fft_w, batch=1, hbm_budget_bytes=budget)
print(f"CHILD: plan chunk={plan.chunk_size} peak={plan.peak_bytes>>20}MiB",
      flush=True)
assert plan.chunk_size >= N, "expected an unchunked plan at this N"
out = fc.conv_spectral(sd, sk, mode="fftmap")
probe = np.asarray(jax.jit(lambda a: jnp.ravel(a)[:4])(out))
print("CHILD: unchunked conv OK", probe[:2], flush=True)
"""


def main():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    r = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True,
        text=True, timeout=3600,
    )
    ok = r.returncode == 0 and "unchunked conv OK" in r.stdout
    print(json.dumps({
        "kind": "planner_f8_unchunked_validation",
        "ok": ok,
        "stdout_tail": r.stdout.strip().splitlines()[-3:],
        "stderr_tail": r.stderr.strip().splitlines()[-2:] if not ok else [],
    }))


if __name__ == "__main__":
    main()
