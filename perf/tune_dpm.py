#!/usr/bin/env python
"""Autotune the F=31 DPM envelope (12x12 kernels, 512^2 HOG features) on
the attached chip — decides the (16, 16, 8) builtin entry. Candidates
include Wc-DENSE blocks (bw = 2*Wc - 2 with Wc = 128: zero lane-padding
waste in the product tensors, the unfused path's dominant traffic)."""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_fft_convolution_tpu.runtime.autotune import autotune_block_geometry

candidates = [
    (16, 128),              # analytic choice (blocks (27, 139))
    (16, 128, 32, 254),     # Wc-dense, short rows
    (48, 128, 64, 254),     # Wc-dense, taller rows
    (48, 384, 64, 511),     # Wc=256, wide valid
    (112, 128, 128, 254),   # Wc-dense, tall
    (16, 384),              # analytic-wide (blocks (27, 395))
]
best, timings = autotune_block_geometry(
    (512, 512, 31), 12, 12, n_kernels=256, candidates=candidates,
    iters=2, register=False,
)
print(json.dumps({
    "best": list(best),
    "timings_ms": {str(k): round(v * 1e3, 1) for k, v in timings.items()},
}))
