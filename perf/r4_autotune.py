#!/usr/bin/env python
"""Round-4 item 4: run the (now dtype-aware, group-sweeping) autotuner on
the chip for the regimes the round-3 VERDICT called untested — 64²-kernel
F≥8 banks and the bf16 tier — and print the measured tables so winners can
be recorded as _BUILTIN entries with provenance."""
import json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cuda_fft_convolution_tpu.runtime.autotune import autotune_block_geometry
from cuda_fft_convolution_tpu.ops.block_conv import _GROUP_TABLE


def emit(**kw):
    print(json.dumps(kw), flush=True)


emit(kind="start", backend=jax.default_backend())
for label, shape, kh, kw, n, dt in (
    ("k64_f8_f32", (1024, 1024, 8), 64, 64, 64, "float32"),
    ("k64_f8_bf16", (1024, 1024, 8), 64, 64, 64, "bfloat16"),
    ("k64_f1_bf16", (2048, 2048, 1), 64, 64, 100, "bfloat16"),
    ("k32_f1_bf16", (2048, 2048, 1), 32, 32, 100, "bfloat16"),
):
    try:
        t0 = time.perf_counter()
        best, table = autotune_block_geometry(
            shape, kh, kw, n_kernels=n, store_dtype=dt, iters=3,
        )
        emit(case=label, best=list(best),
             table={str(k): round(v * 1e3, 1) for k, v in table.items()},
             groups={str(k): list(v) for k, v in _GROUP_TABLE.items()},
             took_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001
        emit(case=label, err=repr(e)[:200])
emit(kind="done")
