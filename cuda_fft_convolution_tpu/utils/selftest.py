"""Backend capability probe — ≈ ``checkDeviceProp``
(src/cudaConvFFTData.h:47-65), which printf'd compute capability and
concurrent-kernel support. Here: one call that reports what the attached
backend can actually do (FFT, complex transfers, Pallas) and the basic
hardware facts the planner uses. Cheap enough to run at service startup;
returns a dict instead of printing."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def selftest(run_pallas: bool = True) -> dict:
    dev = jax.devices()[0]
    report: dict = {
        "backend": jax.default_backend(),
        "device_kind": dev.device_kind,
        "device_count": len(jax.devices()),
    }
    try:
        stats = dev.memory_stats() or {}
        report["hbm_bytes_limit"] = int(stats.get("bytes_limit", 0))
    except Exception:
        report["hbm_bytes_limit"] = 0

    # FFT round trip
    try:
        x = jnp.ones((2, 16, 16), jnp.float32)
        y = jax.jit(
            lambda a: jnp.fft.irfft2(jnp.fft.rfft2(a), s=(16, 16))
        )(x)
        report["fft_ok"] = bool(
            np.allclose(np.asarray(y), np.ones((2, 16, 16)), atol=1e-5)
        )
    except Exception as e:
        report["fft_ok"] = False
        report["fft_error"] = repr(e)

    # complex D2H (known-unimplemented on some TPU runtimes — the library
    # works around it with utils.transfer.fetch, but callers should know)
    try:
        s = jax.jit(jnp.fft.rfft2)(jnp.ones((8, 8), jnp.float32))
        np.asarray(s)
        report["complex_d2h_ok"] = True
    except Exception:
        report["complex_d2h_ok"] = False

    # Pallas MAC (compiled on TPU, interpreted elsewhere)
    if run_pallas:
        try:
            from cuda_fft_convolution_tpu.ops.spectral_mac import (
                spectral_mac_pallas,
            )

            d = jax.jit(jnp.fft.rfft2)(jnp.ones((1, 1, 8, 16), jnp.float32))
            k = jax.jit(jnp.fft.rfft2)(jnp.ones((2, 1, 8, 16), jnp.float32))
            out = spectral_mac_pallas(
                d, k, interpret=jax.default_backend() != "tpu"
            )
            jax.block_until_ready(out)
            report["pallas_ok"] = True
        except Exception as e:
            report["pallas_ok"] = False
            report["pallas_error"] = repr(e)

    from cuda_fft_convolution_tpu.runtime.planner import get_native_planner

    report["native_planner_ok"] = get_native_planner() is not None
    return report
