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


def _probe_complex_d2h_subprocess() -> bool | None:
    """Probe complex64 D2H in a SUBPROCESS: on the runtimes this library
    targets, a failed complex transfer is UNIMPLEMENTED *and poisons the
    process* — catching the exception in-process does not un-poison it, so
    the probe must be isolated. Returns True/False, or None if the probe
    subprocess could not run."""
    import os
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "s = jax.jit(jnp.fft.rfft2)(jnp.ones((8, 8), jnp.float32))\n"
        "np.asarray(s)\n"
    )
    env = os.environ.copy()
    if jax.default_backend() == "cpu":
        # Probe the backend the PARENT actually uses (tests force CPU via
        # jax.config, which subprocesses don't inherit).
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=300,
            env=env,
        )
        return r.returncode == 0
    except Exception:
        return None


def selftest(run_pallas: bool = True, probe_complex_d2h: bool = False) -> dict:
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
    # stores spectra as split f32 planes so it never needs it; the probe is
    # OPT-IN and runs in a subprocess because a failed attempt poisons the
    # probing process on exactly the runtimes it matters for).
    if probe_complex_d2h:
        report["complex_d2h_ok"] = _probe_complex_d2h_subprocess()

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
