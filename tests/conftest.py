"""Test configuration: run on a simulated 8-device CPU mesh.

The reference can only be verified on CUDA hardware (its streams variant
even hard-forces N_GPU=1, src/cudaConvFFTDataStreams.cu:271 — SURVEY.md §4
"multi-GPU is never tested"). Here the whole suite — including multi-device
sharding — runs anywhere, on 8 virtual CPU devices
(--xla_force_host_platform_device_count), the TPU answer to "test multi-node
without a cluster".

Set FFTCONV_TEST_TPU=1 to run the suite on the attached TPU instead
(single device; mesh tests auto-skip when fewer than 2 devices exist).

Note: this environment's sitecustomize force-registers an `axon` TPU
platform and overrides JAX_PLATFORMS via jax.config, so plain env vars are
not enough — we flip jax.config back before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("FFTCONV_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    # First TPU compiles go through a remote-compile service (minutes);
    # persist them so a suite run is feasible and re-runs are fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
