"""Fused spectral-MAC tests (ops/spectral_mac.py ≈ the
elementwiseProductAndNormalize + sumAlongFeatures pair,
src/cudaConvFFTData.cuh:47-92). The Pallas kernel runs in interpret mode on
CPU; on TPU (FFTCONV_TEST_TPU=1) it compiles for real."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from cuda_fft_convolution_tpu.ops.spectral_mac import (
    spectral_mac_auto,
    spectral_mac_einsum,
    spectral_mac_pallas,
)


def _random_spectra(rng, b, n, f, h, wc):
    # Build the complex arrays ON DEVICE from real planes: transferring a
    # host complex64 array H2D is UNIMPLEMENTED on the axon TPU runtime and
    # poisons the process (CLAUDE.md quirk), while device-side complex via
    # the X64Split emulation works fine.
    mk = jax.jit(jax.lax.complex)
    d = mk(
        jnp.asarray(rng.standard_normal((b, f, h, wc)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, f, h, wc)).astype(np.float32)),
    )
    k = mk(
        jnp.asarray(rng.standard_normal((n, f, h, wc)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n, f, h, wc)).astype(np.float32)),
    )
    return d, k


def _ref(d, k):
    return np.einsum(
        "bfhw,nfhw->bnhw",
        np.asarray(jax.jit(jnp.real)(d)).astype(np.complex128)
        + 1j * np.asarray(jax.jit(jnp.imag)(d)),
        np.asarray(jax.jit(jnp.real)(k)).astype(np.complex128)
        + 1j * np.asarray(jax.jit(jnp.imag)(k)),
    )


@pytest.mark.parametrize(
    "b,n,f,h,wc",
    [
        (1, 1, 1, 8, 9),
        (1, 3, 5, 80, 9),  # demo geometry
        (2, 4, 2, 16, 130),  # lane-crossing wc
        (1, 2, 31, 33, 17),  # HOG-ish F, odd dims
    ],
)
def test_pallas_matches_einsum(rng, b, n, f, h, wc):
    d, k = _random_spectra(rng, b, n, f, h, wc)
    ref = _ref(d, k)
    interpret = jax.default_backend() != "tpu"
    got_p = spectral_mac_pallas(d, k, interpret=interpret)
    got_e = spectral_mac_einsum(d, k)
    for got in (got_p, got_e):
        gr = np.asarray(jax.jit(jnp.real)(got))
        gi = np.asarray(jax.jit(jnp.imag)(got))
        err = np.max(np.abs((gr + 1j * gi) - ref)) / np.max(np.abs(ref))
        assert err < 1e-5


def test_auto_dispatch_runs(rng):
    d, k = _random_spectra(rng, 1, 2, 3, 16, 9)
    out = spectral_mac_auto(d, k)
    assert out.shape == (1, 2, 16, 9)
    out = spectral_mac_auto(d, k, use_pallas=False)
    assert out.shape == (1, 2, 16, 9)
