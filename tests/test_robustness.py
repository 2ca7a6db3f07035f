"""Robustness: dtype coercion, memory-pressure auto-chunking, transfer
helpers — the defensive paths a production deployment hits."""

import numpy as np
import jax.numpy as jnp
import pytest

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu import api as _api
from tests.oracles import fft_conv_full_f64, rel_err


def test_dtype_coercion_f64_and_int(rng):
    """float64 / integer inputs are accepted and upcast to the fp32
    spectral path (the reference hard-rejects anything but single,
    src/cudaConvolutionFFT.cu:53 — we coerce instead)."""
    data64 = rng.standard_normal((16, 16, 1))  # float64
    kern_i = (rng.integers(-3, 4, (3, 3, 1))).astype(np.int32)
    out = fc.fft_conv(data64, kernels=[kern_i.astype(np.float32)], mode="full")
    ref = fft_conv_full_f64(
        data64.astype(np.float32), kern_i.astype(np.float32)
    )
    assert rel_err(np.array(out[0]), ref) < 1e-5
    assert out.dtype == jnp.float32


def test_memory_pressure_auto_chunking(rng, monkeypatch):
    """When the planner says the bank exceeds the HBM budget,
    conv_spectral transparently chunks — results identical."""
    data = rng.standard_normal((32, 32, 1)).astype(np.float32)
    kerns = [rng.standard_normal((5, 5, 1)).astype(np.float32) for _ in range(6)]
    sd = fc.fft_data(data, 5, 5)
    want = np.array(fc.conv_spectral(sd, kerns))
    # force a tiny budget → chunk_size 1
    monkeypatch.setattr(_api, "_device_memory_budget", lambda: 1 << 16)
    got = np.array(fc.conv_spectral(sd, kerns))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fetch_real_and_complex(rng):
    x = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    np.testing.assert_allclose(fc.fetch(x), np.array(x))
    s = jnp.fft.rfft2(x)
    spec = fc.fetch(s)
    assert spec.dtype == np.complex128 or spec.dtype == np.complex64
    ref = np.fft.rfft2(np.array(x))
    assert np.max(np.abs(spec - ref)) / np.max(np.abs(ref)) < 1e-5


def test_empty_and_single_pixel_edge():
    with pytest.raises(Exception):
        fc.fft_data(np.zeros((0, 4, 1), np.float32), 1, 1)
    out = fc.fft_conv(
        np.ones((1, 1, 1), np.float32),
        kernels=[np.full((1, 1, 1), 2.0, np.float32)],
        mode="full",
    )
    assert np.allclose(np.array(out), 2.0)


def test_bank_of_one_and_many(rng):
    """N=1 and N=257 (odd, >chunk sizes) banks both exact."""
    data = rng.standard_normal((24, 24, 1)).astype(np.float32)
    k = rng.standard_normal((3, 3, 1)).astype(np.float32)
    ref = fft_conv_full_f64(data, k)
    one = fc.fft_conv(data, kernels=[k], mode="full")
    assert rel_err(np.array(one[0]), ref) < 1e-5
    many = fc.fft_conv(data, kernels=[k] * 257, mode="full")
    assert rel_err(np.array(many[0]), ref) < 1e-5
    assert rel_err(np.array(many[256]), ref) < 1e-5


def test_fft_kernels_chunked_transform(rng, monkeypatch):
    """Large banks transform in chunks (bounded temporaries) with results
    identical to the one-shot transform."""
    kerns = rng.standard_normal((9, 5, 5, 2)).astype(np.float32)
    want = fc.fetch(fc.fft_kernels(kerns, fft_h=64, fft_w=64).fft)
    monkeypatch.setattr(_api, "_device_memory_budget", lambda: 1 << 16)
    got = fc.fetch(fc.fft_kernels(kerns, fft_h=64, fft_w=64).fft)
    np.testing.assert_allclose(got, want, atol=1e-6)
