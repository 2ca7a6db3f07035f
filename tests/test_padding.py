"""Padding op tests (ops/padding.py ≈ padData src/cudaConvFFTData.cuh:11-31
and the clamp-to-border variant src/convolutionFFTkernel.cu:46-76)."""

import numpy as np
import pytest

from cuda_fft_convolution_tpu.ops.padding import pad_clamp_to_border, pad_to_fft


def test_pad_to_fft_corner(rng):
    x = rng.standard_normal((3, 5, 7)).astype(np.float32)
    out = np.array(pad_to_fft(x, 8, 16))
    assert out.shape == (3, 8, 16)
    np.testing.assert_array_equal(out[:, :5, :7], x)
    assert np.all(out[:, 5:, :] == 0)
    assert np.all(out[:, :, 7:] == 0)


def test_pad_to_fft_noop_and_errors(rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    assert pad_to_fft(x, 5, 7) is x
    with pytest.raises(ValueError):
        pad_to_fft(x, 4, 7)


def test_pad_clamp_to_border(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32)
    out = np.array(pad_clamp_to_border(x, 8, 12, 2, 3))
    assert out.shape == (8, 12)
    np.testing.assert_array_equal(out[:4, :6], x)
    # border band replicates edge values
    np.testing.assert_array_equal(out[4, :6], x[3, :])
    np.testing.assert_array_equal(out[5, :6], x[3, :])
    np.testing.assert_array_equal(out[:4, 6], x[:, 5])
    # beyond the band: zeros
    assert np.all(out[6:, :] == 0)
    assert np.all(out[:, 9:] == 0)
