"""Reference oracles, in float64 numpy (no JAX).

The reference's demo validates against two MATLAB oracles
(demoCudaConvolutionFFT.m): spatial conv2 summed over channels (:91-96) and
host fft2/ifft2 at the explicit FFT size (:78-102). These are the same two
oracles as plain numpy, computed in float64 so oracle error is negligible
against the fp32 tolerance under test (BASELINE.json: max rel err ≤1e-5).

Layout note: oracles take channels-LAST (H, W, F) arrays — the public API
layout (≈ MATLAB's).
"""

from __future__ import annotations

import numpy as np


def fft_conv_full_f64(data: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Σ_f linear 'full' conv of data(:,:,f) with kernel(:,:,f), float64.

    ≈ the demo's conv2 oracle (demoCudaConvolutionFFT.m:91-96)."""
    h, w, f = data.shape
    kh, kw, kf = kernel.shape
    assert f == kf
    oh, ow = h + kh - 1, w + kw - 1
    out = np.zeros((oh, ow))
    for c in range(f):
        out += np.real(
            np.fft.ifft2(
                np.fft.fft2(data[:, :, c].astype(np.float64), (oh, ow))
                * np.fft.fft2(kernel[:, :, c].astype(np.float64), (oh, ow))
            )
        )
    return out


def fft_map_f64(
    data: np.ndarray, kernel: np.ndarray, fft_h: int, fft_w: int
) -> np.ndarray:
    """Σ_f circular FFT-domain conv at an explicit FFT size, float64.

    ≈ the demo's fft2/ifft2-at-80×16 oracle (demoCudaConvolutionFFT.m:78-102);
    validates the whole fftmap including the circular-wrap region."""
    f = data.shape[2]
    out = np.zeros((fft_h, fft_w))
    for c in range(f):
        out += np.real(
            np.fft.ifft2(
                np.fft.fft2(data[:, :, c].astype(np.float64), (fft_h, fft_w))
                * np.fft.fft2(kernel[:, :, c].astype(np.float64), (fft_h, fft_w))
            )
        )
    return out


def rel_err(got, want) -> float:
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = np.max(np.abs(want))
    if denom == 0:
        return float(np.max(np.abs(got)))
    return float(np.max(np.abs(got - want)) / denom)
