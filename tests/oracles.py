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


def conv_same_nearest_f64(
    data: np.ndarray, kern: np.ndarray, dh: int, dw: int
) -> np.ndarray:
    """Direct 'same'-window convolution (single channel, f64) with
    'nearest' (edge-replicate) boundary handling: taps outside the image
    read the clipped edge pixel. (dh, dw) is the window anchor — the
    'same' offset for corner-anchored kernels, the K//2 roll shift for
    centered ones. This is the end-to-end semantic padding='clamp'
    exists to deliver (src/convolutionFFTkernel.cu:46-76)."""
    data = np.asarray(data, np.float64)
    kern = np.asarray(kern, np.float64)
    h, w = data.shape
    kh, kw = kern.shape
    out = np.zeros((h, w))
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    for i in range(kh):
        for j in range(kw):
            sy = np.clip(ys + dh - i, 0, h - 1)
            sx = np.clip(xs + dw - j, 0, w - 1)
            out += data[sy, sx] * kern[i, j]
    return out


def rel_err(got, want) -> float:
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = np.max(np.abs(want))
    if denom == 0:
        return float(np.max(np.abs(got)))
    return float(np.max(np.abs(got - want)) / denom)
