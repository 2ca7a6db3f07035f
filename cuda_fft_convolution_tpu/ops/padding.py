"""Padding ops.

Reference equivalents:
  - ``pad_to_fft``          ≈ ``padData`` (src/cudaConvFFTData.cuh:11-31):
    zero-pad an H×W×F array into FFT_H×FFT_W×F, data in the top-left corner.
  - ``pad_clamp_to_border`` ≈ the vestigial texture-based ``padData`` in
    src/convolutionFFTkernel.cu:46-76, which replicates edge pixels into the
    pad band instead of zeros (named as a capability to carry forward in
    BASELINE.json). The reference version also wraps the far pad region back
    to row/col 0 for kernel-centering; here we expose the useful semantic —
    edge replication over the (kernel-1)-wide band, zero (wrap) elsewhere is
    not needed because linear-conv consumers only read the valid window.

On TPU these are pure data-movement ops; XLA lowers ``jax.lax.pad`` /
dynamic-slice fusions efficiently, so no Pallas is needed for zero padding —
it fuses into the FFT's input. Border-clamp uses clamped gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_fft(x: jnp.ndarray, fft_h: int, fft_w: int) -> jnp.ndarray:
    """Zero-pad the last two axes (H, W) of ``x`` up to (fft_h, fft_w).

    Data lands in the top-left corner, matching the reference's padData
    (src/cudaConvFFTData.cuh:24-29). Leading axes (channels, bank, batch)
    pass through. Works for any rank >= 2.
    """
    h, w = x.shape[-2], x.shape[-1]
    if h == fft_h and w == fft_w:
        return x
    if h > fft_h or w > fft_w:
        raise ValueError(
            f"input spatial dims ({h},{w}) exceed FFT dims ({fft_h},{fft_w})"
        )
    pad_widths = [(0, 0)] * (x.ndim - 2) + [(0, fft_h - h), (0, fft_w - w)]
    return jnp.pad(x, pad_widths)


def pad_kernel_centered(
    kernel: jnp.ndarray, fft_h: int, fft_w: int
) -> jnp.ndarray:
    """Zero-pad a (..., Kh, Kw) kernel to (fft_h, fft_w) with its CENTER at
    the origin, wrapping the upper-left quadrant to the far corners.

    ≈ the vestigial ``padKernel`` (src/convolutionFFTkernel.cu:13-40), which
    centers kernels so convolution outputs are un-shifted ('same' window at
    rows/cols [0, H) directly). The library's main paths anchor kernels
    top-left like the reference's built path and trim windows instead; this
    op exists for users porting kernel-centered pipelines."""
    kh, kw = kernel.shape[-2], kernel.shape[-1]
    if kh > fft_h or kw > fft_w:
        raise ValueError(
            f"kernel ({kh},{kw}) exceeds FFT dims ({fft_h},{fft_w})"
        )
    padded = pad_to_fft(kernel, fft_h, fft_w)
    # shift so the center lands at (0, 0); circular wrap moves the
    # upper-left of the kernel into the array's far corners
    return jnp.roll(padded, (-(kh // 2), -(kw // 2)), axis=(-2, -1))


def pad_clamp_to_border(
    x: jnp.ndarray, fft_h: int, fft_w: int, border_h: int, border_w: int
) -> jnp.ndarray:
    """Pad (H, W) up to (fft_h, fft_w): replicate edge values through a
    border band of (border_h, border_w) rows/cols, zero beyond it.

    Semantic match for src/convolutionFFTkernel.cu:65-74 with the wrap-to-0
    region replaced by zeros (the wrap exists there only to center kernels;
    our kernels are corner-anchored like the built reference path).
    """
    h, w = x.shape[-2], x.shape[-1]
    if h > fft_h or w > fft_w:
        raise ValueError(
            f"input spatial dims ({h},{w}) exceed FFT dims ({fft_h},{fft_w})"
        )
    # Clamped index gather along each spatial axis, then zero the far region.
    rows = jnp.minimum(jnp.arange(fft_h), h - 1)
    cols = jnp.minimum(jnp.arange(fft_w), w - 1)
    out = x[..., rows, :][..., :, cols]
    row_live = (jnp.arange(fft_h) < h + border_h)[:, None]
    col_live = (jnp.arange(fft_w) < w + border_w)[None, :]
    return out * (row_live & col_live).astype(x.dtype)
