"""HOG-style feature extraction (the detection front-end).

The reference's target workload is HOG/DPM filter banks (README.md:4-6);
the features themselves were always computed elsewhere (MATLAB). Here a
minimal, jit-friendly HOG gives the model family an end-to-end path:
image → oriented-gradient cell histograms → FFT filter-bank scoring.

This is "HOG-lite": unsigned gradient orientations binned with linear
interpolation, summed over cells, L2-hys normalized per cell — the parts
that matter for correlation-filter detection, without the block-overlap
bookkeeping of the full descriptor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("cell", "bins"))
def hog_features(
    image: jnp.ndarray,  # (H, W) grayscale or (H, W, C) (channels averaged)
    cell: int = 8,
    bins: int = 9,
) -> jnp.ndarray:
    """(H, W[, C]) → (H//cell, W//cell, bins) fp32 feature map."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 3:
        img = jnp.mean(img, axis=-1)
    h, w = img.shape
    hc, wc = h // cell, w // cell
    img = img[: hc * cell, : wc * cell]

    gy = jnp.gradient(img, axis=0)
    gx = jnp.gradient(img, axis=1)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    # unsigned orientation in [0, pi)
    ang = jnp.mod(jnp.arctan2(gy, gx), jnp.pi)
    pos = ang / jnp.pi * bins  # [0, bins)
    b0 = jnp.floor(pos).astype(jnp.int32) % bins
    b1 = (b0 + 1) % bins
    w1 = pos - jnp.floor(pos)
    w0 = 1.0 - w1

    # per-pixel soft histogram (H, W, bins) via one-hot scatter, then cell sum
    oh0 = jax.nn.one_hot(b0, bins, dtype=jnp.float32) * (mag * w0)[..., None]
    oh1 = jax.nn.one_hot(b1, bins, dtype=jnp.float32) * (mag * w1)[..., None]
    hist = oh0 + oh1
    cells = hist.reshape(hc, cell, wc, cell, bins).sum(axis=(1, 3))

    # L2-hys normalization per cell
    norm = jnp.sqrt(jnp.sum(cells**2, axis=-1, keepdims=True) + 1e-6)
    cells = jnp.clip(cells / norm, 0.0, 0.2)
    norm2 = jnp.sqrt(jnp.sum(cells**2, axis=-1, keepdims=True) + 1e-6)
    return cells / norm2
