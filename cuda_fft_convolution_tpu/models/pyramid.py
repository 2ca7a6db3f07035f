"""Multi-scale (image-pyramid) filter-bank detection.

The reference's intended deployment: DPM/HOG detectors evaluate the same
filter bank against every level of an image pyramid, reusing each level's
data FFT across the bank (SURVEY.md §3.3 "a detector evaluating new filter
batches against the same image pyramid level"). This module makes the
pyramid a first-class object: build levels once, precompute one
SpectralData per level (each a reusable checkpointable spectrum), and score
the bank against all levels.

Levels have different static shapes, so each level is its own jitted
program (compiled once per shape) — the idiomatic JAX treatment of a
ragged multiscale workload.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cuda_fft_convolution_tpu import api as _api
from cuda_fft_convolution_tpu.types import SpectralData
from cuda_fft_convolution_tpu.utils.errors import validate


@dataclasses.dataclass(frozen=True)
class Pyramid:
    """Image pyramid + per-level precomputed spectra."""

    levels: tuple  # tuple of (Hi, Wi, F) arrays, level 0 = full resolution
    spectra: tuple  # tuple of SpectralData, aligned with levels
    scale: float


def build_pyramid(
    image: jnp.ndarray,  # (H, W, F)
    max_kernel_h: int,
    max_kernel_w: int,
    *,
    num_levels: int = 5,
    scale: float = 2 ** -0.5,
    policy=None,
) -> Pyramid:
    """Downscale ``image`` by ``scale`` per level (bilinear) until either
    ``num_levels`` levels exist or a level would be smaller than the kernel,
    precomputing each level's reusable data spectrum (≈ one cudaFFTData per
    level)."""
    validate(image.ndim == 3, f"image must be (H, W, F); got {image.shape}")
    image = jnp.asarray(image, jnp.float32)
    h, w, f = image.shape
    levels = []
    spectra = []
    cur = image
    for lvl in range(num_levels):
        lh, lw = cur.shape[0], cur.shape[1]
        if lh < max_kernel_h or lw < max_kernel_w:
            break
        levels.append(cur)
        spectra.append(
            _api.fft_data(cur, max_kernel_h, max_kernel_w, policy=policy)
        )
        nh, nw = max(int(round(lh * scale)), 1), max(int(round(lw * scale)), 1)
        if (nh, nw) == (lh, lw):
            break
        cur = jax.image.resize(cur, (nh, nw, f), method="bilinear")
    validate(len(levels) > 0, "image smaller than the kernel at level 0")
    return Pyramid(levels=tuple(levels), spectra=tuple(spectra), scale=scale)


def detect_pyramid(
    pyramid: Pyramid,
    kernels,
    *,
    mode: str = "same",
    correlation: bool = True,
) -> list:
    """Score the bank against every pyramid level → list (one entry per
    level) of per-kernel maps. Each level's data FFT is reused across the
    whole bank; the bank's spectra are recomputed per level (levels have
    different FFT sizes — the same constraint the reference has)."""
    return [
        _api.conv_spectral(sd, kernels, mode=mode, correlation=correlation)
        for sd in pyramid.spectra
    ]


def top_detections(
    level_scores: list, k: int = 5
) -> list[tuple[int, int, int, int, float]]:
    """Collect the top-k (level, kernel, row, col, score) peaks across all
    levels of a detect_pyramid result.

    Accepts every output shape detect_pyramid produces: stacked (N, H, W)
    arrays, ragged-bank per-kernel LISTS of (H, W) maps (each possibly a
    different window size), and batched variants with a leading B axis
    (peaks are searched across the batch; row/col are within the best
    image)."""
    import numpy as np

    hits = []
    for lvl, scores in enumerate(level_scores):
        # Normalize to a list of per-kernel maps (ragged banks return lists
        # whose windows differ per kernel — they cannot be stacked).
        if isinstance(scores, (list, tuple)):
            per_kernel = [np.asarray(s) for s in scores]
        else:
            arr = np.asarray(scores)
            if arr.ndim == 3:  # (N, H, W)
                per_kernel = [arr[i] for i in range(arr.shape[0])]
            elif arr.ndim == 4:  # (B, N, H, W) batched
                per_kernel = [arr[:, i] for i in range(arr.shape[1])]
            else:
                raise ValueError(
                    f"level {lvl}: expected (N, H, W) or (B, N, H, W) "
                    f"scores, got shape {arr.shape}"
                )
        for kk, m in enumerate(per_kernel):
            flat_idx = int(np.argmax(m))
            best = float(m.reshape(-1)[flat_idx])
            # row/col within the (possibly batch-leading) map
            coords = np.unravel_index(flat_idx, m.shape)
            r, c = int(coords[-2]), int(coords[-1])
            hits.append((lvl, kk, r, c, best))
    hits.sort(key=lambda t: -t[4])
    return hits[:k]
