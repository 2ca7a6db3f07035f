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


@dataclasses.dataclass(frozen=True)
class PyramidPeaks:
    """detect_pyramid_peaks result: per-level top-1 peaks + cross-level join.

    ``values`` (L, N) / ``positions`` (L, N, 2) are each level's per-kernel
    peak response and (row, col) in that LEVEL's ``mode`` window frame
    (exactly argmax over the corresponding detect_pyramid map). The
    ``best_*`` fields join across levels per kernel: ``best_position`` is
    mapped back to level-0 (base image) coordinates by the per-axis level
    size ratio."""

    values: jnp.ndarray  # (L, N) float32
    positions: jnp.ndarray  # (L, N, 2) int32, per-level frame
    best_level: jnp.ndarray  # (N,) int32
    best_value: jnp.ndarray  # (N,) float32
    best_position: jnp.ndarray  # (N, 2) int32, base-image coordinates


def detect_pyramid_peaks(
    pyramid: Pyramid,
    kernels,
    *,
    mode: str = "same",
    correlation: bool = True,
) -> PyramidPeaks:
    """Multi-scale detection without materializing score maps off-device.

    ``detect_pyramid`` + ``top_detections`` fetches every level's full maps
    to the host — through a real serving link that is seconds per map
    (PERF.md round-4 consumption measurement: ~1.4 MB/s effective D2H,
    ~10⁴× the bytes a detection consumer reads). This runs the round-4
    detection head (models.detect_peaks) per pyramid level instead: each
    level's precomputed spectrum scores the whole bank and reduces to
    (max, argmax) on device; only (L, N) values and (L, N, 2) positions
    ever leave the chip. The reference's own demo validates detections by
    peak location, not map contents (demoCudaConvolutionFFT.m:58-61).

    ``kernels`` is a stacked uniform bank (N, Kh, Kw, F), or — for
    mode='same' only, exactly like :func:`detect_peaks` — a ragged cell
    list (mixed kernel sizes, the reference's cell-array scenario,
    demoCudaConvolutionFFT.m:41-43): every 'same' map is level-sized, so
    the per-level reductions share one frame per level. ``mode='fftmap'``
    is rejected (its circular frame has no meaningful global peak)."""
    from cuda_fft_convolution_tpu.models.detect import detect_peaks

    import numpy as np

    per_v, per_p = [], []
    for sd in pyramid.spectra:
        v, p = detect_peaks(sd, kernels, mode=mode, correlation=correlation)
        per_v.append(v)
        per_p.append(p)
    values = jnp.stack(per_v)  # (L, N)
    positions = jnp.stack(per_p)  # (L, N, 2)
    v = np.asarray(values)
    p = np.asarray(positions)
    best_level = v.argmax(axis=0).astype(np.int32)  # (N,)
    best_value = v.max(axis=0)
    h0, w0 = (int(s) for s in pyramid.levels[0].shape[:2])
    best_pos = np.empty((v.shape[1], 2), np.int32)
    for n in range(v.shape[1]):
        lvl = int(best_level[n])
        lh, lw = (int(s) for s in pyramid.levels[lvl].shape[:2])
        y, x = int(p[lvl, n, 0]), int(p[lvl, n, 1])
        best_pos[n] = (round(y * h0 / lh), round(x * w0 / lw))
    return PyramidPeaks(
        values=values,
        positions=positions,
        best_level=jnp.asarray(best_level),
        best_value=jnp.asarray(best_value),
        best_position=jnp.asarray(best_pos),
    )


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
