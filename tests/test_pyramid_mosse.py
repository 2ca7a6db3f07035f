"""Pyramid detection + MOSSE model-family tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.models import (
    build_pyramid,
    detect_pyramid,
    gaussian_target,
    respond,
    top_detections,
    train_mosse,
    update_mosse,
)


def test_pyramid_levels_and_spectra(rng):
    img = rng.standard_normal((128, 96, 2)).astype(np.float32)
    pyr = build_pyramid(img, 8, 8, num_levels=4)
    assert 1 <= len(pyr.levels) <= 4
    assert len(pyr.spectra) == len(pyr.levels)
    # levels shrink by ~scale
    h0 = pyr.levels[0].shape[0]
    if len(pyr.levels) > 1:
        assert pyr.levels[1].shape[0] < h0
    # spectra geometry matches levels
    for lvl, sd in zip(pyr.levels, pyr.spectra):
        assert sd.data_h == lvl.shape[0] and sd.data_w == lvl.shape[1]


def test_pyramid_detection_finds_scaled_template(rng):
    """A template planted at half resolution is found at the matching
    pyramid level."""
    kern = rng.standard_normal((12, 12, 1)).astype(np.float32)
    big = np.zeros((128, 128, 1), np.float32)
    # plant an upscaled (2x) version of the kernel: it matches best at the
    # level downscaled by ~1/2
    import jax

    up = np.array(
        jax.image.resize(jnp.asarray(kern), (24, 24, 1), method="bilinear")
    )
    big[40:64, 60:84] = up
    pyr = build_pyramid(big, 12, 12, num_levels=4, scale=0.5)
    scores = detect_pyramid(pyr, [kern], mode="same")
    hits = top_detections(scores, k=1)
    lvl, kk, r, c, s = hits[0]
    assert lvl == 1  # the half-resolution level
    # at level 1 the plant occupies rows 20..32, cols 30..42, center ~(26, 36)
    assert abs(r - 26) <= 2 and abs(c - 36) <= 2


def test_mosse_trains_a_peaky_filter(rng):
    """MOSSE trained on shifted copies of a patch responds with a peak at
    the target location on a fresh sample."""
    f, h, w = 1, 32, 32
    fft_h = fft_w = 64
    obj = rng.standard_normal((f, 16, 16)).astype(np.float32)
    patches, targets = [], []
    for (r0, c0) in [(0, 0), (4, 4), (8, 2), (2, 9)]:
        p = np.zeros((f, h, w), np.float32)
        p[:, r0 : r0 + 16, c0 : c0 + 16] = obj
        p += 0.05 * rng.standard_normal((f, h, w)).astype(np.float32)
        patches.append(p)
        targets.append(
            np.array(gaussian_target(fft_h, fft_w, (r0 + 8, c0 + 8), 2.0))
        )
    filt = train_mosse(
        jnp.asarray(np.stack(patches)), jnp.asarray(np.stack(targets)),
        fft_h, fft_w,
    )
    # fresh test patch, object at (6, 6) → peak expected at (14, 14)
    test = np.zeros((f, h, w), np.float32)
    test[:, 6:22, 6:22] = obj
    sd = fc.fft_data(np.transpose(test, (1, 2, 0)), 33, 33, policy="pow2")
    assert (sd.fft_h, sd.fft_w) == (64, 64)
    resp = np.array(respond(filt, sd))
    peak = np.unravel_index(np.argmax(resp), resp.shape)
    assert abs(peak[0] - 14) <= 1 and abs(peak[1] - 14) <= 1


def test_mosse_online_update_runs(rng):
    f, h, w = 2, 16, 16
    filt = train_mosse(
        jnp.asarray(rng.standard_normal((3, f, h, w)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((3, 32, 32)).astype(np.float32)),
        32, 32,
    )
    filt2 = update_mosse(
        filt,
        jnp.asarray(rng.standard_normal((f, h, w)).astype(np.float32)),
        np.array(gaussian_target(32, 32, (8, 8))),
    )
    assert filt2.h_conj.shape == filt.h_conj.shape
    d = float(jnp.max(jnp.abs(jnp.real(filt2.h_conj - filt.h_conj))))
    assert d > 0  # it moved


def test_hog_features_shapes_and_norm(rng):
    from cuda_fft_convolution_tpu.models.hog import hog_features

    img = rng.standard_normal((64, 48)).astype(np.float32)
    f = hog_features(jnp.asarray(img), cell=8, bins=9)
    assert f.shape == (8, 6, 9)
    a = np.array(f)
    assert np.all(a >= 0) and np.all(np.isfinite(a))
    # per-cell unit-ish norm after L2-hys
    norms = np.sqrt((a**2).sum(-1))
    assert np.all(norms < 1.5)
    # gradient-free image → near-zero (normalized garbage but finite)
    flat = hog_features(jnp.ones((32, 32)), cell=8, bins=9)
    assert np.all(np.isfinite(np.array(flat)))


def test_hog_orientation_selectivity(rng):
    """Vertical vs horizontal stripes land in different orientation bins."""
    from cuda_fft_convolution_tpu.models.hog import hog_features

    # sinusoidal gratings (alternating stripes have zero central-difference
    # gradient); v varies along x → vertical edges, h along y
    x = np.sin(2 * np.pi * np.arange(64) / 16).astype(np.float32)
    v = np.tile(x, (64, 1))
    h = v.T.copy()
    fv = np.array(hog_features(jnp.asarray(v), cell=8, bins=9)).sum((0, 1))
    fh = np.array(hog_features(jnp.asarray(h), cell=8, bins=9)).sum((0, 1))
    assert np.argmax(fv) != np.argmax(fh)


def test_top_detections_ragged_and_batched(rng):
    """top_detections handles list-mode (ragged bank) and batched outputs
    (round-1 weak spot: it assumed stacked (N, H, W) arrays)."""
    from cuda_fft_convolution_tpu.models import top_detections

    # ragged list-mode: per-kernel maps with different windows
    lvl0 = [np.zeros((10, 10), np.float32), np.zeros((12, 14), np.float32)]
    lvl0[1][7, 9] = 5.0
    lvl0[0][2, 3] = 3.0
    hits = top_detections([lvl0], k=2)
    assert hits[0] == (0, 1, 7, 9, 5.0)
    assert hits[1] == (0, 0, 2, 3, 3.0)

    # batched stacked mode: (B, N, H, W)
    arr = np.zeros((2, 3, 8, 8), np.float32)
    arr[1, 2, 4, 5] = 9.0
    hits = top_detections([arr], k=1)
    assert hits[0] == (0, 2, 4, 5, 9.0)

    # end-to-end: ragged bank through a real pyramid
    import cuda_fft_convolution_tpu as fc
    from cuda_fft_convolution_tpu.models import build_pyramid, detect_pyramid

    img = rng.standard_normal((64, 64, 2)).astype(np.float32)
    kerns = [
        rng.standard_normal((5, 5, 2)).astype(np.float32),
        rng.standard_normal((3, 7, 2)).astype(np.float32),
    ]
    pyr = build_pyramid(img, 5, 7, num_levels=2)
    scores = detect_pyramid(pyr, kerns, mode="same")
    hits = top_detections(scores, k=4)
    assert len(hits) == 4
    for lvl, kk, r, c, s in hits:
        assert 0 <= lvl < 2 and 0 <= kk < 2
        assert np.isfinite(s)
