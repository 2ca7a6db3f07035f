"""On-device pyramid detection head: models.detect_pyramid_peaks.

detect_pyramid (round 2) materializes every level's full score maps and
top_detections argmaxes them HOST-side — through a real serving link that
fetch costs seconds per map (PERF.md round-4 consumption measurement:
~1.4 MB/s effective D2H). detect_pyramid_peaks runs the round-4 peaks
head per level instead: only (L, N) values + (L, N, 2) positions ever
leave the device. These tests pin (a) per-level parity with the maps
oracle, (b) the cross-level join + base-coordinate mapping, (c) the
planted-scaled-template scenario from test_pyramid_mosse, detected
without ever materializing maps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.models import (
    build_pyramid,
    detect_pyramid,
    detect_pyramid_peaks,
    top_detections,
)


def _oracle_level_peaks(maps):
    """(N, H, W) maps -> (vals (N,), pos (N, 2))."""
    m = np.asarray(maps)
    flat = m.reshape(m.shape[0], -1)
    idx = flat.argmax(axis=1)
    ys, xs = np.unravel_index(idx, m.shape[1:])
    return flat[np.arange(m.shape[0]), idx], np.stack([ys, xs], axis=-1)


@pytest.mark.parametrize("mode", ["same", "full"])
def test_pyramid_peaks_parity_with_maps(rng, mode):
    """Per-level values/positions match argmaxing detect_pyramid's maps."""
    img = rng.standard_normal((80, 64, 2)).astype(np.float32)
    bank = rng.standard_normal((4, 9, 7, 2)).astype(np.float32)
    pyr = build_pyramid(img, 9, 7, num_levels=3, scale=0.5)
    det = detect_pyramid_peaks(pyr, bank, mode=mode)
    level_maps = detect_pyramid(pyr, bank, mode=mode)
    assert det.values.shape == (len(pyr.levels), 4)
    assert det.positions.shape == (len(pyr.levels), 4, 2)
    for lvl, maps in enumerate(level_maps):
        want_v, want_p = _oracle_level_peaks(maps)
        np.testing.assert_allclose(
            np.asarray(det.values[lvl]), want_v, rtol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(det.positions[lvl]), want_p)


def test_pyramid_peaks_join_and_base_mapping(rng):
    """best_* fields join across levels; base positions scale by the
    per-axis level size ratio."""
    img = rng.standard_normal((64, 96, 1)).astype(np.float32)
    bank = rng.standard_normal((3, 7, 7, 1)).astype(np.float32)
    pyr = build_pyramid(img, 7, 7, num_levels=3, scale=0.5)
    det = detect_pyramid_peaks(pyr, bank)
    nlev = len(pyr.levels)
    v = np.asarray(det.values)
    best_lvl = v.argmax(axis=0)
    np.testing.assert_array_equal(np.asarray(det.best_level), best_lvl)
    np.testing.assert_allclose(
        np.asarray(det.best_value), v.max(axis=0), rtol=1e-6
    )
    h0, w0 = img.shape[:2]
    for k in range(3):
        lvl = int(best_lvl[k])
        lh, lw = pyr.levels[lvl].shape[:2]
        y, x = (int(c) for c in np.asarray(det.positions[lvl, k]))
        want = (round(y * h0 / lh), round(x * w0 / lw))
        got = tuple(int(c) for c in np.asarray(det.best_position[k]))
        assert got == want
    assert 0 <= best_lvl.max() < nlev


def test_pyramid_peaks_finds_scaled_template(rng):
    """The planted-2x-template scenario (test_pyramid_mosse) resolved by
    the peaks head alone: right level, right base position — no maps."""
    kern = rng.standard_normal((12, 12, 1)).astype(np.float32)
    big = np.zeros((128, 128, 1), np.float32)
    up = np.array(
        jax.image.resize(jnp.asarray(kern), (24, 24, 1), method="bilinear")
    )
    big[40:64, 60:84] = up
    pyr = build_pyramid(big, 12, 12, num_levels=4, scale=0.5)
    det = detect_pyramid_peaks(pyr, jnp.asarray(kern)[None])
    assert int(det.best_level[0]) == 1  # the half-resolution level
    y, x = (int(c) for c in np.asarray(det.best_position[0]))
    # plant center in base coords ~ (52, 72)
    assert abs(y - 52) <= 4 and abs(x - 72) <= 4
    # and the join agrees with the maps-based top_detections
    hits = top_detections(detect_pyramid(pyr, [kern], mode="same"), k=1)
    lvl, _, r, c, s = hits[0]
    assert lvl == 1
    np.testing.assert_allclose(float(det.best_value[0]), s, rtol=1e-5)
    assert (int(det.positions[1, 0, 0]), int(det.positions[1, 0, 1])) == (r, c)


def test_pyramid_peaks_ragged_same_and_fftmap_rejection(rng):
    """Ragged cell lists flow through per-level detect_peaks for
    mode='same' (parity vs the maps oracle); 'valid' ragged and 'fftmap'
    are rejected — same contract as detect_peaks."""
    img = rng.standard_normal((48, 48, 1)).astype(np.float32)
    pyr = build_pyramid(img, 8, 8, num_levels=2, scale=0.5)
    cells = [
        rng.standard_normal((8, 8, 1)).astype(np.float32),
        rng.standard_normal((4, 4, 1)).astype(np.float32),
    ]
    det = detect_pyramid_peaks(pyr, cells)
    assert det.values.shape == (len(pyr.levels), 2)
    level_maps = detect_pyramid(pyr, cells, mode="same")
    for lvl, maps in enumerate(level_maps):
        want_v, want_p = _oracle_level_peaks(np.stack(
            [np.asarray(m) for m in maps]
        ))
        np.testing.assert_allclose(
            np.asarray(det.values[lvl]), want_v, rtol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(det.positions[lvl]), want_p)
    with pytest.raises(fc.InvalidInputError):
        detect_pyramid_peaks(pyr, cells, mode="valid")
    with pytest.raises(fc.InvalidInputError):
        detect_pyramid_peaks(pyr, np.ones((1, 8, 8, 1), np.float32),
                             mode="fftmap")
