"""API plumbing tests for the carried-forward padding/layout capabilities:
padding='clamp' (padDataClampToBorder, src/convolutionFFTkernel.cu:46-76),
kernel_layout='centered' (padKernel, :13-40), and same_offset='matlab'
(MATLAB conv2 'same' parity — offset Kh//2 vs scipy's (Kh-1)//2)."""

import numpy as np
import pytest

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.utils.errors import InvalidInputError
from tests.oracles import conv_same_nearest_f64, rel_err

TOL = 1e-5


def _clamp_pad_f64(x, fft_h, fft_w, bh, bw):
    """f64 oracle of pad_clamp_to_border: the reference's three-region rule
    (src/convolutionFFTkernel.cu:65-74) — data, (bh, bw) far-edge clamp
    band, row/col-0 replicas beyond."""
    h, w = x.shape
    ih, iw = np.arange(fft_h), np.arange(fft_w)
    rows = np.where(ih < h, np.minimum(ih, h - 1),
                    np.where(ih < h + bh, h - 1, 0))
    cols = np.where(iw < w, np.minimum(iw, w - 1),
                    np.where(iw < w + bw, w - 1, 0))
    return x[np.ix_(rows, cols)]


def test_fft_conv_padding_clamp_vs_oracle(rng):
    data = rng.standard_normal((40, 36, 2)).astype(np.float32)
    kern = rng.standard_normal((7, 5, 2)).astype(np.float32)
    out = np.array(
        fc.fft_conv(data, 7, 5, [kern], mode="fftmap", padding="clamp",
                    policy="fast")
    )[0]
    fft_h, fft_w = out.shape
    ref = np.zeros((fft_h, fft_w))
    for c in range(2):
        dp = _clamp_pad_f64(data[:, :, c].astype(np.float64), fft_h, fft_w,
                            3, 2)  # band = kernel-center ('same') offset
        kf = np.fft.fft2(kern[:, :, c].astype(np.float64), (fft_h, fft_w))
        ref += np.real(np.fft.ifft2(np.fft.fft2(dp) * kf))
    assert rel_err(out, ref) < TOL


@pytest.mark.parametrize("ksz,off", [((7, 5), "scipy"), ((6, 4), "matlab")])
def test_clamp_same_equals_nearest_boundary(rng, ksz, off):
    """mode='same' + padding='clamp' == direct convolution with replicated
    borders on EVERY edge — including the top/left edges, whose taps reach
    the pad through the circular wrap (the wrap-to-origin region), and
    including exact-fit FFT sizes where the pad is only kernel−1 wide
    (policy='fast' at 26+7−1=32 / 28+5−1=32 below)."""
    kh, kw = ksz
    data = rng.standard_normal((26, 28)).astype(np.float32)
    kern = rng.standard_normal((kh, kw)).astype(np.float32)
    out = np.array(
        fc.fft_conv(data[:, :, None], kh, kw, [kern[:, :, None]],
                    mode="same", padding="clamp", policy="fast",
                    same_offset=off)
    )[0]
    dh = kh // 2 if off == "matlab" else (kh - 1) // 2
    dw = kw // 2 if off == "matlab" else (kw - 1) // 2
    ref = conv_same_nearest_f64(
        data.astype(np.float64), kern.astype(np.float64), dh, dw
    )
    assert out.shape == ref.shape
    assert rel_err(out, ref) < TOL


def test_fft_data_padding_clamp_split_api(rng):
    """fft_data(padding='clamp') → conv_spectral ≡ one-shot with clamp."""
    data = rng.standard_normal((30, 30, 1)).astype(np.float32)
    kern = rng.standard_normal((6, 6, 1)).astype(np.float32)
    one = np.array(
        fc.fft_conv(data, 6, 6, [kern], mode="fftmap", padding="clamp")
    )
    sd = fc.fft_data(data, 6, 6, padding="clamp")
    split = np.array(fc.conv_spectral(sd, [kern], mode="fftmap"))
    np.testing.assert_allclose(one, split, atol=1e-6)


def test_kernel_layout_centered_equals_matlab_same(rng):
    """Centered kernels produce un-shifted maps: mode='same' with centered
    layout == corner layout with the MATLAB Kh//2 offset (exactly the shift
    padKernel encodes)."""
    data = rng.standard_normal((32, 28, 3)).astype(np.float32)
    for ksz in [(6, 4), (5, 7)]:  # even (conventions differ) and odd (agree)
        kern = rng.standard_normal((*ksz, 3)).astype(np.float32)
        cent = np.array(
            fc.fft_conv(data, kernels=[kern], mode="same",
                        kernel_layout="centered")
        )
        matl = np.array(
            fc.fft_conv(data, kernels=[kern], mode="same",
                        same_offset="matlab", algorithm="direct")
        )
        assert rel_err(cent, matl) < TOL
        scip = np.array(
            fc.fft_conv(data, kernels=[kern], mode="same",
                        algorithm="direct")
        )
        if ksz[0] % 2 == 1 and ksz[1] % 2 == 1:
            assert rel_err(cent, scip) < TOL
        else:
            assert rel_err(cent, scip) > 1e-3  # conventions really differ


def test_centered_ragged_bank(rng):
    """Each ragged kernel centers at its OWN size."""
    data = rng.standard_normal((24, 24, 1)).astype(np.float32)
    kerns = [
        rng.standard_normal((5, 5, 1)).astype(np.float32),
        rng.standard_normal((9, 3, 1)).astype(np.float32),
    ]
    cent = fc.fft_conv(data, kernels=kerns, mode="same",
                       kernel_layout="centered")
    for k, c in zip(kerns, cent):
        m = np.array(
            fc.fft_conv(data, kernels=[k], mode="same", same_offset="matlab",
                        algorithm="direct")
        )[0]
        assert rel_err(np.array(c), m) < TOL


def test_matlab_same_offset_tiled_matches_direct(rng):
    """same_offset='matlab' through the tiled engine (baked window) must
    match the direct engine."""
    data = rng.standard_normal((96, 96, 1)).astype(np.float32)
    kerns = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    t = np.array(
        fc.fft_conv(data, 8, 8, kerns, mode="same", algorithm="tiled",
                    same_offset="matlab")
    )
    d = np.array(
        fc.fft_conv(data, 8, 8, kerns, mode="same", algorithm="direct",
                    same_offset="matlab")
    )
    assert rel_err(t, d) < TOL
    # matlab vs scipy really shift by one pixel for even kernels
    s = np.array(
        fc.fft_conv(data, 8, 8, kerns, mode="same", algorithm="direct")
    )
    np.testing.assert_allclose(d[:, :-1, :-1], s[:, 1:, 1:], atol=1e-4)


def test_centered_rejects_unsupported_combos(rng):
    data = rng.standard_normal((16, 16, 1)).astype(np.float32)
    kern = rng.standard_normal((4, 4, 1)).astype(np.float32)
    with pytest.raises(InvalidInputError):
        fc.fft_conv(data, kernels=[kern], mode="full",
                    kernel_layout="centered")
    with pytest.raises(InvalidInputError):
        fc.fft_conv(data, kernels=[kern], mode="same",
                    kernel_layout="centered", algorithm="tiled")
    with pytest.raises(InvalidInputError):
        fc.fft_kernels([kern], 16, 16, kernel_layout="centered",
                       correlation=True)
    with pytest.raises(InvalidInputError):
        fc.fft_conv(data, kernels=[kern], mode="same", padding="clamp",
                    algorithm="tiled")


def test_centered_kernels_checkpoint_roundtrip(rng, tmp_path):
    from cuda_fft_convolution_tpu.utils.checkpoint import (
        load_spectral,
        save_spectral,
    )

    kern = rng.standard_normal((5, 5, 1)).astype(np.float32)
    sk = fc.fft_kernels([kern], 16, 16, kernel_layout="centered")
    assert sk.centered
    p = str(tmp_path / "sk.npz")
    save_spectral(p, sk)
    back = load_spectral(p)
    assert back.centered is True
    np.testing.assert_array_equal(np.array(back.re), np.array(sk.re))


def test_clamp_full_mode_rejected(rng):
    """mode='full' under padding='clamp' is a validation error on every
    entry point (the pad mixes far-edge band and wrap-to-origin replicas —
    only 'same'/'fftmap'/'valid' have coherent edge semantics). The flag
    survives a checkpoint round trip."""
    data = rng.standard_normal((24, 24, 1)).astype(np.float32)
    kern = rng.standard_normal((5, 5, 1)).astype(np.float32)
    with pytest.raises(InvalidInputError, match="clamp"):
        fc.fft_conv(data, 5, 5, [kern], mode="full", padding="clamp")
    sd = fc.fft_data(data, 5, 5, padding="clamp")
    assert sd.clamp
    with pytest.raises(InvalidInputError, match="clamp"):
        fc.conv_spectral(sd, [kern], mode="full")
    with pytest.raises(InvalidInputError, match="clamp"):
        fc.conv_spectral_pipelined(sd, [kern], mode="full", chunk_size=1)
    # 'valid' never reads the pad: identical to zero-pad 'valid'
    v_clamp = np.array(fc.conv_spectral(sd, [kern], mode="valid"))
    sd0 = fc.fft_data(data, 5, 5)
    v_zero = np.array(fc.conv_spectral(sd0, [kern], mode="valid"))
    np.testing.assert_allclose(v_clamp, v_zero, atol=1e-5)


def test_clamp_flag_checkpoint_roundtrip(rng, tmp_path):
    data = rng.standard_normal((20, 20, 1)).astype(np.float32)
    sd = fc.fft_data(data, 4, 4, padding="clamp", same_offset="matlab")
    p = str(tmp_path / "clamped.npz")
    fc.save_spectral(p, sd)
    sd2 = fc.load_spectral(p)
    assert sd2.clamp is True
    with pytest.raises(InvalidInputError, match="clamp"):
        fc.conv_spectral(sd2, [rng.standard_normal((4, 4, 1))
                               .astype(np.float32)], mode="full")


def test_clamp_centered_even_kernel_default_offset(rng):
    """padding='clamp' + kernel_layout='centered' with an EVEN kernel at
    the DEFAULT same_offset: the clamp band must be sized by the centered
    anchor K//2 (the roll shift), not by the scipy (K−1)//2 trim offset —
    they differ for even kernels, and a scipy-sized band puts row-0
    replicas where bottom-edge outputs expect far-edge replicas
    (regression: 0.31 max rel err before the band was layout-aware)."""
    data = rng.standard_normal((26, 24, 1)).astype(np.float32)
    kern = rng.standard_normal((6, 6, 1)).astype(np.float32)
    out = np.array(
        fc.fft_conv(data, 6, 6, [kern], mode="same", padding="clamp",
                    kernel_layout="centered")
    )[0]
    # centered maps anchor at K//2 regardless of the trim convention
    ref = conv_same_nearest_f64(data[:, :, 0], kern[:, :, 0], 3, 3)
    assert out.shape == ref.shape
    assert rel_err(out, ref) < TOL


def test_clamp_band_mismatch_rejected(rng):
    """The split API records the clamp band on SpectralData, so a 'same'
    trim whose anchor the band cannot serve is a validation error, not a
    silent wrong answer: (a) a band sized for same_offset='scipy' used
    with a 'matlab' trim on an even kernel; (b) a kernel LARGER than the
    max_kernel the band was sized for (but still within FFT dims); (c) a
    corner-sized band consumed by a centered bank."""
    data = rng.standard_normal((30, 30, 1)).astype(np.float32)
    k6 = rng.standard_normal((6, 6, 1)).astype(np.float32)
    sd = fc.fft_data(data, 6, 6, padding="clamp")  # scipy band = 2
    assert (sd.band_h, sd.band_w) == (2, 2)
    with pytest.raises(InvalidInputError, match="band"):
        fc.conv_spectral(sd, [k6], mode="same", same_offset="matlab")
    # matching convention passes
    np.array(fc.conv_spectral(sd, [k6], mode="same"))
    # (b) larger kernel than the band was planned for
    sd_big = fc.fft_data(data, 12, 12, padding="clamp")
    k12 = rng.standard_normal((12, 12, 1)).astype(np.float32)
    np.array(fc.conv_spectral(sd_big, [k12], mode="same"))
    sd_small_band = fc.fft_data(data, 6, 6, padding="clamp", policy="pow2")
    with pytest.raises(InvalidInputError, match="band"):
        fc.conv_spectral(sd_small_band, [k12], mode="same")
    # (c) centered bank against a corner-scipy band (anchors differ
    # for even kernels)
    with pytest.raises(InvalidInputError, match="band"):
        fc.conv_spectral(sd, [k6], mode="same", kernel_layout="centered")
    # the layout-aware fft_data band serves it
    sd_c = fc.fft_data(data, 6, 6, padding="clamp",
                       kernel_layout="centered")
    assert (sd_c.band_h, sd_c.band_w) == (3, 3)
    np.array(fc.conv_spectral(sd_c, [k6], mode="same",
                              kernel_layout="centered"))


def test_clamp_band_checkpoint_roundtrip(rng, tmp_path):
    """band_h/band_w survive save/load (−1 'unknown' sentinel must NOT be
    collapsed to None by the optional-field convention) and the reloaded
    object still validates trims."""
    data = rng.standard_normal((20, 20, 1)).astype(np.float32)
    sd = fc.fft_data(data, 6, 6, padding="clamp", same_offset="matlab")
    p = str(tmp_path / "band.npz")
    fc.save_spectral(p, sd)
    sd2 = fc.load_spectral(p)
    assert (sd2.band_h, sd2.band_w) == (sd.band_h, sd.band_w) == (3, 3)
    with pytest.raises(InvalidInputError, match="band"):
        fc.conv_spectral(sd2, [rng.standard_normal((6, 6, 1))
                               .astype(np.float32)], mode="same")
    # non-clamp spectra round-trip the −1 sentinel, not None
    sd0 = fc.fft_data(data, 6, 6)
    fc.save_spectral(p, sd0)
    back = fc.load_spectral(p)
    assert back.band_h == -1 and back.band_w == -1
