"""The README quick-start, verbatim in structure (smaller sizes so CPU CI
stays fast) — if this breaks, the front-page example is lying."""

import numpy as np

import cuda_fft_convolution_tpu as fc


def test_readme_quickstart(rng):
    data = rng.standard_normal((128, 128, 3)).astype(np.float32)
    bank = [rng.standard_normal((16, 16, 3)).astype(np.float32) for _ in range(6)]

    scores = fc.fft_conv(data, kernels=bank, mode="same", correlation=True)
    assert scores.shape == (6, 128, 128)

    sd = fc.fft_data(data, 16, 16)
    sk = fc.fft_kernels(bank, spectral=sd)
    maps = fc.conv_spectral(sd, sk)
    assert maps.shape[0] == 6

    sdt = fc.fft_data_tiled(data, 16, 16)
    skt = fc.fft_kernels(bank, spectral=sdt)
    maps_t = fc.conv_spectral(sdt, skt, mode="same")
    assert maps_t.shape == (6, 128, 128)

    mesh = fc.make_mesh(data=1)
    maps_s = fc.conv_spectral_sharded(sd, bank, mesh)
    assert np.asarray(maps_s).shape[0] == 6

    # tiled 'same' equals direct 'same' (different algorithms, same math)
    direct_same = fc.fft_conv(
        data, kernels=bank, mode="same", algorithm="direct", correlation=True
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(direct_same), atol=2e-4
    )


def test_readme_round4_additions(rng):
    """The round-4 quick-start additions: detect_peaks, RaggedConvStream,
    from_reference_packed — structure-verbatim at CI sizes."""
    from cuda_fft_convolution_tpu.models import detect_peaks

    data = rng.standard_normal((96, 96, 2)).astype(np.float32)
    bank = [rng.standard_normal((9, 9, 2)).astype(np.float32) for _ in range(4)]
    frames = [rng.standard_normal((96, 96, 2)).astype(np.float32)
              for _ in range(2)]

    values, positions = detect_peaks(data, np.stack(bank), mode="same")
    assert values.shape == (4,) and positions.shape == (4, 2)

    ragged = bank[:2] + [rng.standard_normal((17, 17, 2)).astype(np.float32)]
    with fc.RaggedConvStream((96, 96, 2), ragged, depth=2,
                             mode="same") as rstream:
        maps = [f.result() for f in map(rstream.submit, frames)]
    assert len(maps) == 2 and len(maps[0]) == 3

    sd = fc.fft_data(data, 9, 9)
    full = np.fft.fft2(
        np.zeros((sd.fft_h, sd.fft_w, 2)) +
        np.pad(data, ((0, sd.fft_h - 96), (0, sd.fft_w - 96), (0, 0))),
        axes=(0, 1),
    )
    gpu_fft_array = full[: sd.fft_h // 2 + 1].astype(np.complex64)
    sd_ref = fc.SpectralData.from_reference_packed(
        gpu_fft_array, data_h=96, data_w=96
    )
    got = fc.conv_spectral(sd_ref, [bank[0]], mode="same")
    want = fc.conv_spectral(sd, [bank[0]], mode="same")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
