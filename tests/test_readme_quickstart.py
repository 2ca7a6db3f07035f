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
