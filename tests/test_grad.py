"""Differentiability tests: the whole FFT-conv path has exact VJPs,
including through the Pallas MAC (custom VJP = the einsum contractions).
A capability the reference's MEX pipeline cannot offer at all."""

import jax
import numpy as np
import jax.numpy as jnp

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.ops.spectral_mac import (
    _mac_pallas_ad,
    spectral_mac_einsum,
)


def _spectra(rng, shape):
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
    )


def test_pallas_mac_vjp_matches_einsum(rng):
    d = _spectra(rng, (1, 3, 16, 9))
    k = _spectra(rng, (2, 3, 16, 9))

    def loss_p(d, k):
        out = _mac_pallas_ad(d, k)
        return jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

    def loss_e(d, k):
        out = spectral_mac_einsum(d, k)
        return jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

    gd_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(d, k)
    gd_e, gk_e = jax.grad(loss_e, argnums=(0, 1))(d, k)
    np.testing.assert_allclose(
        np.array(jnp.real(gd_p)), np.array(jnp.real(gd_e)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.array(jnp.imag(gk_p)), np.array(jnp.imag(gk_e)), atol=1e-4
    )


def test_grad_through_fft_conv_finite_difference(rng):
    """End-to-end VJP through fft_data→MAC→irfft2 checked against a central
    finite difference."""
    data = jnp.asarray(rng.standard_normal((12, 10, 2)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((3, 3, 2)).astype(np.float32))

    def loss(k):
        out = fc.fft_conv(data, kernels=k[None], mode="valid")
        return jnp.sum(out**2)

    g = np.array(jax.grad(loss)(kern))
    eps = 1e-2
    i, j, c = 1, 2, 0
    e = np.zeros_like(np.array(kern))
    e[i, j, c] = eps
    f_plus = float(loss(kern + e))
    f_minus = float(loss(kern - e))
    fd = (f_plus - f_minus) / (2 * eps)
    assert abs(g[i, j, c] - fd) / max(abs(fd), 1e-6) < 5e-3


def test_grad_through_tiled_engine(rng):
    """The overlap-save engine is plain jnp → differentiable; its gradient
    must match the direct engine's."""
    data = jnp.asarray(rng.standard_normal((40, 40, 1)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((5, 5, 1)).astype(np.float32))

    def loss(k, algorithm):
        out = fc.fft_conv(data, kernels=k[None], mode="same", algorithm=algorithm)
        return jnp.sum(out**2)

    g_direct = np.array(jax.grad(lambda k: loss(k, "direct"))(kern))
    g_tiled = np.array(jax.grad(lambda k: loss(k, "tiled"))(kern))
    np.testing.assert_allclose(g_tiled, g_direct, rtol=1e-3, atol=1e-2)
