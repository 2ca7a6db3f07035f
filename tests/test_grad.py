"""Differentiability tests: the whole FFT-conv path has exact VJPs,
including through the Pallas MAC (custom VJP = the einsum contractions).
A capability the reference's MEX pipeline cannot offer at all."""

import jax
import numpy as np
import jax.numpy as jnp

import cuda_fft_convolution_tpu as fc
from cuda_fft_convolution_tpu.ops.spectral_mac import (
    _mac_pallas_ad,
    spectral_mac_planes,
)


def _planes(rng, shape):
    return (
        jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
        jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
    )


def test_pallas_mac_vjp_matches_einsum(rng):
    dr, di = _planes(rng, (1, 3, 16, 9))
    kr, ki = _planes(rng, (2, 3, 16, 9))

    def loss_p(dr, di, kr, ki):
        o_r, o_i = _mac_pallas_ad(dr, di, kr, ki)
        return jnp.sum(o_r**2 + o_i**2)

    def loss_e(dr, di, kr, ki):
        o_r, o_i = spectral_mac_planes(dr, di, kr, ki)
        return jnp.sum(o_r**2 + o_i**2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(dr, di, kr, ki)
    g_e = jax.grad(loss_e, argnums=(0, 1, 2, 3))(dr, di, kr, ki)
    for a, b in zip(g_p, g_e):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)


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


def test_grad_through_fftmap_canvas(rng):
    """mode='fftmap' on the tiled engine (baked FFT canvas) stays
    differentiable and matches the direct engine's gradient."""
    data = jnp.asarray(rng.standard_normal((40, 40, 1)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((2, 5, 5, 1)).astype(np.float32))

    def loss(d, algorithm):
        out = fc.fft_conv(d, 5, 5, bank, mode="fftmap", algorithm=algorithm)
        return jnp.sum(out**2)

    g_direct = np.array(jax.grad(lambda d: loss(d, "direct"))(data))
    g_tiled = np.array(jax.grad(lambda d: loss(d, "tiled"))(data))
    scale = np.max(np.abs(g_direct))
    assert np.max(np.abs(g_tiled - g_direct)) / scale < 1e-5
