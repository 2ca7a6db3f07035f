"""Flagship model tests: differentiable filter-bank detector
(models/filter_bank.py — the reference's DPM/HOG workload as a trainable
model)."""

import jax
import numpy as np
import jax.numpy as jnp
import optax
import pytest

from cuda_fft_convolution_tpu.models import (
    detect,
    init_detector,
    loss_fn,
    train_step,
)


def test_detect_planted_template(rng):
    """The detector's score map peaks where its template was planted
    (the demo's planted-signal check, demoCudaConvolutionFFT.m:58-61)."""
    model = init_detector(jax.random.key(0), num_filters=2, feature_dim=1, kh=8, kw=8)
    img = np.zeros((1, 1, 64, 64), np.float32)
    k0 = np.array(model.kernels[0, 0])
    img[0, 0, 24:32, 40:48] = k0
    scores = np.array(detect(model, jnp.asarray(img)))
    assert scores.shape == (1, 2, 64, 64)
    peak = np.unravel_index(np.argmax(scores[0, 0]), (64, 64))
    # 'same' correlation peak = plant top-left + (kh-1)//2
    assert abs(peak[0] - (24 + 3)) <= 1 and abs(peak[1] - (40 + 3)) <= 1


def test_train_step_reduces_loss(rng):
    """One true end-to-end training loop through the FFT path: grads flow
    through rfft2/MAC/irfft2 and loss decreases."""
    key = jax.random.key(1)
    model = init_detector(key, num_filters=3, feature_dim=2, kh=5, kw=5)
    images = jnp.asarray(rng.standard_normal((2, 2, 24, 24)).astype(np.float32))
    target_model = init_detector(jax.random.key(2), 3, 2, 5, 5)
    targets = detect(target_model, images)  # realizable targets

    tx = optax.adam(3e-2)
    opt_state = tx.init(model)
    step = jax.jit(lambda m, o, x, y: train_step(m, o, x, y, tx))
    losses = []
    for _ in range(12):
        model, opt_state, loss = step(model, opt_state, images, targets)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses


def test_gradients_finite(rng):
    model = init_detector(jax.random.key(0), 2, 1, 3, 3)
    images = jnp.asarray(rng.standard_normal((1, 1, 16, 16)).astype(np.float32))
    targets = jnp.zeros((1, 2, 16, 16), jnp.float32)
    grads = jax.grad(loss_fn)(model, images, targets)
    assert np.all(np.isfinite(np.array(grads.kernels)))
    assert np.all(np.isfinite(np.array(grads.bias)))
