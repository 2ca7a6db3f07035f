#!/usr/bin/env python
"""Training demo: learn a correlation filter bank THROUGH the FFT engine.

Something the reference's MEX pipeline could never do: the whole
FFT-convolution path has exact VJPs, so a filter bank is a trainable
parameter. Two ways shown:

  1. SGD (models.filter_bank.train_step) — gradient descent through
     rfft2 → spectral MAC → irfft2 → 'same' trim.
  2. Closed-form MOSSE (models.mosse) — the least-squares optimal filter,
     solved entirely in the spectral domain from the same SpectralData
     objects the serving path uses.

Both recover planted templates from noisy observations.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import cuda_fft_convolution_tpu as fc  # noqa: E402
from cuda_fft_convolution_tpu.models import (  # noqa: E402
    detect,
    gaussian_target,
    init_detector,
    respond,
    train_mosse,
    train_step,
)

rng = np.random.default_rng(11)

# ----- 1. SGD through the FFT ------------------------------------------
target_model = init_detector(jax.random.key(0), num_filters=4, feature_dim=2,
                             kh=7, kw=7)
model = init_detector(jax.random.key(1), 4, 2, 7, 7)
images = jnp.asarray(rng.standard_normal((4, 2, 32, 32)).astype(np.float32))
targets = detect(target_model, images)

tx = optax.adam(2e-2)
opt_state = tx.init(model)
step = jax.jit(lambda m, o, x, y: train_step(m, o, x, y, tx))
loss0 = None
for i in range(40):
    model, opt_state, loss = step(model, opt_state, images, targets)
    if loss0 is None:
        loss0 = float(loss)
print(f"SGD: loss {loss0:.4f} -> {float(loss):.4f} over 40 steps")
assert float(loss) < 0.2 * loss0

# ----- 2. Closed-form MOSSE --------------------------------------------
obj = rng.standard_normal((1, 12, 12)).astype(np.float32)
patches, resp_targets = [], []
for (r0, c0) in [(2, 2), (6, 1), (0, 8), (5, 5)]:
    p = np.zeros((1, 32, 32), np.float32)
    p[:, r0 : r0 + 12, c0 : c0 + 12] = obj
    p += 0.05 * rng.standard_normal((1, 32, 32)).astype(np.float32)
    patches.append(p)
    resp_targets.append(np.array(gaussian_target(64, 64, (r0 + 6, c0 + 6), 2.0)))
filt = train_mosse(
    jnp.asarray(np.stack(patches)), jnp.asarray(np.stack(resp_targets)), 64, 64
)
# track the object in a new frame using the serving-path SpectralData
frame = np.zeros((32, 32, 1), np.float32)
frame[9:21, 13:25, 0] = obj[0]
sd = fc.fft_data(frame, 33, 33, policy="pow2")
resp = np.array(respond(filt, sd))
peak = np.unravel_index(np.argmax(resp), resp.shape)
print(f"MOSSE: object planted at center (15, 19); response peak at {peak}")
assert abs(peak[0] - 15) <= 1 and abs(peak[1] - 19) <= 1
print("demo_train OK")
