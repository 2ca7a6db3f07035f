"""MOSSE correlation filters — closed-form training in the spectral domain.

A second model family native to this library's core object: the MOSSE
(Minimum Output Sum of Squared Error) filter is the least-squares optimal
correlation template,

    Ĥ* = Σ_i Ĝ_i ⊙ conj(F̂_i)  /  ( Σ_i F̂_i ⊙ conj(F̂_i) + λ ),

computed entirely from the SAME precomputed spectra (SpectralData) the
convolution API uses — training and serving share one data representation,
the library's whole point. Complements models/filter_bank.py (SGD through
the FFT) with a one-shot closed form.

Per-channel formulation: each feature channel gets its own filter; the
detection response sums channels — matching the library's spectral-MAC
channel reduction.

The filter spectrum is stored as split (re, im) f32 planes like every
spectral object in this library (types.py): no complex64 at any program
boundary. Training math uses complex inside a single jitted program where
it is free.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from cuda_fft_convolution_tpu.ops.conv import (
    irfft2_norm_planes,
    rfft2_padded_planes,
)
from cuda_fft_convolution_tpu.types import SpectralData, combine_planes
from cuda_fft_convolution_tpu.utils.errors import validate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MosseFilter:
    """Spectral-domain correlation filter: conj-filter spectrum Ĥ* per
    channel as split (re, im) f32 planes, at a fixed FFT size."""

    h_re: jnp.ndarray  # (F, fft_h, fft_w//2+1) f32
    h_im: jnp.ndarray
    fft_h: int = dataclasses.field(metadata=dict(static=True))
    fft_w: int = dataclasses.field(metadata=dict(static=True))

    @property
    def h_conj(self) -> jnp.ndarray:
        """Complex64 view of Ĥ* (interop/debug only)."""
        return combine_planes(self.h_re, self.h_im)


def gaussian_target(
    fft_h: int, fft_w: int, center: tuple[int, int], sigma: float = 2.0
) -> jnp.ndarray:
    """Desired response map: a Gaussian peak at ``center`` (the MOSSE
    training target)."""
    r = jnp.arange(fft_h)[:, None]
    c = jnp.arange(fft_w)[None, :]
    return jnp.exp(
        -((r - center[0]) ** 2 + (c - center[1]) ** 2) / (2.0 * sigma**2)
    ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("fft_h", "fft_w"))
def _train_worker(patches, targets, fft_h: int, fft_w: int, reg: float):
    fr, fi = rfft2_padded_planes(patches, fft_h, fft_w)  # (S, F, fh, wc)
    f_hat = jax.lax.complex(fr, fi)
    g_hat = jnp.fft.rfft2(targets.astype(jnp.float32))  # (S, fh, wc)
    num = jnp.sum(g_hat[:, None] * jnp.conj(f_hat), axis=0)  # (F, fh, wc)
    den = jnp.sum(f_hat * jnp.conj(f_hat), axis=0) + reg  # (F, fh, wc)
    h = num / den
    return jnp.real(h), jnp.imag(h)


def train_mosse(
    patches: jnp.ndarray,  # (S, F, H, W) training patches (channel-leading)
    targets: jnp.ndarray,  # (S, fft_h, fft_w) desired responses
    fft_h: int,
    fft_w: int,
    *,
    reg: float = 1e-2,
) -> MosseFilter:
    """Closed-form MOSSE solve over S training patches."""
    validate(patches.ndim == 4, f"patches must be (S, F, H, W); got {patches.shape}")
    h_re, h_im = _train_worker(
        jnp.asarray(patches), jnp.asarray(targets), fft_h, fft_w, reg
    )
    return MosseFilter(h_re=h_re, h_im=h_im, fft_h=fft_h, fft_w=fft_w)


@functools.partial(jax.jit, static_argnames=("fft_h", "fft_w"))
def _update_worker(h_re, h_im, patch, target, fft_h: int, fft_w: int,
                   lr: float, reg: float):
    fr, fi = rfft2_padded_planes(patch[None], fft_h, fft_w)
    f_hat = jax.lax.complex(fr, fi)[0]
    g_hat = jnp.fft.rfft2(target.astype(jnp.float32))
    new = (g_hat[None] * jnp.conj(f_hat)) / (
        jnp.sum(f_hat * jnp.conj(f_hat), axis=0, keepdims=True) + reg
    )
    h = (1.0 - lr) * jax.lax.complex(h_re, h_im) + lr * new
    return jnp.real(h), jnp.imag(h)


def update_mosse(
    filt: MosseFilter,
    patch: jnp.ndarray,  # (F, H, W)
    target: jnp.ndarray,  # (fft_h, fft_w)
    *,
    lr: float = 0.125,
    reg: float = 1e-2,
) -> MosseFilter:
    """Online running-average update (the MOSSE tracker's per-frame adapt).

    Note: maintains the *ratio* with an exponential moving average — the
    standard practical variant."""
    h_re, h_im = _update_worker(
        filt.h_re, filt.h_im, jnp.asarray(patch), jnp.asarray(target),
        filt.fft_h, filt.fft_w, lr, reg,
    )
    return MosseFilter(
        h_re=h_re, h_im=h_im, fft_h=filt.fft_h, fft_w=filt.fft_w
    )


def respond(filt: MosseFilter, spectral: SpectralData) -> jnp.ndarray:
    """Correlation response of a precomputed data spectrum against the
    filter: Σ_f IFFT(D̂_f ⊙ Ĥ*_f) — one spectral MAC + one inverse
    transform, exactly the serving path. Pure split-plane math."""
    validate(
        spectral.fft_h == filt.fft_h and spectral.fft_w == filt.fft_w,
        f"FFT dims mismatch: data ({spectral.fft_h},{spectral.fft_w}), "
        f"filter ({filt.fft_h},{filt.fft_w})",
    )
    d_re = spectral.re if spectral.batched else spectral.re[None]
    d_im = spectral.im if spectral.batched else spectral.im[None]
    # (dr + i di)(hr + i hi) summed over channels, split-plane:
    p_re = jnp.sum(d_re * filt.h_re[None] - d_im * filt.h_im[None], axis=1)
    p_im = jnp.sum(d_re * filt.h_im[None] + d_im * filt.h_re[None], axis=1)
    out = irfft2_norm_planes(p_re, p_im, filt.fft_h, filt.fft_w)
    return out if spectral.batched else out[0]
