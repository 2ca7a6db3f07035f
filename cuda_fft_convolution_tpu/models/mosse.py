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
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cuda_fft_convolution_tpu.ops.conv import irfft2_norm, rfft2_padded
from cuda_fft_convolution_tpu.types import SpectralData
from cuda_fft_convolution_tpu.utils.errors import validate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MosseFilter:
    """Spectral-domain correlation filter: conj-filter spectrum Ĥ* per
    channel, at a fixed FFT size."""

    h_conj: jnp.ndarray  # (F, fft_h, fft_w//2+1) c64
    fft_h: int = dataclasses.field(metadata=dict(static=True))
    fft_w: int = dataclasses.field(metadata=dict(static=True))


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
    f_hat = rfft2_padded(patches, fft_h, fft_w)  # (S, F, fh, wc)
    g_hat = jnp.fft.rfft2(targets.astype(jnp.float32))  # (S, fh, wc)
    num = jnp.sum(g_hat[:, None] * jnp.conj(f_hat), axis=0)  # (F, fh, wc)
    den = jnp.sum(f_hat * jnp.conj(f_hat), axis=0) + reg  # (F, fh, wc)
    return MosseFilter(h_conj=num / den, fft_h=fft_h, fft_w=fft_w)


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
    f_hat = rfft2_padded(patch[None], filt.fft_h, filt.fft_w)[0]
    g_hat = jnp.fft.rfft2(target.astype(jnp.float32))
    new = (g_hat[None] * jnp.conj(f_hat)) / (
        jnp.sum(f_hat * jnp.conj(f_hat), axis=0, keepdims=True) + reg
    )
    return MosseFilter(
        h_conj=(1.0 - lr) * filt.h_conj + lr * new,
        fft_h=filt.fft_h,
        fft_w=filt.fft_w,
    )


def respond(filt: MosseFilter, spectral: SpectralData) -> jnp.ndarray:
    """Correlation response of a precomputed data spectrum against the
    filter: Σ_f IFFT(D̂_f ⊙ Ĥ*_f) — one spectral MAC + one inverse
    transform, exactly the serving path."""
    validate(
        spectral.fft_h == filt.fft_h and spectral.fft_w == filt.fft_w,
        f"FFT dims mismatch: data ({spectral.fft_h},{spectral.fft_w}), "
        f"filter ({filt.fft_h},{filt.fft_w})",
    )
    dfft = spectral.fft if spectral.batched else spectral.fft[None]
    prod = jnp.sum(dfft * filt.h_conj[None], axis=1)  # (B, fh, wc)
    out = irfft2_norm(prod, filt.fft_h, filt.fft_w)
    return out if spectral.batched else out[0]
