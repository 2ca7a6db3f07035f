"""First-class spectral-state types.

``SpectralData`` is the TPU-native equivalent of the reference's persistent
on-device ``mxGPUArray`` returned by cudaFFTData (src/cudaFFTData.cu:97-150):
a materialized data FFT that later convolution calls resume from (SURVEY.md
§5 "checkpoint/resume" analogue). It is a JAX pytree, so it jits, vmaps,
shards and survives in jax.block_until_ready'd device memory exactly like the
reference's gpuArray.

``SpectralKernels`` is the same idea applied to a *kernel bank* — beyond the
reference (which re-FFTs kernels every call, src/cudaConvFFTData.cu:191-282),
but the natural amortization for detection workloads where the bank is fixed
across an image stream.

Layout: spectra are Hermitian-packed along the LAST axis (jnp.fft.rfft2:
shape (..., fft_h, fft_w//2+1) complex64). The reference packs along its
column-major innermost axis H instead (CFFT_H = FFT_H/2+1,
src/cudaFFTData.cu:90-94) — same information, row-major-native axis here.
Dims are carried explicitly rather than recovered from the packed shape
(≈ src/cudaConvFFTData.cu:92-98, without the even-size ambiguity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralData:
    """rfft2 of zero-padded data, plus the static geometry to use it."""

    # (F, fft_h, fft_w//2+1) c64, or (B, F, fft_h, fft_w//2+1) when batched.
    fft: jnp.ndarray
    fft_h: int = dataclasses.field(metadata=dict(static=True))
    fft_w: int = dataclasses.field(metadata=dict(static=True))
    data_h: int = dataclasses.field(metadata=dict(static=True))
    data_w: int = dataclasses.field(metadata=dict(static=True))

    @property
    def batched(self) -> bool:
        """True when a leading image-batch axis is present (beyond the
        reference, which is strictly one image per call)."""
        return self.fft.ndim == 4

    @property
    def feature_dim(self) -> int:
        return self.fft.shape[-3]

    @property
    def batch_size(self) -> int:
        return self.fft.shape[0] if self.batched else 1

    @property
    def cfft_w(self) -> int:
        """Hermitian-packed width (≈ CFFT_H in the reference's H-packed
        layout, src/cudaConvolutionFFT.cu:112)."""
        return self.fft_w // 2 + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledSpectralData:
    """Overlap-save block spectra of the data (ops/tiled.py).

    Beyond the reference (which has no tiled engine): the per-block analogue
    of SpectralData. Valid only for kernels up to (max_kh, max_kw) because
    the block stride V = block − maxK + 1 bakes the kernel pad in."""

    # (nbh, nbw, F, block_h, block_w//2+1) c64, or (B, nbh, nbw, ...) batched.
    fft: jnp.ndarray
    block_h: int = dataclasses.field(metadata=dict(static=True))
    block_w: int = dataclasses.field(metadata=dict(static=True))
    max_kh: int = dataclasses.field(metadata=dict(static=True))
    max_kw: int = dataclasses.field(metadata=dict(static=True))
    data_h: int = dataclasses.field(metadata=dict(static=True))
    data_w: int = dataclasses.field(metadata=dict(static=True))

    @property
    def batched(self) -> bool:
        return self.fft.ndim == 6

    @property
    def feature_dim(self) -> int:
        return self.fft.shape[-3]

    @property
    def out_h(self) -> int:
        """'full' output extent covered by the blocks."""
        return self.data_h + self.max_kh - 1

    @property
    def out_w(self) -> int:
        return self.data_w + self.max_kw - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralKernels:
    """rfft2 of a zero-padded stacked kernel bank at a fixed FFT size."""

    fft: jnp.ndarray  # (N, F, fft_h, fft_w//2+1) complex64
    fft_h: int = dataclasses.field(metadata=dict(static=True))
    fft_w: int = dataclasses.field(metadata=dict(static=True))
    # Per-kernel true spatial sizes (pre-padding), for trimming modes.
    kernel_hs: tuple = dataclasses.field(metadata=dict(static=True))
    kernel_ws: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def num_kernels(self) -> int:
        return self.fft.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.fft.shape[1]
