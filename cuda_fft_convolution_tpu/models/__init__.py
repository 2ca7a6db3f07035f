"""Model layer: the workloads the reference library serves.

The reference is a library for DPM/HOG-style detection filter banks
(README.md:4-6: "many large kernels, large images"). This package provides
that consumer as a first-class, *differentiable* model: a filter-bank
detector whose kernel bank is learnable — possible here because the whole
FFT-convolution path (rfft2 → spectral MAC → irfft2) is differentiable JAX,
something the reference's MEX pipeline could never offer.
"""

from cuda_fft_convolution_tpu.models.detect import (
    detect_local_peaks,
    detect_peaks,
    detect_top_k,
)
from cuda_fft_convolution_tpu.models.hog import hog_features
from cuda_fft_convolution_tpu.models.filter_bank import (
    FilterBankDetector,
    detect,
    init_detector,
    loss_fn,
    train_step,
)
from cuda_fft_convolution_tpu.models.mosse import (
    MosseFilter,
    gaussian_target,
    respond,
    train_mosse,
    update_mosse,
)
from cuda_fft_convolution_tpu.models.pyramid import (
    Pyramid,
    PyramidPeaks,
    build_pyramid,
    detect_pyramid,
    detect_pyramid_peaks,
    top_detections,
)

__all__ = [
    "detect_peaks",
    "detect_top_k",
    "detect_local_peaks",
    "hog_features",
    "FilterBankDetector",
    "detect",
    "init_detector",
    "loss_fn",
    "train_step",
    "MosseFilter",
    "gaussian_target",
    "respond",
    "train_mosse",
    "update_mosse",
    "Pyramid",
    "PyramidPeaks",
    "build_pyramid",
    "detect_pyramid",
    "detect_pyramid_peaks",
    "top_detections",
]
