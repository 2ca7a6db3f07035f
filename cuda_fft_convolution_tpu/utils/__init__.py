"""Utility layer: FFT-size policies, validation errors, logging, profiling.

TPU-native replacement of the reference's host utility header
(src/cudaConvFFTData.h: error macros, iDivUp/iAlignUp grid math,
computeFFTsize/computeFFTsize16 policies).
"""

from cuda_fft_convolution_tpu.utils.errors import InvalidInputError, validate
from cuda_fft_convolution_tpu.utils.fft_size import (
    FftSizePolicy,
    compute_fft_size,
    next_fast_len,
    next_multiple_of_16,
    next_pow2,
    align_up,
    ceil_div,
)

__all__ = [
    "InvalidInputError",
    "validate",
    "FftSizePolicy",
    "compute_fft_size",
    "next_fast_len",
    "next_multiple_of_16",
    "next_pow2",
    "align_up",
    "ceil_div",
]
