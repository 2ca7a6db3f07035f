"""Recoverable validation errors.

The reference has two error regimes: recoverable user-input errors via
``mexErrMsgIdAndTxt`` (e.g. src/cudaConvolutionFFT.cu:46,54,65,243) and
crash-only ``exit(EXIT_FAILURE)`` on CUDA/cuFFT errors
(src/cudaConvFFTData.h:6-29) — SURVEY.md §5 flags the latter as a quirk NOT
to replicate. Here everything is a recoverable Python exception; device-side
failures surface as JAX exceptions which propagate normally.
"""

from __future__ import annotations


class InvalidInputError(ValueError):
    """User-input validation failure (≈ mexErrMsgIdAndTxt 'InvalidInput')."""


def validate(cond: bool, msg: str) -> None:
    if not cond:
        raise InvalidInputError(msg)
