"""Debug logging.

Replaces the reference's compile-time ``static bool debug`` flags gating
``fprintf(stderr)`` progress prints (src/cudaConvolutionFFT.cu:9,60,100,...)
with a standard runtime-configurable logger.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("cuda_fft_convolution_tpu")

if os.environ.get("FFTCONV_DEBUG", "0") not in ("0", "", "false", "False"):
    logging.basicConfig(level=logging.DEBUG)
    logger.setLevel(logging.DEBUG)


def debug(msg: str, *args) -> None:
    logger.debug(msg, *args)
