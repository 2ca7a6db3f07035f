"""Planning API: FFT sizing + bank execution plans (native-accelerated).

Mirrors the decisions the reference makes in host code per call — FFT dims
(src/cudaConvolutionFFT.cu:103-112), buffer sizing (:116-127), and the
streams variant's fixed 2-slot pipeline (src/cudaConvFFTDataStreams.cu:124)
— but computes them from an explicit memory model, optionally through the
C++ planner (csrc/planner.cpp) when built.
"""

from __future__ import annotations

import ctypes
import dataclasses

from cuda_fft_convolution_tpu.runtime import native
from cuda_fft_convolution_tpu.utils.fft_size import FftSizePolicy

_POLICY_CODE = {
    FftSizePolicy.MULTIPLE16: 0,
    FftSizePolicy.POW2: 1,
    FftSizePolicy.FAST: 2,
    FftSizePolicy.TPU: 3,
}


def get_native_planner():
    """The loaded C++ planner library, or None (pure-Python fallback)."""
    return native.load()


def compute_fft_size_native(
    data_h: int, data_w: int, max_kh: int, max_kw: int,
    policy: FftSizePolicy | str = FftSizePolicy.FAST,
) -> tuple[int, int] | None:
    """FFT dims via the native planner; None if the library isn't available.
    Must agree exactly with utils.fft_size.compute_fft_size (tested)."""
    lib = native.load()
    if lib is None:
        return None
    oh, ow = ctypes.c_int64(), ctypes.c_int64()
    lib.ffc_compute_fft_size(
        data_h, data_w, max_kh, max_kw,
        _POLICY_CODE[FftSizePolicy(policy)],
        ctypes.byref(oh), ctypes.byref(ow),
    )
    return int(oh.value), int(ow.value)


@dataclasses.dataclass(frozen=True)
class BankPlan:
    """Execution plan for a bank convolution.

    chunk_size: kernels per pipelined chunk (the generalization of the
      streams variant's one-kernel-per-stream slots).
    peak_bytes: estimated HBM working set at that chunk size.
    """

    chunk_size: int
    peak_bytes: int


def plan_bank(
    n_kernels: int,
    feature_dim: int,
    fft_h: int,
    fft_w: int,
    batch: int = 1,
    hbm_budget_bytes: int = 8 << 30,
) -> BankPlan:
    """Choose the pipeline chunk size so one chunk's spectra + products +
    output maps (double-buffered) fit the HBM budget."""
    lib = native.load()
    if lib is not None:
        chunk, peak = ctypes.c_int64(), ctypes.c_int64()
        lib.ffc_plan_bank(
            n_kernels, feature_dim, fft_h, fft_w, batch, hbm_budget_bytes,
            ctypes.byref(chunk), ctypes.byref(peak),
        )
        return BankPlan(int(chunk.value), int(peak.value))
    # Pure-Python fallback — same arithmetic as csrc/planner.cpp:ffc_plan_bank.
    wc = fft_w // 2 + 1
    spec = fft_h * wc * 8
    map_bytes = fft_h * fft_w * 4
    per_kernel = 2 * (
        feature_dim * spec + batch * spec + batch * (3 * map_bytes)
    )
    # resident bank spectra count as fixed: the whole bank lives in HBM
    # while chunks stream through it (csrc/planner.cpp keeps in sync)
    fixed = (
        batch * feature_dim * spec
        + batch * feature_dim * fft_h * fft_w * 4
        + n_kernels * feature_dim * spec
    )
    budget = max(hbm_budget_bytes - fixed, per_kernel)
    chunk = max(1, min(n_kernels, budget // per_kernel))
    return BankPlan(int(chunk), int(fixed + chunk * per_kernel))
