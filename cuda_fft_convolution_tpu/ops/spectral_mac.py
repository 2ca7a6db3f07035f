"""Fused spectral multiply-accumulate (the hot op).

TPU-native replacement for the reference's elementwiseProductAndNormalize +
sumAlongFeatures kernel pair (src/cudaConvFFTData.cuh:47-92), which the
reference launches back-to-back per kernel with an intermediate
FFT_H×FFT_W×F product buffer round-tripped through HBM
(src/cudaConvolutionFFT.cu:263-282). Here both are one pass:

    out[b, n, s] = Σ_f data[b, f, s] · kernel[n, f, s]      (complex)

i.e. the channel reduction happens in the SPECTRAL domain (DFT linearity), so
no per-channel product buffer ever exists and each (b, n) needs one inverse
FFT instead of F. Normalization is left to irfft2 (cuFFT is unnormalized so
the reference scales by 1/(FFT_W·FFT_H) here, src/cudaConvFFTData.cuh:56).

Two implementations:
  - ``spectral_mac_einsum``: one jnp.einsum on complex64 — XLA fuses the
    complex arithmetic + reduction on the VPU.
  - ``spectral_mac_pallas``: explicit Pallas kernel. TPU Pallas has no native
    complex dtype (SURVEY.md §7 hard-part (c)), so spectra are split into
    re/im fp32 planes and the complex MAC is done in registers:
        or = Σ_f (kr·dr − ki·di),  oi = Σ_f (kr·di + ki·dr)
    The grid iterates kernels innermost so the data block (the small,
    bank-invariant operand) stays resident in VMEM across the whole bank —
    each spectrum byte moves HBM→VMEM exactly once; the pass is
    kernel-bank-read bound, the HBM floor for this op.

``spectral_mac_auto`` picks per backend (Pallas on TPU for nontrivial sizes,
einsum elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 512  # lane width of one tile row (multiple of the 128-lane VPU)
_SUBLANE = 8  # fp32 sublane quantum
_VMEM_BUDGET = 4 * 1024 * 1024  # per-block-set working bytes target


def spectral_mac_einsum(data_fft: jnp.ndarray, kernel_fft: jnp.ndarray) -> jnp.ndarray:
    """(B, F, H, Wc) × (N, F, H, Wc) → (B, N, H, Wc), complex.

    HIGHEST precision: if XLA lowers the F-contraction through a dot, the
    default TPU precision would run bf16 passes — the spectral accumulation
    must stay full fp32 (BASELINE.json: ≤1e-5 rel err)."""
    return jnp.einsum(
        "bfhw,nfhw->bnhw",
        data_fft,
        kernel_fft,
        precision=jax.lax.Precision.HIGHEST,
    )


def _choose_rows(f: int, r_total: int) -> int:
    """Row-tile size (multiple of 8 sublanes): the 4 re/im input blocks of
    shape (F, R, LANE) plus outputs must fit the VMEM budget with double
    buffering."""
    max_r = _VMEM_BUDGET // (2 * 4 * 4 * _LANE * max(f, 1))
    r = max(_SUBLANE, (max_r // _SUBLANE) * _SUBLANE)
    r = min(r, 512 // _SUBLANE * _SUBLANE)  # keep blocks modest for pipelining
    # Don't tile beyond the (sublane-padded) problem size.
    return min(r, -(-r_total // _SUBLANE) * _SUBLANE)


def _mac_kernel(dr_ref, di_ref, kr_ref, ki_ref, or_ref, oi_ref):
    dr, di = dr_ref[0], di_ref[0]  # (F, R, LANE)
    kr, ki = kr_ref[0], ki_ref[0]  # (F, R, LANE)
    or_ref[0, 0] = jnp.sum(kr * dr - ki * di, axis=0)
    oi_ref[0, 0] = jnp.sum(kr * di + ki * dr, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spectral_mac_pallas(
    data_fft: jnp.ndarray,
    kernel_fft: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused complex MAC as a Pallas TPU kernel.

    data_fft (B, F, H, Wc) c64, kernel_fft (N, F, H, Wc) c64 →
    (B, N, H, Wc) c64. The MAC is purely elementwise over pixels + a
    reduction over F, so the spatial axes are flattened to one lane axis
    S = H·Wc and padded to the tile size (padding multiplies zeros — exact).
    """
    b, f, h, wc = data_fft.shape
    n = kernel_fft.shape[0]
    s = h * wc
    # Lay the flattened spectrum out as (rows, _LANE) tiles; pad rows to the
    # row-tile so every Pallas block is (8k, 128k)-aligned.
    r_total = -(-s // _LANE)
    rt = _choose_rows(f, r_total)
    r_pad = -(-r_total // rt) * rt
    s_pad = r_pad * _LANE

    def planes(x, lead):
        x = x.reshape(lead, f, s)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s)))
        x = x.reshape(lead, f, r_pad, _LANE)
        return (
            jnp.real(x).astype(jnp.float32),
            jnp.imag(x).astype(jnp.float32),
        )

    dr, di = planes(data_fft, b)
    kr, ki = planes(kernel_fft, n)

    grid = (b, r_pad // rt, n)  # n innermost: data block cached across bank
    data_spec = pl.BlockSpec(
        (1, f, rt, _LANE), lambda bi, si, ni: (bi, 0, si, 0),
        memory_space=pltpu.VMEM,
    )
    kern_spec = pl.BlockSpec(
        (1, f, rt, _LANE), lambda bi, si, ni: (ni, 0, si, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, rt, _LANE), lambda bi, si, ni: (bi, ni, si, 0),
        memory_space=pltpu.VMEM,
    )

    out_shape = jax.ShapeDtypeStruct((b, n, r_pad, _LANE), jnp.float32)
    o_r, o_i = pl.pallas_call(
        _mac_kernel,
        grid=grid,
        in_specs=[data_spec, data_spec, kern_spec, kern_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * f * s,
            bytes_accessed=8 * s * (b * f + n * f + b * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki)
    o_r = o_r.reshape(b, n, s_pad)[..., :s]
    o_i = o_i.reshape(b, n, s_pad)[..., :s]
    return jax.lax.complex(o_r, o_i).reshape(b, n, h, wc)


@jax.custom_vjp
def _mac_pallas_ad(data_fft: jnp.ndarray, kernel_fft: jnp.ndarray) -> jnp.ndarray:
    interpret = jax.default_backend() != "tpu"
    return spectral_mac_pallas(data_fft, kernel_fft, interpret=interpret)


def _mac_pallas_ad_fwd(data_fft, kernel_fft):
    return _mac_pallas_ad(data_fft, kernel_fft), (data_fft, kernel_fft)


def _mac_pallas_ad_bwd(res, g):
    # The MAC is linear in both operands; its VJP is defined to be exactly
    # einsum's (both cotangents are themselves MAC-shaped contractions, so
    # training through the Pallas forward stays consistent with the einsum
    # path bit-for-fp32).
    data_fft, kernel_fft = res
    _, vjp = jax.vjp(spectral_mac_einsum, data_fft, kernel_fft)
    return vjp(g)


_mac_pallas_ad.defvjp(_mac_pallas_ad_fwd, _mac_pallas_ad_bwd)


def spectral_mac_auto(
    data_fft: jnp.ndarray,
    kernel_fft: jnp.ndarray,
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Backend-aware dispatch. ``use_pallas=None`` → Pallas on TPU when the
    spectrum is big enough to amortize kernel launch + lane padding, einsum
    otherwise (XLA's fused einsum is already near the HBM floor for small
    problems and is portable). The Pallas path is differentiable via a
    custom VJP (backward = the einsum contractions)."""
    if use_pallas is None:
        # Measured on v5e at F=1 (209 vs 315 ms) AND F=31 (50 vs 68 ms):
        # the einsum MAC wins because XLA fuses the complex product into
        # the neighbouring transform matmuls — a fusion the Pallas
        # custom-call blocks. Pallas MAC stays available explicitly
        # (use_pallas=True) for backends where that fusion doesn't happen.
        use_pallas = False
    if not use_pallas:
        return spectral_mac_einsum(data_fft, kernel_fft)
    return _mac_pallas_ad(data_fft, kernel_fft)
