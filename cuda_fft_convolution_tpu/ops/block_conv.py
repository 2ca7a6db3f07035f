"""Fused Pallas block-convolution kernel (the speed-of-light path).

One Pallas kernel per (block, kernel) grid cell does what the unfused tiled
pipeline does in three XLA stages with HBM round-trips between them:

    1. spectral MAC over channels       (VPU)     Σ_f D̂[f] ⊙ K̂[f]
    2. H-axis inverse DFT (windowed)    (MXU)     G[valid rows] @ S
    3. W-axis inverse DFT (windowed)    (MXU)     X @ M[:, valid cols]

The MAC product and the H-inverse intermediate never leave VMEM; HBM sees
exactly: data-block spectra (once per block), kernel spectra (once per
(block, kernel)), and the valid output windows. The inverse-DFT matrices
(small: (V_h, L_h) and (Wc, V_w) fp32 planes) stay VMEM-resident across the
whole grid.

Complex math is split re/im fp32 (TPU Pallas has no complex dtype); all
matmuls accumulate fp32 on the MXU.

This is the Pallas realization of what the reference's streams variant
gestures at (keep per-kernel work on-chip and overlapped,
src/cudaConvFFTDataStreams.cu) — but fused, not just overlapped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fft_convolution_tpu.ops.dft import _inv_full_mats, _inv_packed_mats


def _kernel(dr_ref, di_ref, kr_ref, ki_ref, gr_ref, gi_ref, mr_ref, mi_ref,
            out_ref):
    # One grid cell = one data block × a CHUNK of NK kernels. Both inverse
    # stages run as single wide matmuls over the whole chunk (kernels
    # concatenated along the non-contracted axis) — small per-kernel
    # matrices underutilize the MXU and per-cell overhead dominates.
    dr, di = dr_ref[0], di_ref[0]  # (F, Lh, Wc)
    kr, ki = kr_ref[...], ki_ref[...]  # (NK, F, Lh, Wc)
    # 1. MAC over channels (VPU) → (NK, Lh, Wc)
    sr = jnp.sum(kr * dr[None], axis=1) - jnp.sum(ki * di[None], axis=1)
    si = jnp.sum(kr * di[None], axis=1) + jnp.sum(ki * dr[None], axis=1)
    gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
    mr, mi = mr_ref[...], mi_ref[...]  # (Wc, Vw)
    # HIGHEST: fp32-exact multi-pass matmul — the default MXU precision is
    # single-pass bf16 (measured 2.3e-3 rel err, far above the 1e-5 bar).
    # Chunk axes ride along as free dot_general dimensions (no explicit VPU
    # transposes — measured slower than letting Mosaic pick layouts).
    hstage = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),  # (Vh,Lh)x(NK,Lh,Wc)→(Vh,NK,Wc)
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    wstage = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),  # (Vh,NK,Wc)x(Wc,Vw)→(Vh,NK,Vw)
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # 2. windowed H-inverse (complex), 4-mult form. (3-mult Karatsuba was
    # measured SLOWER here — at these small per-cell sizes the extra VPU
    # adds cost more than the saved MXU passes: 145 vs 131 ms.)
    xr = hstage(gr, sr) - hstage(gi, si)  # (Vh, NK, Wc)
    xi = hstage(gr, si) + hstage(gi, sr)
    # 3. windowed W-inverse (real output): Re((xr + i xi) @ (mr + i mi))
    out = wstage(xr, mr) + wstage(xi, mi)  # (Vh, NK, Vw)
    out_ref[0] = jnp.transpose(out, (1, 0, 2))


def _choose_nk(n: int, f: int, lh: int, wc: int, vh: int, vw: int) -> int:
    """Kernels per grid cell. Measured on v5e: NK=1 wins (131 ms vs 137-139
    at NK=4 for the 2048²×100×64² config) — the HIGHEST-precision matmul
    passes dominate and chunking only adds relayout work. Kept as a knob for
    future backends."""
    return 1


def block_conv_fits_vmem(f: int, lh: int, wc: int, vh: int, vw: int) -> bool:
    """Whether one grid cell's working set (data+kernel spectra planes,
    double-buffered, plus DFT matrices and intermediates) fits VMEM."""
    cell = 4 * (2 * 2 * f * lh * wc)  # d+k, re+im, fp32
    mats = 4 * 2 * (vh * lh + wc * vw)
    inter = 4 * (2 * vh * wc + vh * vw)
    return 2 * cell + mats + 2 * inter < (10 << 20)


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "block_w", "kh", "kw", "interpret"),
)
def block_conv_pallas(
    dfft_blocks: jnp.ndarray,  # (NB, F, Lh, Wc) c64 — flattened block axis
    kernel_fft: jnp.ndarray,  # (N, F, Lh, Wc) c64
    block_h: int,
    block_w: int,
    kh: int,
    kw: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (NB, N, V_h, V_w) f32 valid windows (rows/cols [K−1, K−1+V) of each
    block's circular convolution), normalization folded in."""
    nb, f, lh, wc = dfft_blocks.shape
    n = kernel_fft.shape[0]
    vh, vw = block_h - kh + 1, block_w - kw + 1
    assert lh == block_h and wc == block_w // 2 + 1
    nk = _choose_nk(n, f, lh, wc, vh, vw)
    n_pad = -(-n // nk) * nk
    if n_pad != n:
        kernel_fft = jnp.pad(
            kernel_fft, ((0, n_pad - n), (0, 0), (0, 0), (0, 0))
        )

    def planes(x):
        return (
            jnp.real(x).astype(jnp.float32),
            jnp.imag(x).astype(jnp.float32),
        )

    dr, di = planes(dfft_blocks)
    kr, ki = planes(kernel_fft)

    gr_np, gi_np = _inv_full_mats(block_h)
    gr = jnp.asarray(gr_np[kh - 1 : kh - 1 + vh])  # (Vh, Lh)
    gi = jnp.asarray(gi_np[kh - 1 : kh - 1 + vh])
    mr_np, mi_np = _inv_packed_mats(block_w)
    mr = jnp.asarray(mr_np[:, kw - 1 : kw - 1 + vw])  # (Wc, Vw)
    mi = jnp.asarray(mi_np[:, kw - 1 : kw - 1 + vw])

    # chunk-of-kernels innermost → data block stays VMEM-resident per block
    grid = (nb, n_pad // nk)
    spec_d = pl.BlockSpec(
        (1, f, lh, wc), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_k = pl.BlockSpec(
        (nk, f, lh, wc), lambda b, j: (j, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, nk, vh, vw), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
    )

    flops_mac = 8 * f * lh * wc
    flops_h = 8 * vh * lh * wc
    flops_w = 4 * vh * wc * vw
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            spec_d, spec_d, spec_k, spec_k,
            spec_const2((vh, lh)), spec_const2((vh, lh)),
            spec_const2((wc, vw)), spec_const2((wc, vw)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_pad, vh, vw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nb * n_pad * (flops_mac + flops_h + flops_w),
            bytes_accessed=8 * f * lh * wc * (nb + nb * n_pad)
            + 4 * nb * n_pad * vh * vw,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki, gr, gi, mr, mi)
    return out[:, :n]
