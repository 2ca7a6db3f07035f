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
    dr, di = dr_ref[0], di_ref[0]  # (F, Lh, Wc)
    kr, ki = kr_ref[0], ki_ref[0]
    # 1. MAC over channels (VPU)
    sr = jnp.sum(kr * dr - ki * di, axis=0)  # (Lh, Wc)
    si = jnp.sum(kr * di + ki * dr, axis=0)
    # 2. windowed H-inverse (complex): (gr + i gi) @ (sr + i si)
    gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xr = dot(gr, sr) - dot(gi, si)  # (Vh, Wc)
    xi = dot(gr, si) + dot(gi, sr)
    # 3. windowed W-inverse (real output): Re((xr + i xi) @ (mr + i mi))
    mr, mi = mr_ref[...], mi_ref[...]  # (Wc, Vw)
    out_ref[0, 0] = dot(xr, mr) + dot(xi, mi)  # (Vh, Vw)


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

    grid = (nb, n)  # n innermost → data block stays VMEM-resident per block
    spec_d = pl.BlockSpec(
        (1, f, lh, wc), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_k = pl.BlockSpec(
        (1, f, lh, wc), lambda b, j: (j, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, vh, vw), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
    )

    flops_mac = 8 * f * lh * wc
    flops_h = 8 * vh * lh * wc
    flops_w = 4 * vh * wc * vw
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            spec_d, spec_d, spec_k, spec_k,
            spec_const2((vh, lh)), spec_const2((vh, lh)),
            spec_const2((wc, vw)), spec_const2((wc, vw)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n, vh, vw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nb * n * (flops_mac + flops_h + flops_w),
            bytes_accessed=8 * f * lh * wc * (nb + nb * n)
            + 4 * nb * n * vh * vw,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki, gr, gi, mr, mi)
