"""Fused Pallas block-convolution kernel (the speed-of-light path).

One Pallas kernel does what the unfused tiled pipeline does in three XLA
stages with HBM round-trips between them — per grid cell (one data block
group × one kernel):

    1. spectral MAC over channels       (VPU)     Σ_f D̂[f] ⊙ K̂[f]
    2. H-axis inverse DFT (windowed)    (MXU)     G[valid rows] @ S
    3. W-axis inverse DFT (windowed)    (MXU)     X @ M[:, valid cols]
    4. DIRECT write of the valid window into its final position in the
       output maps (clipped at array edges) — no separate reassembly /
       transpose pass ever touches HBM.

HBM sees exactly: block spectra (once per block group), kernel spectra
(once per (group, kernel)), and the final maps — ~4× less traffic than the
unfused pipeline, whose product/intermediate tensors round-trip HBM.

Three kernel variants, in measured-speed order on v5e (2048²×100×64²):

  v4 ``radix_h=True``  — radix-2 split of the H-stage inverse: two
      (M, M) @ (M, Wc) sub-transform dots over even/odd spectrum rows +
      VPU twiddle combine; at the (256,511)/(192,384) plan every dot
      dimension is 128-native. 59–61 ms.
  v3 ``wstack=True``   — per-block H dots stored into a VMEM scratch at
      8-aligned row offsets, then ONE W-stage dot (MBH·Vh, Wc) @ (Wc, Vw)
      forms the whole output tile at full MXU row utilization. 61.8 ms.
      (Direct tpu.concatenate of lane-offset slices is a Mosaic
      limitation — "result/input offset mismatch on non-concat
      dimension" — scratch STORES of freshly computed dots are not.)
  v2 ``wstack=False``  — column-stacked H stage (Vh, Lh) @ (Lh, MBH·Wc),
      per-block W dots; every dot has only Vh rows (≤50% MXU row
      utilization at Vh=64). 77.8 ms. Kept as the measured fallback.

All matmuls accumulate fp32 on the MXU at HIGHEST precision (default MXU
bf16 measured 2.3e-3 rel err, far above the 1e-5 bar).

This is the Pallas realization of what the reference's streams variant
gestures at (keep per-kernel work on-chip and overlapped,
src/cudaConvFFTDataStreams.cu) — fused, not just overlapped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fft_convolution_tpu.ops.dft import _inv_full_mats, _inv_packed_mats


def _make_kernel_v3(mbh: int, f: int, vh: int, wc: int, precision,
                    karatsuba):
    """v3 (row-stacked W stage): per-block H-dots land in a VMEM scratch at
    row offset i·Vh (plain 8-aligned stores — sidesteps the Mosaic
    tpu.concatenate limitation that blocked restacking v2's column-stacked
    slices), then ONE W-stage dot (MBH·Vh, Wc) @ (Wc, Vw) synthesizes the
    whole output tile. Both hot dots now have ≥128 rows — v2's dots all had
    Vh (=64 at the headline geometry) rows, i.e. ≤50% MXU row utilization."""

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, gr_ref, gi_ref, mr_ref,
                mi_ref, out_ref, xr_ref, xi_ref):
        kr, ki = kr_ref[0], ki_ref[0]  # (F, Lh, Wc)
        gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        for i in range(mbh):  # static unroll over the block group
            dr, di = dr_ref[0, i, 0], di_ref[0, i, 0]  # (F, Lh, Wc)
            s_r = jnp.sum(kr * dr - ki * di, axis=0)  # (Lh, Wc)
            s_i = jnp.sum(kr * di + ki * dr, axis=0)
            if karatsuba:
                t1 = dot(gr, s_r)
                t2 = dot(gi, s_i)
                t3 = dot(gr + gi, s_r + s_i)
                xr_ref[i * vh:(i + 1) * vh, :] = t1 - t2
                xi_ref[i * vh:(i + 1) * vh, :] = t3 - t1 - t2
            else:
                xr_ref[i * vh:(i + 1) * vh, :] = (
                    dot(gr, s_r) - dot(gi, s_i)
                )
                xi_ref[i * vh:(i + 1) * vh, :] = (
                    dot(gr, s_i) + dot(gi, s_r)
                )
        out_ref[0, 0, :, :] = (
            dot(xr_ref[...], mr_ref[...]) + dot(xi_ref[...], mi_ref[...])
        )

    return _kernel


def _make_kernel_v4(mbh: int, f: int, vh: int, wc: int, lh: int, w0: int,
                    precision, karatsuba):
    """v4 (radix-2 H stage): the windowed H-inverse of an even-length block
    (Lh = 2M) splits into two M-point sub-transforms over the even/odd
    spectrum rows plus a VPU twiddle combine —

        x[v] = Ê[v mod M] + e^{+iπv/M} · Ô[v mod M]

    Spectra arrive with H-rows PRE-PERMUTED (even rows 0..M-1, odd rows
    M..2M-1; the elementwise MAC commutes with the row permutation). Both
    sub-transform dots are (M, M) @ (M, Wc) — with M = 128 every dot
    dimension is MXU-native, eliminating v3's ≤50% row utilization on the
    H stage — and cost 2·M²·Wc MACs against the direct windowed form's
    Vh·2M·Wc: a 2M/(2·Vh)... i.e. Vh/M× reduction (1.5× at Vh=192, M=128).
    The valid window rows [w0, w0+vh) are assembled into the scratch in two
    8-aligned chunks split at row M (requires w0 and M multiples of 8)."""
    m = lh // 2
    c1 = m - w0  # chunk-A rows (window rows below the period boundary)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, mr_ref,
                mi_ref, out_ref, xr_ref, xi_ref):
        kr, ki = kr_ref[0], ki_ref[0]  # (F, 2M, Wc), rows even-then-odd
        ur, ui = ur_ref[...], ui_ref[...]  # (M, M) sub-transform matrices
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        # twiddle t[u] = exp(+iπ u / M), broadcast over lanes (integer iota:
        # Mosaic's tpu.iota only produces int vectors)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)

        def csub(sr, si):  # complex (M,M)@(M,Wc) with U = ur + i·ui
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        for i in range(mbh):  # static unroll over the block group
            dr, di = dr_ref[0, i, 0], di_ref[0, i, 0]  # (F, 2M, Wc)
            s_r = jnp.sum(kr * dr - ki * di, axis=0)  # (2M, Wc)
            s_i = jnp.sum(kr * di + ki * dr, axis=0)
            er, ei = csub(s_r[:m], s_i[:m])  # Ê from even spectrum rows
            orr, oi = csub(s_r[m:], s_i[m:])  # Ô from odd spectrum rows
            tr = twr * orr - twi * oi  # T = t ⊙ Ô  (VPU)
            ti = twr * oi + twi * orr
            # window rows [w0, M): u = v  → Ê + T, rows [w0:M]
            xr_ref[i * vh:i * vh + c1, :] = (er + tr)[w0:, :]
            xi_ref[i * vh:i * vh + c1, :] = (ei + ti)[w0:, :]
            # window rows [M, w0+vh): u = v − M → Ê − T, rows [0:w0+vh−M]
            xr_ref[i * vh + c1:(i + 1) * vh, :] = (er - tr)[: vh - c1, :]
            xi_ref[i * vh + c1:(i + 1) * vh, :] = (ei - ti)[: vh - c1, :]
        out_ref[0, 0, :, :] = (
            dot(xr_ref[...], mr_ref[...]) + dot(xi_ref[...], mi_ref[...])
        )

    return _kernel


def radix_h_legal(lh: int, vh: int) -> bool:
    """Whether the v4 radix-2 H-stage applies: even block height whose
    half-period and window start are 8-aligned, with the window spanning
    the period boundary (otherwise v3 is the same cost, use it), and a
    half-period ≤ 128 — the sub-transform dot cost grows as 2M² and v4
    measured LOSING to v3 at M=256 (121 vs 76.6 ms, runtime/autotune.py
    notes), so larger-M geometries must fall back to v3."""
    m, w0 = lh // 2, lh - vh
    return (
        lh % 2 == 0 and m % 8 == 0 and w0 % 8 == 0 and 0 < w0 < m
        and m <= 128
    )


@functools.lru_cache(maxsize=32)
def _radix_mats(lh: int) -> tuple:
    """M-point sub-transform matrices U[u,j] = exp(+2πi uj/M)/Lh (the 1/Lh
    inverse normalization folded), split f32 planes."""
    import numpy as np

    m = lh // 2
    u = np.arange(m)[:, None].astype(np.float64)
    j = np.arange(m)[None, :].astype(np.float64)
    ph = 2.0 * np.pi * u * j / m
    return (
        (np.cos(ph) / lh).astype(np.float32),
        (np.sin(ph) / lh).astype(np.float32),
    )


def _make_kernel(mbh: int, f: int, vh: int, wc: int, precision, karatsuba):
    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, gr_ref, gi_ref, mr_ref,
                mi_ref, out_ref):
        kr, ki = kr_ref[0], ki_ref[0]  # (F, Lh, Wc)
        gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
        mr, mi = mr_ref[...], mi_ref[...]  # (Wc, Vw)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        # 1. MAC over channels (VPU), blocks column-stacked → (Lh, MBH·Wc)
        srs, sis = [], []
        for i in range(mbh):  # static unroll over the block group
            dr, di = dr_ref[0, i, 0], di_ref[0, i, 0]  # (F, Lh, Wc)
            srs.append(jnp.sum(kr * dr - ki * di, axis=0))  # (Lh, Wc)
            sis.append(jnp.sum(kr * di + ki * dr, axis=0))
        s_r = jnp.concatenate(srs, axis=1)  # (Lh, MBH·Wc)
        s_i = jnp.concatenate(sis, axis=1)
        # 2. windowed H-inverse (complex): full-width MXU dots. Karatsuba
        #    trades the 4th dot for two VPU adds on VMEM-resident values —
        #    the extra temporaries that make it memory-unsafe in the XLA
        #    path never touch HBM here.
        if karatsuba:
            t1 = dot(gr, s_r)
            t2 = dot(gi, s_i)
            t3 = dot(gr + gi, s_r + s_i)
            xr = t1 - t2  # (Vh, MBH·Wc)
            xi = t3 - t1 - t2
        else:
            xr = dot(gr, s_r) - dot(gi, s_i)
            xi = dot(gr, s_i) + dot(gi, s_r)
        # 3. windowed W-inverse (real output) per block + direct placement
        #    of each valid window into the output tile, clipped at edges
        for i in range(mbh):
            xr_i = xr[:, i * wc:(i + 1) * wc]
            xi_i = xi[:, i * wc:(i + 1) * wc]
            out_ref[0, 0, i * vh:(i + 1) * vh, :] = (
                dot(xr_i, mr) + dot(xi_i, mi)
            )

    return _kernel


def block_conv_vmem_bytes(
    f: int, lh: int, wc: int, vh: int, vw: int, mbh: int = 4,
    wstack: bool = True,
) -> int:
    """Estimated per-cell VMEM working set (double-buffered I/O blocks +
    matrices + scratch/intermediates). The scratch variants (v3/v4) hold
    only a (MBH·Vh, Wc) re/im scratch plus per-iteration temporaries; the
    v2 kernel column-stacks (Lh, MBH·Wc) intermediates."""
    d_block = 4 * 2 * mbh * f * lh * wc
    k_block = 4 * 2 * f * lh * wc
    out_block = 4 * mbh * vh * vw
    mats = 4 * 2 * (vh * lh + wc * vw)
    if wstack:
        # re/im scratch + one block's MAC planes + sub-transform temps
        inter = 4 * (2 * mbh * vh * wc + 2 * lh * wc + 4 * vh * wc)
    else:
        inter = 4 * (2 * lh * mbh * wc + 4 * vh * mbh * wc)
    return 2 * (d_block + k_block + out_block) + mats + inter


def block_conv_fits_vmem(f: int, lh: int, wc: int, vh: int, vw: int) -> bool:
    """Whether the fused kernel can run (MBH=1 worst case) within VMEM."""
    return block_conv_vmem_bytes(f, lh, wc, vh, vw, mbh=1) < (12 << 20)


def _choose_mbh(
    nbh: int, f: int, lh: int, wc: int, vh: int, vw: int,
    wstack: bool = True,
) -> int:
    """Vertical blocks per cell: amortizes the kernel-spectrum fetch and
    feeds the stacked W-stage dot (rows = MBH·Vh), bounded by VMEM."""
    mbh = 1
    for cand in (2, 4, 8, 16):
        if cand <= nbh and block_conv_vmem_bytes(
            f, lh, wc, vh, vw, cand, wstack
        ) < (12 << 20):
            mbh = cand
    return mbh


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "block_w", "kh", "kw", "out_h", "out_w",
                     "interpret", "precision", "karatsuba", "mbh", "wstack",
                     "radix_h"),
)
def block_conv_pallas(
    dr: jnp.ndarray,  # (B, nbh, nbw, F, Lh, Wc) f32
    di: jnp.ndarray,
    kr: jnp.ndarray,  # (N, F, Lh, Wc) f32
    ki: jnp.ndarray,
    block_h: int,
    block_w: int,
    kh: int,
    kw: int,
    out_h: int,
    out_w: int,
    *,
    interpret: bool = False,
    precision=None,
    karatsuba: bool | None = None,
    mbh: int | None = None,
    wstack: bool = True,
    radix_h: bool = False,
) -> jnp.ndarray:
    """→ (B, N, out_h, out_w) f32 'full'-window linear-convolution maps,
    assembled in place by clipped block writes, normalization folded in.
    Spectra arrive as split (re, im) f32 planes — the kernel's native form.

    ``precision=None`` follows the global matmul_precision config (note
    Mosaic dots support HIGHEST/DEFAULT only — HIGH raises);
    ``karatsuba`` uses 3 H-stage dots instead of 4 (exact — same bilinear
    form; default: ON for the scratch variants where it measured faster at
    every geometry — v3 (64,384) 64.7→61.8 ms — and OFF for v2 whose extra
    column-stacked temporaries overflowed VMEM at the measured-best MBH);
    ``mbh`` overrides the VMEM-model group size
    (forcing it past the model overflows VMEM — Mosaic aborts);
    ``wstack=True`` selects the v3 kernel (row-stacked single W-stage dot
    via VMEM scratch — full MXU row utilization), False the v2 kernel
    (column-stacked H stage, per-block W dots);
    ``radix_h=True`` (requires ``radix_h_legal(block_h, vh)`` and wstack)
    selects the v4 kernel: radix-2 split of the H-stage inverse into two
    (M, M) @ (M, Wc) sub-transform dots + a VPU twiddle combine."""
    b, nbh, nbw, f, lh, wc = dr.shape
    n = kr.shape[0]
    vh, vw = block_h - kh + 1, block_w - kw + 1
    assert lh == block_h and wc == block_w // 2 + 1
    if precision is None:
        from cuda_fft_convolution_tpu.ops.conv import _matmul_precision

        precision = _matmul_precision()
    if karatsuba is None:
        karatsuba = wstack or radix_h
    if mbh is None:
        mbh = _choose_mbh(nbh, f, lh, wc, vh, vw, wstack or radix_h)
    mbh = min(mbh, nbh)
    gbh = -(-nbh // mbh)  # block groups along H
    if gbh * mbh != nbh:
        # pad block axis; padded blocks write rows beyond out_h → clipped
        pad = ((0, 0), (0, gbh * mbh - nbh), (0, 0), (0, 0), (0, 0), (0, 0))
        dr = jnp.pad(dr, pad)
        di = jnp.pad(di, pad)

    if radix_h:
        assert wstack and radix_h_legal(block_h, vh), (
            "radix_h requires the v4 window/period alignment "
            f"(block_h={block_h}, vh={vh})"
        )
        # even/odd H-row permutation of the spectra (the elementwise MAC
        # commutes with it, so permuting inputs once outside the kernel is
        # exact); sub-transform matrices replace the windowed G.
        perm = jnp.concatenate(
            [jnp.arange(0, lh, 2), jnp.arange(1, lh, 2)]
        )
        dr = jnp.take(dr, perm, axis=4)
        di = jnp.take(di, perm, axis=4)
        kr = jnp.take(kr, perm, axis=2)
        ki = jnp.take(ki, perm, axis=2)
        ur_np, ui_np = _radix_mats(block_h)
        gr, gi = jnp.asarray(ur_np), jnp.asarray(ui_np)  # (M, M)
        h_mat_shape = (block_h // 2, block_h // 2)
    else:
        gr_np, gi_np = _inv_full_mats(block_h)
        gr = jnp.asarray(gr_np[kh - 1 : kh - 1 + vh])  # (Vh, Lh)
        gi = jnp.asarray(gi_np[kh - 1 : kh - 1 + vh])
        h_mat_shape = (vh, lh)
    mr_np, mi_np = _inv_packed_mats(block_w)
    mr = jnp.asarray(mr_np[:, kw - 1 : kw - 1 + vw])  # (Wc, Vw)
    mi = jnp.asarray(mi_np[:, kw - 1 : kw - 1 + vw])

    # n innermost → the data block group stays VMEM-resident across the
    # whole bank; K is re-fetched once per (group, kernel) — the group
    # amortizes it over MBH blocks. (D block index units are multiples of
    # the block shape, so index gh covers block rows [gh·MBH, (gh+1)·MBH).)
    grid = (b, gbh, nbw, n)
    spec_k = pl.BlockSpec(
        (1, f, lh, wc),
        lambda bi, gh, bw, ni: (ni, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    spec_const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, gh, bw, ni: (0, 0), memory_space=pltpu.VMEM
    )
    # Output tile (MBH·Vh, Vw) lands at block-aligned offsets; edge tiles
    # extend past (out_h, out_w) and Pallas clips the writes.
    out_spec = pl.BlockSpec(
        (1, 1, mbh * vh, vw),
        lambda bi, gh, bw, ni: (bi, ni, gh, bw),
        memory_space=pltpu.VMEM,
    )

    if radix_h:
        kern = _make_kernel_v4(
            mbh, f, vh, wc, lh, lh - vh, precision, karatsuba
        )
        scratch = [
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
        ]
    elif wstack:
        kern = _make_kernel_v3(mbh, f, vh, wc, precision, karatsuba)
        scratch = [
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
        ]
    else:
        kern = _make_kernel(mbh, f, vh, wc, precision, karatsuba)
        scratch = []

    flops_mac = 8 * f * lh * wc
    if radix_h:
        # two M-point sub-transforms + VPU twiddle combine
        m_half = lh // 2
        flops_h = 16 * m_half * m_half * wc + 8 * m_half * wc
    else:
        flops_h = 8 * vh * lh * wc
    flops_w = 4 * vh * wc * vw
    out = pl.pallas_call(
        kern,
        grid=grid,
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec(
                (1, mbh, 1, f, lh, wc),
                lambda bi, gh, bw, ni: (bi, gh, bw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, mbh, 1, f, lh, wc),
                lambda bi, gh, bw, ni: (bi, gh, bw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            spec_k,
            spec_k,
            spec_const2(h_mat_shape),
            spec_const2(h_mat_shape),
            spec_const2((wc, vw)),
            spec_const2((wc, vw)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, out_h, out_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * nbh * nbw * n * (flops_mac + flops_h + flops_w),
            bytes_accessed=8 * f * lh * wc * (b * nbh * nbw)
            + 8 * f * lh * wc * (b * gbh * nbw * n)
            + 4 * b * n * out_h * out_w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki, gr, gi, mr, mi)
    return out
