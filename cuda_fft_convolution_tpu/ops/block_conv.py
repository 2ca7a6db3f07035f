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

# Sentinel precision: split-bf16 3-pass dots. Mosaic dots support only
# HIGHEST (6-pass bf16, fp32-exact) and DEFAULT (1-pass bf16, ~2e-3 rel
# err); XLA's HIGH (3-pass) tier is unavailable in-kernel. This implements
# it manually: x = hi + lo with hi = bf16(x), then
#     A @ B ≈ hi_A@hi_B + hi_A@lo_B + lo_A@hi_B        (lo@lo dropped)
# — 3 DEFAULT passes ≈ half the HIGHEST MXU time, error ~1e-7 rel
# (measured on v5e; the dropped lo·lo term is ~2^-32 relative).
BF16X3 = "bf16x3"

# Sentinel precision for the bf16 SERVING TIER (store_dtype='bfloat16'):
# spectra arrive as bf16 planes, so the dots run native SINGLE-pass bf16
# (operands are already bf16-rounded — extra passes cannot recover what
# storage discarded) with f32 MXU accumulation; the inverse matrices load
# bf16 too. One third of BF16X3's dot passes and half the spectra
# VMEM/HBM bytes; accuracy = the tier's ~5e-3 (storage-rounding bound).
BF16IO = "bf16io"


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot_generic(precision, dimension_numbers):
    """Dot factory honoring the BF16X3 / BF16IO precision sentinels for an
    arbitrary contraction layout (the fused kernels use axis-1 contraction
    for the transform dots and axis-0 contraction for the v5x rank-1
    sliver outer product — Mosaic takes both as layout flags)."""
    if precision == BF16IO:
        base = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

        def dot(a, b):
            return base(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))

        return dot
    if precision == BF16X3:
        base = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

        def dot(a, b):
            a_hi, a_lo = _split_hi_lo(a)
            b_hi, b_lo = _split_hi_lo(b)
            return base(a_hi, b_hi) + base(a_hi, b_lo) + base(a_lo, b_hi)

        return dot
    return functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _make_dot_t0(precision):
    """Axis-0-contraction dot: (K, M) × (K, N) → (M, N). Used by the v5x
    kernel's rank-1 sliver update ((1, R) × (1, Tn) outer product on the
    MXU)."""
    return _make_dot_generic(precision, (((0,), (0,)), ((), ())))


def _make_dot(precision):
    """Row-major (K-contraction on lhs axis 1) dot for the fused kernels,
    honoring the BF16X3 / BF16IO precision sentinels."""
    return _make_dot_generic(precision, (((1,), (0,)), ((), ())))


def _make_kernel_v3(mbh: int, mbw: int, f: int, vh: int, vw: int, wc: int,
                    precision, karatsuba):
    """v3 (row-stacked W stage): per-block H-dots land in a VMEM scratch at
    row offset i·Vh (plain 8-aligned stores — sidesteps the Mosaic
    tpu.concatenate limitation that blocked restacking v2's column-stacked
    slices), then ONE W-stage dot (MBH·Vh, Wc) @ (Wc, Vw) per W-column
    synthesizes the output tile. Both hot dots have ≥128 rows — v2's dots
    all had Vh rows, ≤50% MXU row utilization. The (MBH, MBW) block group
    amortizes the kernel-spectrum fetch over MBH·MBW blocks."""

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, gr_ref, gi_ref, mr_ref,
                mi_ref, out_ref, xr_ref, xi_ref):
        # f32 MAC regardless of the stored dtype (bf16-tier refs upcast on
        # read — the VPU converts are free next to the dots)
        kr = kr_ref[0].astype(jnp.float32)  # (F, Lh, Wc)
        ki = ki_ref[0].astype(jnp.float32)
        gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
        dot = _make_dot(precision)
        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows of the group
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, Lh, Wc)
                di = di_ref[0, i, j].astype(jnp.float32)
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
            out_ref[0, 0, :, j * vw:(j + 1) * vw] = (
                dot(xr_ref[...], mr_ref[...]) + dot(xi_ref[...], mi_ref[...])
            ).astype(out_ref.dtype)

    return _kernel


def _make_kernel_v4(mbh: int, mbw: int, f: int, vh: int, vw: int, wc: int,
                    lh: int, w0: int, precision, karatsuba):
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
        # (F, 2M, Wc), rows even-then-odd; f32 MAC at any stored dtype
        kr = kr_ref[0].astype(jnp.float32)
        ki = ki_ref[0].astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]  # (M, M) sub-transform matrices
        dot = _make_dot(precision)
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

        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, 2M, Wc)
                di = di_ref[0, i, j].astype(jnp.float32)
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
            out_ref[0, 0, :, j * vw:(j + 1) * vw] = (
                dot(xr_ref[...], mr_ref[...]) + dot(xi_ref[...], mi_ref[...])
            ).astype(out_ref.dtype)

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
        kr = kr_ref[0].astype(jnp.float32)  # (F, Lh, Wc)
        ki = ki_ref[0].astype(jnp.float32)
        gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
        mr, mi = mr_ref[...], mi_ref[...]  # (Wc, Vw)
        dot = _make_dot(precision)
        # 1. MAC over channels (VPU), blocks column-stacked → (Lh, MBH·Wc)
        srs, sis = [], []
        for i in range(mbh):  # static unroll over the block group
            dr = dr_ref[0, i, 0].astype(jnp.float32)  # (F, Lh, Wc)
            di = di_ref[0, i, 0].astype(jnp.float32)
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
            ).astype(out_ref.dtype)

    return _kernel


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def block_conv_vmem_bytes(
    f: int, lh: int, wc: int, vh: int, vw: int, mbh: int = 4,
    wstack: bool = True, mbw: int = 1, spec_bytes: int = 4,
) -> int:
    """Estimated per-cell VMEM working set (double-buffered I/O blocks +
    matrices + scratch/intermediates). The scratch variants (v3/v4) hold
    only a (MBH·Vh, Wc) re/im scratch plus per-iteration temporaries; the
    v2 kernel column-stacks (Lh, MBH·Wc) intermediates. ``spec_bytes``:
    stored-spectra element width (2 for the bf16 serving tier — I/O blocks
    and matrices halve; the MAC planes/scratch stay f32).

    Every buffer is counted at its TILE-PADDED footprint (trailing dims to
    8 sublanes × 128 lanes): Mosaic allocates scoped VMEM in (8, 128)
    tiles, so a (63, 144) block physically occupies (64, 256) — 1.8×
    nominal. The unpadded model admitted F≥8 plans at Wc=144 whose real
    allocation exceeded the 16 MB scoped-vmem limit ("Scoped allocation
    with size 16.75M and limit 16.00M", v5e remote compile at blocks
    (63, 287), group (4, 2), F=8 — perf/sweep_f8_fused.py)."""
    # Inverse matrices have the OPPOSITE axis roles to the spectra blocks:
    # G is (Vh, Lh) — lh on the lane dim — and M is (Wc, Vw) — wc on the
    # sublane dim (block_conv_pallas operand construction).
    mats = spec_bytes * 2 * (
        _pad8(vh) * _pad128(lh) + _pad8(wc) * _pad128(vw)
    )
    lh, wc = _pad8(lh), _pad128(wc)
    vh, vw = _pad8(vh), _pad128(vw)
    d_block = spec_bytes * 2 * mbh * mbw * f * lh * wc
    k_block = spec_bytes * 2 * f * lh * wc
    out_block = 4 * mbh * vh * mbw * vw
    if wstack:
        # re/im scratch + one block's MAC planes + sub-transform temps
        inter = 4 * (2 * mbh * vh * wc + 2 * lh * wc + 4 * vh * wc)
    else:
        inter = 4 * (2 * lh * mbh * wc + 4 * vh * mbh * wc)
    return 2 * (d_block + k_block + out_block) + mats + inter


def _vmem_limit(spec_bytes: int) -> int:
    """Scoped-VMEM budget the padded model is checked against. f32: the
    16 MB hardware scoped limit (the padded model slightly OVER-estimates —
    measured 16.75M real vs 19.5M modeled at the one crashing f32 plan, so
    16 MB keeps a margin). bf16 plans carry hidden f32 conversion copies
    the model doesn't see: the measured crash/ok boundary sits between
    10.9 MB (compiles, runs) and 12.6 MB (scoped-vmem abort) of modeled
    bytes — 12 MB is the empirical bar (perf/sweep_f8_fused.py, v5e)."""
    return (16 << 20) if spec_bytes >= 4 else (12 << 20)


def block_conv_fits_vmem(
    f: int, lh: int, wc: int, vh: int, vw: int, spec_bytes: int = 4
) -> bool:
    """Whether the fused kernel can run (MBH=MBW=1 worst case) within VMEM."""
    return block_conv_vmem_bytes(
        f, lh, wc, vh, vw, mbh=1, spec_bytes=spec_bytes
    ) < _vmem_limit(spec_bytes)


# Measured (MBH, MBW) overrides: (lh, wc, vh, vw, f, spec_bytes) →
# (mbh, mbw). The analytic _choose_group heuristic was tuned at HIGHEST
# and carried on faith to the bf16x3/BF16IO tiers (round-3 VERDICT weak
# #5); autotune_block_geometry's group sweep writes measured winners here
# so dispatch reproduces them. Registration clears block_conv_pallas's
# jit cache (the group is a trace-time choice).
_GROUP_TABLE: dict = {}

# Measured builtin groups (perf/r4_autotune.py group sweeps, v5e
# 2026-08-19) — the user-level _GROUP_TABLE overlays these.
_BUILTIN_GROUPS: dict = {
    (128, 256, 64, 384, 8, 4): (1, 1),   # F=8 f32 @ (128,511)
    (256, 256, 192, 384, 8, 2): (1, 1),  # F=8 bf16 @ (256,511)
    (128, 256, 64, 384, 1, 2): (2, 1),   # F=1 bf16 @ (128,511)
    (128, 256, 96, 384, 1, 2): (8, 1),   # F=1 bf16 @ (128,511) K=32
    # F=1 f32 @ the v5 DIF (256,512) plan: streamed sweep (2,2) 16.73
    # ms/frame vs (1,2) 17.52, (4,1) 17.51, (2,1) 18.29, (1,1) 19.04;
    # the analytic chooser picks (1,3), unswept ≈ (1,2)
    # (perf/r4c_v5_peaks_api.py §4, v5e 2026-08-19).
    (256, 257, 192, 384, 1, 4): (2, 2),
    # F=1 f32 @ the 32²-envelope v5 DIF (128,512) plan: (2,2) 15.6
    # ms/frame streamed vs analytic 16.4, (4,1) 17.3
    # (perf/r4h_v5_k32.py, v5e 2026-08-19).
    (128, 257, 96, 384, 1, 4): (2, 2),
    # F=1 bf16 @ the v5x (256,512) plan: the analytic (1,3) measured
    # WINNING over forced (2,2) 10.78 / (1,2) 11.45 at 9.94 ms/frame
    # streamed (perf/r5a_v5x.py, v5e 2026-08-20) — pinned so chooser
    # changes can't regress it.
    (256, 257, 192, 384, 1, 2): (1, 3),
}


# Measured-winning v5 (radix-2 DIF W stage) plans: {(block_h, block_w,
# kw, spec_bytes)}. The v5 stage only pays where measurement says so (the
# F=31/fused-deny lesson: legality ≠ profit), so production dispatch
# (fused_block_conv) turns radix_w on ONLY for registered plans; the
# default empty set keeps v4 everywhere until a sweep registers winners.
_RADIX_W_TABLE: set = set()

# Measured on v5e (perf/r4_v5w.py, 2026-08-19): the fp32 v5 plan at
# blocks (256, 512) / envelope (65, 129) one-shot 35.7 ms vs 44.4 at the
# v4-tuned (256, 511) and 52.6 for v4 at the same 512 blocks (parity
# 2.4e-7 on-chip). bf16io measured LOSING (39.5 vs 30.9 at the tier's
# tuned plan — single-pass dots shrink the W-stage share while the DIF's
# extra VPU work stays), so the tier stays v4: fp32 entries only.
# F is part of the key: at F ∈ {2, 4} the DIF stage measured LOSING too
# (perf/r4e_v5_fmulti.py, v5e 2026-08-19: streamed F=2 11.28 ms vs 9.53
# v4@511, F=4 17.70 vs 11.14 — the Nyquist-sliver MAC's F-unrolled
# channel sum and the per-F halves shuffles scale with F while v4's
# single W MAC amortizes), so the builtin plan is F=1 only.
_BUILTIN_RADIX_W: set = {
    (256, 512, 129, 4, 1),
    # 32²-envelope plan (perf/r4h_v5_k32.py, v5e 2026-08-19): v5 @
    # (128,512) g(2,2) streamed 15.6 ms/frame vs 17.4 at the v4-tuned
    # (128,511) (one-shot 44.0 vs 51.2); parity exact vs the auto-group
    # v5 run. Same fp32-F=1-only scope as the 64² entry.
    (128, 512, 129, 4, 1),
    # bf16 serving tier, F=1 headline (round 5, perf/r5a_v5x.py +
    # r5b_v5x_api.py, v5e 2026-08-20): the v5x variant (XLA-hoisted
    # sliver — the constant VPU/1-lane-DMA cost that made in-kernel-v5
    # lose at the tier, PERF.md round 4b) measured 9.94 ms/frame
    # streamed vs 12.16 at the tier-tuned v3 (128,511) and 10.42 v4 @
    # (256,511): the tier's first MXU lever, 1.22×. End-to-end through
    # dispatch: 9.8 ms/frame (42.8 GPix·F/s wall), tier parity 4.7e-3
    # vs the direct engine.
    (256, 512, 129, 2, 1),
}

# The detection head's v5 plans are registered separately: the peaks
# epilogue replaces the output stores with per-segment VPU reductions, so
# the conv winner need not carry over (the v4 precedent: auto-v4 is
# f32-only for peaks while conv runs it at both tiers).
_RADIX_W_TABLE_PEAKS: set = set()
# Measured on v5e (perf/r4g2_v5_peaks_api.py, 2026-08-19, end-to-end
# detect_peaks with a real bank, 2048²×100 64² kernels fp32 'same',
# streamed sync/9): v5-peaks @ (256,512) 18.4 ms/frame vs 21.2 at the
# v4-peaks-tuned (256,511) and 27.8 for v4 at the same 512 blocks —
# the conv v5 plan's lane-alignment win carries to the peaks epilogue;
# peak parity 100/100 across plans. bf16 stays v3 (tier gate); F ≥ 2
# follows the conv lesson (per-F DIF costs) until measured.
_BUILTIN_RADIX_W_PEAKS: set = {
    (256, 512, 129, 4, 1),
    # 32²-envelope (perf/r4h_v5_k32.py): v5-peaks @ (128,512) streamed
    # 18.3 ms/frame ≈ v4 @ the old (128,511) plan's 18.1 (tie), one-shot
    # 37.9 vs 54.5 — registered so the peaks head's conv-entry fallback
    # (now (128,512)) runs the measured kernel instead of v4 paying the
    # Wc=257 lane pad, and one set of spectra serves both heads.
    (128, 512, 129, 4, 1),
}


# Plans whose registered v5 variant is v5x (XLA-hoisted Nyquist sliver +
# in-kernel rank-1 MXU update — see _make_kernel_v5x) rather than the
# original in-kernel-sliver v5. Keys as in _RADIX_W_TABLE; membership here
# is meaningful only for keys that are also radix-w-enabled. Why the
# variant is per-tier: at fp32 the fused call is MXU-bound and the
# in-kernel sliver hides under the dots (v5x measured 19.02 vs 16.62 ms
# v5, peaks 23.02 vs 19.17 — perf/r5a_v5x.py), while at bf16io the
# single-pass dots expose it (9.94 v5x vs 10.33 v5 vs 12.16 tier-tuned
# v3) — round 4c's compute-roofline story, confirmed from the other side.
# Dynamic per-key OVERRIDES (True = v5x, False = in-kernel v5): an
# explicit ``sliver='kernel'`` re-registration must be able to turn a
# BUILTIN v5x plan back to the in-kernel variant (a plain or-of-sets
# cannot express that opt-out), so registration records the chosen
# variant and lookup consults the override before the builtin set.
_RADIX_W_XSLIVER: dict = {}
_RADIX_W_XSLIVER_PEAKS: dict = {}
_BUILTIN_RADIX_W_XSLIVER: set = {
    (256, 512, 129, 2, 1),  # the bf16 F=1 headline plan (round 5)
}
_BUILTIN_RADIX_W_XSLIVER_PEAKS: set = set()


def register_radix_w_plan(
    block_h: int, block_w: int, kw: int, spec_bytes: int = 4, f: int = 1,
    head: str = "conv", sliver: str = "kernel",
) -> None:
    """Pin a measured-winning v5 DIF plan (see _RADIX_W_TABLE) for banks
    with exactly ``f`` feature channels at the given storage tier.
    ``head='peaks'`` registers for the detection head's kernel instead
    (separate table — the winners can differ per head). ``sliver='xla'``
    selects the v5x variant (Nyquist sliver synthesized outside the
    kernel, applied as a rank-1 MXU dot) for this plan; the default
    ``sliver='kernel'`` records an explicit opt-out, so re-registering a
    plan whose BUILTIN variant is v5x flips it back to the in-kernel
    sliver."""
    key = (block_h, block_w, kw, int(spec_bytes), int(f))
    table = _RADIX_W_TABLE_PEAKS if head == "peaks" else _RADIX_W_TABLE
    table.add(key)
    xtable = (
        _RADIX_W_XSLIVER_PEAKS if head == "peaks" else _RADIX_W_XSLIVER
    )
    xtable[key] = sliver == "xla"
    # trace-time dispatch: outer jitted workers (ops.tiled.conv_blocks /
    # conv_blocks_peaks) inline the radix_w_enabled decision — clearing
    # only the kernel wrappers would leave their stale executables live
    from cuda_fft_convolution_tpu.utils.config import (
        invalidate_jit_consumers,
    )

    invalidate_jit_consumers()


def radix_w_enabled(
    block_h: int, block_w: int, kh: int, kw: int, spec_bytes: int = 4,
    f: int = 1, head: str = "conv",
) -> bool:
    """Whether production dispatch should run the v5 DIF W stage for this
    plan: registered as measured-winning AND structurally legal. ``f`` is
    the bank's feature-channel count — the DIF stage's extra VPU work
    scales with F, so plans are measured and registered per-F (and per
    ``head``: the detection head's epilogue changes the economics)."""
    key = (block_h, block_w, kw, int(spec_bytes), int(f))
    if head == "peaks":
        if (
            key not in _RADIX_W_TABLE_PEAKS
            and key not in _BUILTIN_RADIX_W_PEAKS
        ):
            return False
    elif key not in _RADIX_W_TABLE and key not in _BUILTIN_RADIX_W:
        return False
    vh, vw = block_h - kh + 1, block_w - kw + 1
    return radix_h_legal(block_h, vh) and radix_w_legal(block_w, kw, vw)


def radix_w_xsliver(
    block_h: int, block_w: int, kw: int, spec_bytes: int = 4,
    f: int = 1, head: str = "conv",
) -> bool:
    """Whether a radix-w-enabled plan should run the v5x variant
    (XLA-hoisted sliver) instead of the in-kernel-sliver v5 — a
    per-(plan, tier, F, head) measured registration like the plan
    itself."""
    key = (block_h, block_w, kw, int(spec_bytes), int(f))
    if head == "peaks":
        override = _RADIX_W_XSLIVER_PEAKS.get(key)
        builtin = key in _BUILTIN_RADIX_W_XSLIVER_PEAKS
    else:
        override = _RADIX_W_XSLIVER.get(key)
        builtin = key in _BUILTIN_RADIX_W_XSLIVER
    return builtin if override is None else override


def register_fused_group(
    lh: int, wc: int, vh: int, vw: int, f: int, spec_bytes: int,
    mbh: int, mbw: int,
) -> None:
    """Pin a measured (MBH, MBW) block group for a fused-kernel geometry
    at a storage tier (spec_bytes: 4 = f32, 2 = bf16)."""
    _GROUP_TABLE[(lh, wc, vh, vw, f, spec_bytes)] = (int(mbh), int(mbw))
    # see register_radix_w_plan: the group choice is inlined at trace
    # time into outer jitted workers too
    from cuda_fft_convolution_tpu.utils.config import (
        invalidate_jit_consumers,
    )

    invalidate_jit_consumers()


def lookup_fused_group(
    lh: int, wc: int, vh: int, vw: int, f: int, spec_bytes: int
) -> tuple[int, int] | None:
    key = (lh, wc, vh, vw, f, spec_bytes)
    return _GROUP_TABLE.get(key, _BUILTIN_GROUPS.get(key))


def _choose_group(
    nbh: int, nbw: int, f: int, lh: int, wc: int, vh: int, vw: int,
    wstack: bool = True, spec_bytes: int = 4,
) -> tuple[int, int]:
    """(MBH, MBW) blocks per cell: the group amortizes the kernel-spectrum
    fetch over MBH·MBW blocks and feeds the stacked W-stage dot (rows =
    MBH·Vh), bounded by VMEM. Maximize the group area; prefer H-growth
    (bigger W-dot rows) over W-growth at equal area."""
    best = (1, 1)
    best_key = (1, 1, 1)
    for mbw in (1, 2, 3, 4, 6, 8):
        if mbw > nbw:
            continue
        for mbh in (1, 2, 4, 8, 16):
            if mbh > nbh:
                continue
            if block_conv_vmem_bytes(
                f, lh, wc, vh, vw, mbh, wstack, mbw, spec_bytes
            ) >= (12 << 20):
                continue
            # prefer larger area; at equal area prefer SQUARER groups —
            # (2,2) measured 59.1 ms vs (4,1) 65.3 at the headline v4 plan
            # (perf/bench_r3_fused.py) — then larger mbh.
            key = (mbh * mbw, min(mbh, mbw), mbh)
            if key > best_key:
                best, best_key = (mbh, mbw), key
    return best


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "block_w", "kh", "kw", "out_h", "out_w",
                     "interpret", "precision", "karatsuba", "mbh", "mbw",
                     "wstack", "radix_h", "radix_w", "xsliver",
                     "assume_permuted", "out_dtype"),
)
def block_conv_pallas(
    dr: jnp.ndarray,  # (B, nbh, nbw, F, Lh, Wc) f32 | bf16 (serving tier)
    di: jnp.ndarray,
    kr: jnp.ndarray,  # (N, F, Lh, Wc) — same dtype as the data spectra
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
    mbw: int | None = None,
    wstack: bool = True,
    radix_h: bool = False,
    radix_w: bool = False,
    xsliver: bool = False,
    assume_permuted: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """→ (B, N, out_h, out_w) f32 'full'-window linear-convolution maps,
    assembled in place by clipped block writes, normalization folded in.
    Spectra arrive as split (re, im) planes — f32, or bf16 for the serving
    tier (store_dtype='bfloat16'): bf16 spectra run single-pass BF16IO
    dots with f32 accumulation (half the spectra VMEM/HBM bytes, one third
    of BF16X3's dot passes; ~5e-3 tier accuracy).

    ``precision=None`` follows the global matmul_precision config; Mosaic
    dots support HIGHEST/DEFAULT only — the extra ``BF16X3`` sentinel runs
    every dot as a manual split-bf16 3-pass (≈ XLA's HIGH tier: half the
    HIGHEST MXU time, ~1e-7 rel err — gate via Config.fused_precision);
    ``karatsuba`` uses 3 H-stage dots instead of 4 (exact — same bilinear
    form; default: ON for the scratch variants where it measured faster at
    every geometry — v3 (64,384) 64.7→61.8 ms — and OFF for v2 whose extra
    column-stacked temporaries overflowed VMEM at the measured-best MBH);
    ``mbh``/``mbw`` override the VMEM-model (MBH, MBW) block-group size
    (forcing past the model overflows VMEM — Mosaic aborts); the group
    amortizes the kernel-spectrum fetch over MBH·MBW blocks (the streams
    variant's amortization target, src/cudaConvFFTDataStreams.cu:338-469);
    ``wstack=True`` selects the v3 kernel (row-stacked single W-stage dot
    via VMEM scratch — full MXU row utilization), False the v2 kernel
    (column-stacked H stage, per-block W dots, MBW unsupported);
    ``radix_h=True`` (requires ``radix_h_legal(block_h, vh)`` and wstack)
    selects the v4 kernel: radix-2 split of the H-stage inverse into two
    (M, M) @ (M, Wc) sub-transform dots + a VPU twiddle combine.

    ``out_dtype`` (None → float32): the MAPS store dtype. 'bfloat16' casts
    each output tile IN-KERNEL before the store — the f32 scratch/MAC are
    unchanged, only the HBM output write halves (the maps are the dominant
    write traffic at serving geometries; detection consumers tolerate the
    ~4e-3 bf16 rounding — the same envelope as the bf16 spectra tier)."""
    b, nbh, nbw, f, lh, wc = dr.shape
    n = kr.shape[0]
    vh, vw = block_h - kh + 1, block_w - kw + 1
    assert lh == block_h and wc == block_w // 2 + 1
    assert dr.dtype == kr.dtype, "data/kernel spectra dtype mismatch"
    out_dt = jnp.dtype(out_dtype if out_dtype is not None else jnp.float32)
    if radix_w:
        radix_h = True  # the v5 W stage builds on the v4 H stage
    tier_bf16 = dr.dtype == jnp.bfloat16
    if precision is None:
        from cuda_fft_convolution_tpu.ops.conv import _matmul_precision
        from cuda_fft_convolution_tpu.utils.config import get_config

        if tier_bf16:
            # bf16 serving tier: single-pass bf16 dots (operands are
            # already storage-rounded; more passes cannot help), f32
            # accumulation — see BF16IO
            precision = BF16IO
        else:
            fp = get_config().fused_precision
            precision = BF16X3 if fp == BF16X3 else _matmul_precision()
    if interpret and precision == BF16X3:
        # BF16X3 is a Mosaic-only fast path: interpret mode lowers the
        # kernel through plain XLA, whose algebraic simplifier REFOLDS the
        # split-bf16 3-pass dots back into single-pass bf16 (measured
        # 2.9e-3 rel err vs the compiled kernel's 8.9e-6). Interpret mode
        # (the non-TPU fallback and test harness) runs HIGHEST instead.
        precision = jax.lax.Precision.HIGHEST
    if karatsuba is None:
        karatsuba = wstack or radix_h
    if mbh is None and mbw is None:
        hit = lookup_fused_group(
            lh, wc, vh, vw, f, 2 if tier_bf16 else 4
        )
        if hit is not None:
            mbh, mbw = min(hit[0], nbh), min(hit[1], nbw)
        else:
            # Group choice uses the f32 byte model even at the bf16 tier:
            # crediting the halved spectra bytes picks LARGER groups,
            # measured SLOWER (stream9 10.6 vs 9.0 ms on the headline
            # bf16io plan — VMEM pressure beats the extra kernel-fetch
            # amortization). The tier's halved bytes still widen the
            # fits_vmem legality gate.
            mbh, mbw = _choose_group(
                nbh, nbw, f, lh, wc, vh, vw, wstack or radix_h
            )
    if mbh is None:
        mbh = 1
    if mbw is None:
        mbw = 1
    if not (wstack or radix_h):
        mbw = 1  # v2 kernel has no W-column loop
    mbh = min(mbh, nbh)
    mbw = min(mbw, nbw)
    gbh = -(-nbh // mbh)  # block groups along H
    gbw = -(-nbw // mbw)  # block groups along W
    if gbh * mbh != nbh or gbw * mbw != nbw:
        # pad block axes; padded blocks write rows/cols beyond the output
        # extent → clipped
        pad = ((0, 0), (0, gbh * mbh - nbh), (0, gbw * mbw - nbw),
               (0, 0), (0, 0), (0, 0))
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
        # ``assume_permuted``: the caller stored spectra in radix layout
        # already (rows even-then-odd; lanes [W-even | W-odd | Nyquist]
        # under radix_w) — the per-call gathers vanish.
        if not assume_permuted:
            perm = jnp.concatenate(
                [jnp.arange(0, lh, 2), jnp.arange(1, lh, 2)]
            )
            dr = jnp.take(dr, perm, axis=4)
            di = jnp.take(di, perm, axis=4)
            kr = jnp.take(kr, perm, axis=2)
            ki = jnp.take(ki, perm, axis=2)

    if radix_w:
        # v5: radix-2 DIF (halves-split) W stage on top of the v4 H stage.
        # Lane layout: the packed entries are permuted to [even bins
        # 0,2,..,W/2−2 | odd bins 1,3,..,W/2−1] and the Nyquist entry
        # m=W/2 is carved out as a 1-lane sliver. With P = half-length
        # packed synthesis of the even bins (+ the sliver's (−1)^t rank-1
        # term) and Q = the twiddle-folded synthesis of the odd bins,
        #     x[t] = P[t] + Q[t],   x[t + W/2] = P[t] − Q[t]
        # — output stores are CONTIGUOUS lane slices (the earlier
        # output-parity DIT split needed an even/odd lane interleave that
        # Mosaic cannot lower: "infer-vector-layout: unsupported shape
        # cast"). The elementwise MAC commutes with any fixed lane
        # permutation, so permuting inputs once outside the kernel is
        # exact (the production layout folds this permutation into the
        # forward DFT matrix columns — zero cost; here jnp.take keeps the
        # prototype self-contained).
        assert radix_h and radix_w_legal(block_w, kw, vw), (
            f"radix_w requires radix_h and the v5 W alignment "
            f"(block_w={block_w}, kw={kw}, vw={vw})"
        )
        l4 = block_w // 4
        wc_full = block_w // 2 + 1
        if xsliver:
            # v5x: sliver synthesized OUTSIDE (from the H-permuted
            # planes), handed in as one aligned operand per group. The
            # Nyquist lane is the LAST lane in BOTH layouts (packed
            # natural and radix), so this reads the same slice either way.
            slv, par = _xsliver_operands(
                dr, di, kr, ki, block_h, block_w, kw, vh, vw,
                mbh, mbw, gbh, gbw,
            )
        else:
            dslr, dsli = dr[..., wc_full - 1 :], di[..., wc_full - 1 :]
            kslr, ksli = kr[..., wc_full - 1 :], ki[..., wc_full - 1 :]
        if assume_permuted:
            # radix-layout storage: lanes already [even | odd | Nyquist]
            # — the main planes are an aligned slice, no gather
            dr, di = dr[..., : 2 * l4], di[..., : 2 * l4]
            kr, ki = kr[..., : 2 * l4], ki[..., : 2 * l4]
        else:
            perm_w = jnp.concatenate(
                [jnp.arange(0, 2 * l4, 2), jnp.arange(1, 2 * l4, 2)]
            )
            dr = jnp.take(dr, perm_w, axis=5)
            di = jnp.take(di, perm_w, axis=5)
            kr = jnp.take(kr, perm_w, axis=3)
            ki = jnp.take(ki, perm_w, axis=3)
        mat_t5 = jnp.bfloat16 if precision == BF16IO else jnp.float32
        ur_np, ui_np = _radix_mats(block_h)
        ur_m = jnp.asarray(ur_np, mat_t5)
        ui_m = jnp.asarray(ui_np, mat_t5)
        epr_np, epi_np, oqr_np, oqi_np = _dif_w_mats(block_w, kw, vw)
        epr_m = jnp.asarray(epr_np, mat_t5)
        epi_m = jnp.asarray(epi_np, mat_t5)
        oqr_m = jnp.asarray(oqr_np, mat_t5)
        oqi_m = jnp.asarray(oqi_np, mat_t5)
        tn = epr_np.shape[1]
        m_h = block_h // 2
        wc2 = 2 * l4
        grid = (b, gbh, gbw, n)
        spec_d = pl.BlockSpec(
            (1, mbh, mbw, f, lh, wc2),
            lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_dsl = pl.BlockSpec(
            (1, mbh, mbw, f, lh, 1),
            lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_k5 = pl.BlockSpec(
            (1, f, lh, wc2),
            lambda bi, gh, gw, ni: (ni, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_ksl = pl.BlockSpec(
            (1, f, lh, 1),
            lambda bi, gh, gw, ni: (ni, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_c2 = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda bi, gh, gw, ni: (0, 0), memory_space=pltpu.VMEM
        )
        out_spec5 = pl.BlockSpec(
            (1, 1, mbh * vh, mbw * vw),
            lambda bi, gh, gw, ni: (bi, ni, gh, gw),
            memory_space=pltpu.VMEM,
        )
        rows = mbh * vh
        if xsliver:
            spec_slv = pl.BlockSpec(
                (1, 1, 1, 1, mbw, rows),
                lambda bi, gh, gw, ni: (bi, ni, gh, gw, 0, 0),
                memory_space=pltpu.VMEM,
            )
            spec_par = pl.BlockSpec(
                (1, tn), lambda bi, gh, gw, ni: (0, 0),
                memory_space=pltpu.VMEM,
            )
            kern = _make_kernel_v5x(
                mbh, mbw, f, vh, vw, lh, lh - vh, block_w, kw, precision,
                karatsuba
            )
            scratch = [
                pltpu.VMEM((rows, wc2), jnp.float32),  # xr
                pltpu.VMEM((rows, wc2), jnp.float32),  # xi
            ]
            in_specs = [
                spec_d, spec_d, spec_k5, spec_k5,
                spec_c2((m_h, m_h)), spec_c2((m_h, m_h)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_slv, spec_par,
            ]
            operands = (dr, di, kr, ki, ur_m, ui_m, epr_m, epi_m,
                        oqr_m, oqi_m, slv, par)
        else:
            kern = _make_kernel_v5(
                mbh, mbw, f, vh, vw, lh, lh - vh, block_w, kw, precision,
                karatsuba
            )
            scratch = [
                pltpu.VMEM((rows, wc2), jnp.float32),  # xr
                pltpu.VMEM((rows, wc2), jnp.float32),  # xi
                pltpu.VMEM((rows, _SLIVER_LANES), jnp.float32),  # slr
            ]
            in_specs = [
                spec_d, spec_d, spec_k5, spec_k5,
                spec_c2((m_h, m_h)), spec_c2((m_h, m_h)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_dsl, spec_dsl, spec_ksl, spec_ksl,
            ]
            operands = (dr, di, kr, ki, ur_m, ui_m, epr_m, epi_m,
                        oqr_m, oqi_m, dslr, dsli, kslr, ksli)
        flops = (
            8 * f * lh * wc2  # MAC
            + 16 * m_h * m_h * wc2 + 8 * m_h * wc2  # H radix
            + 8 * vh * l4 * tn + 16 * vh * tn  # W DIF (4 dots + combine)
        )
        return pl.pallas_call(
            kern,
            grid=grid,
            scratch_shapes=scratch,
            in_specs=in_specs,
            out_specs=out_spec5,
            out_shape=jax.ShapeDtypeStruct(
                (b, n, out_h, out_w), out_dt
            ),
            cost_estimate=pl.CostEstimate(
                flops=b * nbh * nbw * n * flops,
                bytes_accessed=(
                    2 * dr.dtype.itemsize * f * lh * wc2 * (b * nbh * nbw)
                    + 2 * dr.dtype.itemsize * f * lh * wc2
                    * (b * gbh * gbw * n)
                    + out_dt.itemsize * b * n * out_h * out_w
                ),
                transcendentals=4 * (m_h + l4),
            ),
            interpret=interpret,
        )(*operands)

    mat_t = jnp.bfloat16 if precision == BF16IO else jnp.float32
    if radix_h:
        ur_np, ui_np = _radix_mats(block_h)
        gr, gi = jnp.asarray(ur_np, mat_t), jnp.asarray(ui_np, mat_t)
        h_mat_shape = (block_h // 2, block_h // 2)
    else:
        gr_np, gi_np = _inv_full_mats(block_h)
        gr = jnp.asarray(gr_np[kh - 1 : kh - 1 + vh], mat_t)  # (Vh, Lh)
        gi = jnp.asarray(gi_np[kh - 1 : kh - 1 + vh], mat_t)
        h_mat_shape = (vh, lh)
    mr_np, mi_np = _inv_packed_mats(block_w)
    mr = jnp.asarray(mr_np[:, kw - 1 : kw - 1 + vw], mat_t)  # (Wc, Vw)
    mi = jnp.asarray(mi_np[:, kw - 1 : kw - 1 + vw], mat_t)

    # n innermost → the data block group stays VMEM-resident across the
    # whole bank; K is re-fetched once per (group, kernel) — the group
    # amortizes it over MBH·MBW blocks. (D block index units are multiples
    # of the block shape, so index gh/gw cover block rows/cols
    # [g·MB, (g+1)·MB).)
    grid = (b, gbh, gbw, n)
    spec_k = pl.BlockSpec(
        (1, f, lh, wc),
        lambda bi, gh, gw, ni: (ni, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    spec_const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, gh, gw, ni: (0, 0), memory_space=pltpu.VMEM
    )
    # Output tile (MBH·Vh, MBW·Vw) lands at block-aligned offsets; edge
    # tiles extend past (out_h, out_w) and Pallas clips the writes.
    out_spec = pl.BlockSpec(
        (1, 1, mbh * vh, mbw * vw),
        lambda bi, gh, gw, ni: (bi, ni, gh, gw),
        memory_space=pltpu.VMEM,
    )

    if radix_h:
        kern = _make_kernel_v4(
            mbh, mbw, f, vh, vw, wc, lh, lh - vh, precision, karatsuba
        )
        scratch = [
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
        ]
    elif wstack:
        kern = _make_kernel_v3(
            mbh, mbw, f, vh, vw, wc, precision, karatsuba
        )
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
                (1, mbh, mbw, f, lh, wc),
                lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, mbh, mbw, f, lh, wc),
                lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((b, n, out_h, out_w), out_dt),
        cost_estimate=pl.CostEstimate(
            flops=b * nbh * nbw * n * (flops_mac + flops_h + flops_w),
            bytes_accessed=(
                2 * dr.dtype.itemsize * f * lh * wc * (b * nbh * nbw)
                + 2 * dr.dtype.itemsize * f * lh * wc * (b * gbh * gbw * n)
                + out_dt.itemsize * b * n * out_h * out_w
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki, gr, gi, mr, mi)
    return out


def radix_w_legal(block_w: int, kw: int, vw: int) -> bool:
    """Whether the v5 radix-2 DIF W-stage applies: the even/odd bin split
    pairs lane blocks of block_w//4 entries, so lane slices stay
    128-aligned only when block_w is a multiple of 512; the halves-split
    store boundary s1 = W/2−(kw−1) must land on a lane-tile edge (or past
    the window) and the window start must sit in the first half; and the
    4·(W/4)·min(vw, W/2) DIF MACs must undercut the dense windowed
    2·pad128(Wc)·vw (no profit at narrow windows — fall back to v4)."""
    l2 = block_w // 2
    t0 = kw - 1
    s1 = l2 - t0
    return (
        block_w % 512 == 0
        and vw >= 1
        and 0 < s1
        and (s1 % 128 == 0 or s1 >= vw)
        and block_w * min(vw, l2) < 2 * _pad128(l2 + 1) * vw
    )


@functools.lru_cache(maxsize=32)
def _dif_w_mats(block_w: int, kw: int, vw: int) -> tuple:
    """Half-length synthesis matrices for the v5 DIF W stage.

    The radix-2 halves split of the length-W packed-real inverse: with
    t' = t mod W/2 and P/Q the even/odd spectral-bin syntheses,
        P[t'] = Σ_u w_{2u}/W (Sr[2u] cos(2πut'/(W/2)) − Si[2u] sin(·))
              = 0.5 · packed-synth_{W/2}(S[0::2])[t']     (+ Nyquist sliver)
        Q[t'] = (2/W) Σ_v (Sr[2v+1] cos θ − Si[2v+1] sin θ),
                θ = 2π(2v+1)t'/W
        x[t'] = P[t'] + Q[t'],   x[t' + W/2] = P[t'] − Q[t']
    Both matrix pairs are (W/4, Tn) with Tn = min(vw, W/2) — the output
    halves REUSE the same t'-columns, so the W-stage contraction is W/4
    at ≤ W/2 columns vs the dense windowed pad128(Wc)×vw: ≥2× fewer MACs
    whenever vw > W/2·(pad-ratio). The m = W/2 Nyquist row is excluded
    (a VPU (−1)^t rank-1 update from the 1-lane sliver); normalizations
    are folded (×0.5 on the 1/(W/2) packed mats; 2/W on the odd bins —
    odd m never hits the w=1 endpoints since W ≡ 0 mod 4)."""
    import numpy as np

    l2, l4 = block_w // 2, block_w // 4
    t0 = kw - 1
    tn = min(vw, l2)
    tcols = (t0 + np.arange(tn)) % l2
    mr, mi = _inv_packed_mats(l2)  # (L4+1, L2), 1/(L2) + weights folded
    epr = 0.5 * mr[:l4, tcols].astype(np.float64)
    epi = 0.5 * mi[:l4, tcols].astype(np.float64)
    v = np.arange(l4)[:, None].astype(np.float64)
    th = 2.0 * np.pi * (2.0 * v + 1.0) * tcols[None, :] / block_w
    oqr = (2.0 / block_w) * np.cos(th)
    oqi = (-2.0 / block_w) * np.sin(th)
    return (
        epr.astype(np.float32), epi.astype(np.float32),
        oqr.astype(np.float32), oqi.astype(np.float32),
    )


@functools.lru_cache(maxsize=32)
def _sliver_h_mats(lh: int, vh: int) -> tuple:
    """Windowed H-synthesis matrices for the XLA-side Nyquist sliver
    (v5x): rows are the v4 window's output times t = w0..lh−1
    (w0 = lh − vh), columns the EVEN-THEN-ODD permuted H bins (the planes
    arrive H-permuted for the radix stage; folding the permutation into
    the matrix columns avoids un-permuting the spectra). 1/lh inverse
    normalization folded."""
    import numpy as np

    w0 = lh - vh
    u = np.concatenate(
        [np.arange(0, lh, 2), np.arange(1, lh, 2)]
    ).astype(np.float64)
    t = (w0 + np.arange(vh)).astype(np.float64)[:, None]
    ph = 2.0 * np.pi * t * u[None, :] / lh
    return (
        (np.cos(ph) / lh).astype(np.float32),
        (np.sin(ph) / lh).astype(np.float32),
    )


@functools.lru_cache(maxsize=32)
def _sliver_parity_row(block_w: int, kw: int, vw: int):
    """(1, Tn) Nyquist parity row for the v5x rank-1 sliver update:
    par[k] = (−1)^{t0+k} / W over the shared t'-columns (the same
    coefficients the v5 kernel builds from an in-kernel iota)."""
    import numpy as np

    l2 = block_w // 2
    t0 = kw - 1
    tn = min(vw, l2)
    k = np.arange(tn)
    return (
        np.where((k + t0) % 2 == 0, 1.0, -1.0) / block_w
    ).astype(np.float32)[None, :]


def _xsliver_operands(dr, di, kr, ki, block_h, block_w, kw, vh, vw,
                      mbh, mbw, gbh, gbw):
    """XLA-side Nyquist-sliver synthesis for the v5x kernels.

    The v5 kernel's in-kernel sliver path (1-lane HBM operands per
    (group, kernel), an F-unrolled VPU MAC, per-block (M, M) VPU matvecs,
    (vh, 128) broadcast stores and a VPU rank-1 update) measured as the
    tier-constant cost that made the DIF stage LOSE at bf16io and F ≥ 2
    (PERF.md rounds 4b/4e). The whole sliver pipeline is linear, so v5x
    computes the windowed sliver columns for every (batch, kernel, block)
    OUTSIDE the kernel — two tiny einsums over the Nyquist lanes — and
    hands the kernel one aligned (B, N, gbh, gbw, MBW, MBH·Vh) operand it
    applies as a single rank-1 MXU dot per column group.

    Called on the H-PERMUTED (pre-W-permute) planes; returns (slv, par)
    f32. Inputs padded to the group grid produce zero slivers for the pad
    blocks (zero spectra), matching the main planes."""
    wc_full = block_w // 2 + 1
    f32 = jnp.float32
    # HIGHEST throughout: these contractions are ~0.1% of the kernel's
    # flops but at XLA's DEFAULT (single-pass bf16) the sliver values lose
    # ~1e-3 — measured 6.3e-5 total rel err on-chip, over the fp32 1e-5 bar
    hi = jax.lax.Precision.HIGHEST
    es = functools.partial(jnp.einsum, precision=hi)
    dnr = dr[..., wc_full - 1].astype(f32)  # (B, nbh', nbw', F, Lh)
    dni = di[..., wc_full - 1].astype(f32)
    knr = kr[..., wc_full - 1].astype(f32)  # (N, F, Lh)
    kni = ki[..., wc_full - 1].astype(f32)
    pr = es("bhwfu,nfu->bnhwu", dnr, knr) - es(
        "bhwfu,nfu->bnhwu", dni, kni
    )
    pi = es("bhwfu,nfu->bnhwu", dnr, kni) + es(
        "bhwfu,nfu->bnhwu", dni, knr
    )
    cn_np, sn_np = _sliver_h_mats(block_h, vh)
    sl = es("...u,ru->...r", pr, jnp.asarray(cn_np)) - es(
        "...u,ru->...r", pi, jnp.asarray(sn_np)
    )
    b, n = sl.shape[0], sl.shape[1]
    sl = sl.reshape(b, n, gbh, mbh, gbw, mbw, vh)
    sl = jnp.transpose(sl, (0, 1, 2, 4, 5, 3, 6)).reshape(
        b, n, gbh, gbw, mbw, mbh * vh
    )
    par = jnp.asarray(_sliver_parity_row(block_w, kw, vw))
    return sl, par


def _make_kernel_v5x(mbh: int, mbw: int, f: int, vh: int, vw: int,
                     lh: int, w0: int, block_w: int, kw: int, precision,
                     karatsuba):
    """v5x: the v5 DIF W-stage kernel with the Nyquist sliver hoisted to
    XLA (see :func:`_xsliver_operands`). In-kernel the sliver is ONE
    rank-1 MXU dot per column group — (1, R) windowed sliver values ×
    (1, Tn) parity row — replacing v5's per-block VPU matvec/broadcast
    machinery and its 1-lane sliver operands. The main MAC / H radix /
    DIF W dots and the contiguous P±Q segment stores are identical to
    :func:`_make_kernel_v5`."""
    m = lh // 2
    c1 = m - w0
    l4 = block_w // 4
    l2 = block_w // 2
    wc2 = 2 * l4
    t0 = kw - 1
    s1 = l2 - t0
    if s1 >= vw:
        segs = [(0, vw, 0, 1.0)]
    else:
        segs = [(0, s1, 0, 1.0), (s1, min(vw, l2), s1, -1.0)]
        if vw > l2:
            segs.append((l2, vw, 0, -1.0))
    segs = [s for s in segs if s[1] > s[0]]

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, epr_ref,
                epi_ref, oqr_ref, oqi_ref, slv_ref, par_ref, out_ref,
                xr_ref, xi_ref):
        kr = kr_ref[0].astype(jnp.float32)  # (F, 2M, Wc2) H+W permuted
        ki = ki_ref[0].astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]  # (M, M) H sub-transforms
        epr, epi = epr_ref[...], epi_ref[...]  # (L4, Tn) even-bin synth
        oqr, oqi = oqr_ref[...], oqi_ref[...]  # (L4, Tn) odd-bin synth
        dot = _make_dot(precision)
        dot0 = _make_dot_t0(precision)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)

        def csub(sr, si):  # (M, M) @ (M, N) complex
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, 2M, Wc2)
                di = di_ref[0, i, j].astype(jnp.float32)
                s_r = jnp.sum(kr * dr - ki * di, axis=0)  # (2M, Wc2)
                s_i = jnp.sum(kr * di + ki * dr, axis=0)
                e_r, e_i = csub(s_r[:m], s_i[:m])
                o_r, o_i = csub(s_r[m:], s_i[m:])
                t_r = twr * o_r - twi * o_i
                t_i = twr * o_i + twi * o_r
                xr_ref[i * vh:i * vh + c1, :] = (e_r + t_r)[w0:, :]
                xi_ref[i * vh:i * vh + c1, :] = (e_i + t_i)[w0:, :]
                xr_ref[i * vh + c1:(i + 1) * vh, :] = (e_r - t_r)[: vh - c1, :]
                xi_ref[i * vh + c1:(i + 1) * vh, :] = (e_i - t_i)[: vh - c1, :]
            # ---- W radix-2 DIF + rank-1 sliver (MXU) ----
            p_r = (
                dot(xr_ref[:, :l4], epr) + dot(xi_ref[:, :l4], epi)
            )  # (R, Tn) even-bin half synthesis
            q_r = (
                dot(xr_ref[:, l4:wc2], oqr) + dot(xi_ref[:, l4:wc2], oqi)
            )  # (R, Tn) odd-bin twiddled synthesis
            p_r = p_r + dot0(
                slv_ref[0, 0, 0, 0, j : j + 1, :], par_ref[...]
            )
            for d0, d1, k0, sg in segs:
                seg = (
                    p_r[:, k0:k0 + (d1 - d0)] + q_r[:, k0:k0 + (d1 - d0)]
                    if sg > 0
                    else p_r[:, k0:k0 + (d1 - d0)]
                    - q_r[:, k0:k0 + (d1 - d0)]
                )
                out_ref[0, 0, :, j * vw + d0:j * vw + d1] = seg.astype(
                    out_ref.dtype
                )

    return _kernel


def _make_kernel_v5(mbh: int, mbw: int, f: int, vh: int, vw: int,
                    lh: int, w0: int, block_w: int, kw: int, precision,
                    karatsuba):
    """v5: the v4 radix-2 H stage + a radix-2 DIF (halves-split) W stage.

    Operand layout (prepared by block_conv_pallas): spectra lanes are
    W-PERMUTED to [even bins 0,2,..,W/2−2 | odd bins 1,3,..,W/2−1]
    (L4 = block_w//4 lanes each), so the even/odd bin groups are plain
    ALIGNED lane-block slices — no in-kernel shuffle. The Nyquist entry
    m = W/2 rides separately as a 1-lane SLIVER (extra operands),
    synthesized through the H stage by VPU matvecs; only its REAL part
    matters (sin(πt) = 0 at Nyquist), applied as a rank-1 (−1)^t update.

    With P = half-length packed synthesis of the even bins (+ sliver) and
    Q = the twiddle-folded synthesis of the odd bins,
        x[t'] = P[t'] + Q[t'],   x[t' + W/2] = P[t'] − Q[t']
    — both OUTPUT halves reuse the same Tn = min(vw, W/2) t'-columns, so
    the W stage is 4 (R, L4) @ (L4, Tn) dots + slice combines: per-pixel
    MACs drop from 2·pad128(Wc) to ≤ W (vw ≤ W/2) or W/2·(W/vw) amortized
    (vw > W/2), and every store is a CONTIGUOUS lane slice (the earlier
    output-parity DIT split needed an even/odd lane interleave Mosaic
    cannot lower)."""
    m = lh // 2
    c1 = m - w0  # v4 H window chunk split
    l4 = block_w // 4  # even/odd bin block length (lanes per group)
    l2 = block_w // 2
    wc2 = 2 * l4  # permuted lane count (= block_w // 2)
    t0 = kw - 1  # window start (first valid output column)
    s1 = l2 - t0  # columns of the window inside the first half-period
    tn = min(vw, l2)
    # static output-store segments: (dst_lo, dst_hi, src_lo, sign). Window
    # column c holds x[t0 + c]: first-half columns (c < s1) take P + Q at
    # t'-column k = c; second-half columns take P − Q at k = c mod L2
    # (legality pins s1 to a lane-tile edge when the window spans halves).
    if s1 >= vw:
        segs = [(0, vw, 0, 1.0)]
    else:
        segs = [(0, s1, 0, 1.0), (s1, min(vw, l2), s1, -1.0)]
        if vw > l2:
            segs.append((l2, vw, 0, -1.0))
    segs = [s for s in segs if s[1] > s[0]]  # kw=1 → empty middle segment

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, epr_ref,
                epi_ref, oqr_ref, oqi_ref, dslr_ref, dsli_ref, kslr_ref,
                ksli_ref, out_ref, xr_ref, xi_ref, slr_ref):
        kr = kr_ref[0].astype(jnp.float32)  # (F, 2M, Wc2) H+W permuted
        ki = ki_ref[0].astype(jnp.float32)
        # load-then-reshape: integer indexing of a loaded >2D value
        # lowers to an unsupported gather in Mosaic; the squeeze of the
        # 1-lane axis must be a reshape
        kslr = kslr_ref[0].reshape(f, lh).astype(jnp.float32)  # (F, 2M)
        ksli = ksli_ref[0].reshape(f, lh).astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]  # (M, M) H sub-transforms
        epr, epi = epr_ref[...], epi_ref[...]  # (L4, Tn) even-bin synth
        oqr, oqi = oqr_ref[...], oqi_ref[...]  # (L4, Tn) odd-bin synth
        dot = _make_dot(precision)
        # H twiddle (v4)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)
        # Nyquist rank-1 term: (1/W)·Sr[W/2]·(−1)^{t'} over the shared
        # t'-columns t' ≡ t0 + k (mod L2); L2 even → (−1)^{t'} = (−1)^{t0+k}
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
        parity = jnp.where(
            (k_col + t0) % 2 == 0, 1.0, -1.0
        ).astype(jnp.float32) / block_w

        def csub(sr, si):  # (M, M) @ (M, N) complex
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        def matvec(mat_r, mat_i, v_r, v_i):
            # (M, M) complex sub-transform applied to an (2M? → M,)-lane
            # VECTOR via lane-broadcast + lane reduction (VPU): U @ v.
            # v arrives as (1, M) rows; returns (M, 1) pairs.
            rr = jnp.sum(mat_r * v_r, axis=1, keepdims=True) - jnp.sum(
                mat_i * v_i, axis=1, keepdims=True
            )
            ii = jnp.sum(mat_r * v_i, axis=1, keepdims=True) + jnp.sum(
                mat_i * v_r, axis=1, keepdims=True
            )
            return rr, ii

        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, 2M, Wc2)
                di = di_ref[0, i, j].astype(jnp.float32)
                s_r = jnp.sum(kr * dr - ki * di, axis=0)  # (2M, Wc2)
                s_i = jnp.sum(kr * di + ki * dr, axis=0)
                # main-plane H radix (v4)
                e_r, e_i = csub(s_r[:m], s_i[:m])
                o_r, o_i = csub(s_r[m:], s_i[m:])
                t_r = twr * o_r - twi * o_i
                t_i = twr * o_i + twi * o_r
                xr_ref[i * vh:i * vh + c1, :] = (e_r + t_r)[w0:, :]
                xi_ref[i * vh:i * vh + c1, :] = (e_i + t_i)[w0:, :]
                xr_ref[i * vh + c1:(i + 1) * vh, :] = (e_r - t_r)[: vh - c1, :]
                xi_ref[i * vh + c1:(i + 1) * vh, :] = (e_i - t_i)[: vh - c1, :]
                # Nyquist-sliver MAC + H radix via VPU matvecs; only the
                # REAL part of the synthesized row value survives (the
                # Nyquist basis is cos(πt), sin ≡ 0)
                dslr = dslr_ref[0, i, j].reshape(f, lh).astype(jnp.float32)
                dsli = dsli_ref[0, i, j].reshape(f, lh).astype(jnp.float32)
                # keep everything 2-D: 1-D values force gather/reshape
                # paths Mosaic does not lower; the F-channel sum unrolls
                # as (1, 2M)-slice adds — a rank-2 multi_reduction over
                # axis 0 hits Mosaic's "unsupported output implicit
                # dimension" at F ≥ 2 (the rank-3 main-plane reduce is
                # fine)
                pslr = kslr[0:1] * dslr[0:1] - ksli[0:1] * dsli[0:1]
                psli = kslr[0:1] * dsli[0:1] + ksli[0:1] * dslr[0:1]
                for c in range(1, f):
                    cs = slice(c, c + 1)
                    pslr = pslr + (
                        kslr[cs] * dslr[cs] - ksli[cs] * dsli[cs]
                    )  # (1, 2M)
                    psli = psli + (
                        kslr[cs] * dsli[cs] + ksli[cs] * dslr[cs]
                    )
                pse_r, pse_i = pslr[:, :m], psli[:, :m]  # (1, M)
                pso_r, pso_i = pslr[:, m:], psli[:, m:]
                se_r, se_i = matvec(ur, ui, pse_r, pse_i)  # (M, 1)
                so_r, so_i = matvec(ur, ui, pso_r, pso_i)
                st_r = twr * so_r - twi * so_i
                slr_ref[i * vh:i * vh + c1, :] = jnp.broadcast_to(
                    (se_r + st_r)[w0:, :], (c1, _SLIVER_LANES)
                )
                slr_ref[i * vh + c1:(i + 1) * vh, :] = jnp.broadcast_to(
                    (se_r - st_r)[: vh - c1, :], (vh - c1, _SLIVER_LANES)
                )
            # ---- W radix-2 DIF (halves split) ----
            p_r = (
                dot(xr_ref[:, :l4], epr) + dot(xi_ref[:, :l4], epi)
            )  # (R, Tn) even-bin half synthesis
            q_r = (
                dot(xr_ref[:, l4:wc2], oqr) + dot(xi_ref[:, l4:wc2], oqi)
            )  # (R, Tn) odd-bin twiddled synthesis
            sl_r = slr_ref[:, 0:1]  # (R, 1) H-synthesized Nyquist sliver
            p_r = p_r + sl_r * parity
            for d0, d1, k0, sg in segs:
                seg = (
                    p_r[:, k0:k0 + (d1 - d0)] + q_r[:, k0:k0 + (d1 - d0)]
                    if sg > 0
                    else p_r[:, k0:k0 + (d1 - d0)]
                    - q_r[:, k0:k0 + (d1 - d0)]
                )
                out_ref[0, 0, :, j * vw + d0:j * vw + d1] = seg.astype(
                    out_ref.dtype
                )

    return _kernel


_SLIVER_LANES = 128  # sliver scratch lane width (min VMEM tile)


def _peaks_reducer(mbh: int, mbw: int, vh: int, vw: int, out_h: int,
                   out_w: int):
    """Shared (max, argmax) tile-reduction epilogue for the peaks kernels.

    Out-of-window positions (edge tiles extending past out_h/out_w) are
    masked by ADDING broadcast −inf row/column masks — two elementwise
    passes vs the compare+and+select form's four — and the global flat
    index y·out_w + x is built ONCE per cell (column group j shifts it by
    the scalar j·vw instead of re-deriving a fresh 2-D iota). Tie-break is
    first occurrence (min flat index), identical to argmaxing the maps."""
    rows = mbh * vh

    def setup(gh, gw):
        row_i = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + gh * rows
        )
        col_i0 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, vw), 1)
            + gw * (mbw * vw)
        )
        rm = jnp.where(row_i < out_h, 0.0, -jnp.inf).astype(jnp.float32)
        flat0 = row_i * out_w + col_i0  # (rows, vw) global flat indices
        return col_i0, rm, flat0

    def reduce_tile(state, tile, j, best):
        col_i0, rm, flat0 = state
        cm = jnp.where(
            col_i0 + j * vw < out_w, 0.0, -jnp.inf
        ).astype(jnp.float32)
        t = tile + rm + cm
        v = jnp.max(t)
        cand = jnp.min(
            jnp.where(t >= v, flat0 + j * vw, jnp.int32(2147483647))
        )
        if best is None:
            return v, cand
        bv, bi = best
        return jnp.maximum(v, bv), jnp.where(v > bv, cand, bi)

    return setup, reduce_tile


def _make_kernel_v5_peaks(mbh: int, mbw: int, f: int, vh: int, vw: int,
                          lh: int, w0: int, block_w: int, kw: int,
                          out_h: int, out_w: int, precision, karatsuba):
    """Peaks variant of the v5 kernel: the radix-2 DIF W stage's P+Q /
    P−Q output segments are reduced PER SEGMENT against column-sliced
    −inf masks instead of being stored — the maps tile never exists even
    in VMEM (same merge semantics as the per-j tile merge in
    :func:`_peaks_reducer`). Operand layout identical to
    :func:`_make_kernel_v5` (W-permuted even|odd lanes + Nyquist sliver);
    interpret-mode parity pinned in perf/proto_v5_peaks.py and
    tests/test_detect.py."""
    m = lh // 2
    c1 = m - w0
    l4 = block_w // 4
    l2 = block_w // 2
    wc2 = 2 * l4
    t0 = kw - 1
    s1 = l2 - t0
    tn = min(vw, l2)
    if s1 >= vw:
        segs = [(0, vw, 0, 1.0)]
    else:
        segs = [(0, s1, 0, 1.0), (s1, min(vw, l2), s1, -1.0)]
        if vw > l2:
            segs.append((l2, vw, 0, -1.0))
    segs = [s for s in segs if s[1] > s[0]]
    setup, _ = _peaks_reducer(mbh, mbw, vh, vw, out_h, out_w)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, epr_ref,
                epi_ref, oqr_ref, oqi_ref, dslr_ref, dsli_ref, kslr_ref,
                ksli_ref, val_ref, idx_ref, xr_ref, xi_ref, slr_ref):
        gh = pl.program_id(1)
        gw = pl.program_id(2)
        kr = kr_ref[0].astype(jnp.float32)  # (F, 2M, Wc2) H+W permuted
        ki = ki_ref[0].astype(jnp.float32)
        kslr = kslr_ref[0].reshape(f, lh).astype(jnp.float32)  # (F, 2M)
        ksli = ksli_ref[0].reshape(f, lh).astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]
        epr, epi = epr_ref[...], epi_ref[...]
        oqr, oqi = oqr_ref[...], oqi_ref[...]
        dot = _make_dot(precision)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
        parity = jnp.where(
            (k_col + t0) % 2 == 0, 1.0, -1.0
        ).astype(jnp.float32) / block_w
        col_i0, rm, flat0 = setup(gh, gw)
        best = None

        def csub(sr, si):  # (M, M) @ (M, N) complex
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        def matvec(mat_r, mat_i, v_r, v_i):
            rr = jnp.sum(mat_r * v_r, axis=1, keepdims=True) - jnp.sum(
                mat_i * v_i, axis=1, keepdims=True
            )
            ii = jnp.sum(mat_r * v_i, axis=1, keepdims=True) + jnp.sum(
                mat_i * v_r, axis=1, keepdims=True
            )
            return rr, ii

        for j in range(mbw):
            for i in range(mbh):
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, 2M, Wc2)
                di = di_ref[0, i, j].astype(jnp.float32)
                s_r = jnp.sum(kr * dr - ki * di, axis=0)
                s_i = jnp.sum(kr * di + ki * dr, axis=0)
                e_r, e_i = csub(s_r[:m], s_i[:m])
                o_r, o_i = csub(s_r[m:], s_i[m:])
                t_r = twr * o_r - twi * o_i
                t_i = twr * o_i + twi * o_r
                xr_ref[i * vh:i * vh + c1, :] = (e_r + t_r)[w0:, :]
                xi_ref[i * vh:i * vh + c1, :] = (e_i + t_i)[w0:, :]
                xr_ref[i * vh + c1:(i + 1) * vh, :] = (e_r - t_r)[: vh - c1, :]
                xi_ref[i * vh + c1:(i + 1) * vh, :] = (e_i - t_i)[: vh - c1, :]
                # Nyquist-sliver MAC + H radix (see _make_kernel_v5: the
                # F-channel sum must unroll as (1, 2M)-slice adds)
                dslr = dslr_ref[0, i, j].reshape(f, lh).astype(jnp.float32)
                dsli = dsli_ref[0, i, j].reshape(f, lh).astype(jnp.float32)
                pslr = kslr[0:1] * dslr[0:1] - ksli[0:1] * dsli[0:1]
                psli = kslr[0:1] * dsli[0:1] + ksli[0:1] * dslr[0:1]
                for c in range(1, f):
                    cs = slice(c, c + 1)
                    pslr = pslr + (
                        kslr[cs] * dslr[cs] - ksli[cs] * dsli[cs]
                    )
                    psli = psli + (
                        kslr[cs] * dsli[cs] + ksli[cs] * dslr[cs]
                    )
                pse_r, pse_i = pslr[:, :m], psli[:, :m]
                pso_r, pso_i = pslr[:, m:], psli[:, m:]
                se_r, se_i = matvec(ur, ui, pse_r, pse_i)
                so_r, so_i = matvec(ur, ui, pso_r, pso_i)
                st_r = twr * so_r - twi * so_i
                slr_ref[i * vh:i * vh + c1, :] = jnp.broadcast_to(
                    (se_r + st_r)[w0:, :], (c1, _SLIVER_LANES)
                )
                slr_ref[i * vh + c1:(i + 1) * vh, :] = jnp.broadcast_to(
                    (se_r - st_r)[: vh - c1, :], (vh - c1, _SLIVER_LANES)
                )
            # ---- W radix-2 DIF + per-segment (max, argmax) ----
            p_r = dot(xr_ref[:, :l4], epr) + dot(xi_ref[:, :l4], epi)
            q_r = (
                dot(xr_ref[:, l4:wc2], oqr) + dot(xi_ref[:, l4:wc2], oqi)
            )
            sl_r = slr_ref[:, 0:1]
            p_r = p_r + sl_r * parity
            for d0, d1, k0, sg in segs:
                seg = (
                    p_r[:, k0:k0 + (d1 - d0)] + q_r[:, k0:k0 + (d1 - d0)]
                    if sg > 0
                    else p_r[:, k0:k0 + (d1 - d0)]
                    - q_r[:, k0:k0 + (d1 - d0)]
                )
                cols = col_i0[:, d0:d1] + j * vw
                cm = jnp.where(cols < out_w, 0.0, -jnp.inf).astype(
                    jnp.float32
                )
                t = seg + rm + cm
                v = jnp.max(t)
                cand = jnp.min(
                    jnp.where(
                        t >= v,
                        flat0[:, d0:d1] + j * vw,
                        jnp.int32(2147483647),
                    )
                )
                if best is None:
                    best = (v, cand)
                else:
                    bv, bi = best
                    best = (
                        jnp.maximum(v, bv), jnp.where(v > bv, cand, bi)
                    )
        val_ref[0, 0] = jnp.full((8, 128), best[0], jnp.float32)
        idx_ref[0, 0] = jnp.full((8, 128), best[1], jnp.int32)

    return _kernel


def _make_kernel_v5x_peaks(mbh: int, mbw: int, f: int, vh: int, vw: int,
                           lh: int, w0: int, block_w: int, kw: int,
                           out_h: int, out_w: int, precision, karatsuba):
    """Peaks variant of the v5x kernel: the rank-1 MXU sliver update of
    :func:`_make_kernel_v5x` with the per-segment (max, argmax) reduction
    epilogue of :func:`_make_kernel_v5_peaks`."""
    m = lh // 2
    c1 = m - w0
    l4 = block_w // 4
    l2 = block_w // 2
    wc2 = 2 * l4
    t0 = kw - 1
    s1 = l2 - t0
    if s1 >= vw:
        segs = [(0, vw, 0, 1.0)]
    else:
        segs = [(0, s1, 0, 1.0), (s1, min(vw, l2), s1, -1.0)]
        if vw > l2:
            segs.append((l2, vw, 0, -1.0))
    segs = [s for s in segs if s[1] > s[0]]
    setup, _ = _peaks_reducer(mbh, mbw, vh, vw, out_h, out_w)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, epr_ref,
                epi_ref, oqr_ref, oqi_ref, slv_ref, par_ref, val_ref,
                idx_ref, xr_ref, xi_ref):
        gh = pl.program_id(1)
        gw = pl.program_id(2)
        kr = kr_ref[0].astype(jnp.float32)
        ki = ki_ref[0].astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]
        epr, epi = epr_ref[...], epi_ref[...]
        oqr, oqi = oqr_ref[...], oqi_ref[...]
        dot = _make_dot(precision)
        dot0 = _make_dot_t0(precision)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)
        col_i0, rm, flat0 = setup(gh, gw)
        best = None

        def csub(sr, si):
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        for j in range(mbw):
            for i in range(mbh):
                dr = dr_ref[0, i, j].astype(jnp.float32)
                di = di_ref[0, i, j].astype(jnp.float32)
                s_r = jnp.sum(kr * dr - ki * di, axis=0)
                s_i = jnp.sum(kr * di + ki * dr, axis=0)
                e_r, e_i = csub(s_r[:m], s_i[:m])
                o_r, o_i = csub(s_r[m:], s_i[m:])
                t_r = twr * o_r - twi * o_i
                t_i = twr * o_i + twi * o_r
                xr_ref[i * vh:i * vh + c1, :] = (e_r + t_r)[w0:, :]
                xi_ref[i * vh:i * vh + c1, :] = (e_i + t_i)[w0:, :]
                xr_ref[i * vh + c1:(i + 1) * vh, :] = (e_r - t_r)[: vh - c1, :]
                xi_ref[i * vh + c1:(i + 1) * vh, :] = (e_i - t_i)[: vh - c1, :]
            # ---- W radix-2 DIF + rank-1 sliver + per-segment reduce ----
            p_r = dot(xr_ref[:, :l4], epr) + dot(xi_ref[:, :l4], epi)
            q_r = (
                dot(xr_ref[:, l4:wc2], oqr) + dot(xi_ref[:, l4:wc2], oqi)
            )
            p_r = p_r + dot0(
                slv_ref[0, 0, 0, 0, j : j + 1, :], par_ref[...]
            )
            for d0, d1, k0, sg in segs:
                seg = (
                    p_r[:, k0:k0 + (d1 - d0)] + q_r[:, k0:k0 + (d1 - d0)]
                    if sg > 0
                    else p_r[:, k0:k0 + (d1 - d0)]
                    - q_r[:, k0:k0 + (d1 - d0)]
                )
                cols = col_i0[:, d0:d1] + j * vw
                cm = jnp.where(cols < out_w, 0.0, -jnp.inf).astype(
                    jnp.float32
                )
                t = seg + rm + cm
                v = jnp.max(t)
                cand = jnp.min(
                    jnp.where(
                        t >= v,
                        flat0[:, d0:d1] + j * vw,
                        jnp.int32(2147483647),
                    )
                )
                if best is None:
                    best = (v, cand)
                else:
                    bv, bi = best
                    best = (
                        jnp.maximum(v, bv), jnp.where(v > bv, cand, bi)
                    )
        val_ref[0, 0] = jnp.full((8, 128), best[0], jnp.float32)
        idx_ref[0, 0] = jnp.full((8, 128), best[1], jnp.int32)

    return _kernel


def _make_kernel_v3_peaks(mbh: int, mbw: int, f: int, vh: int, vw: int,
                          wc: int, out_h: int, out_w: int, precision,
                          karatsuba):
    """Peaks variant of the v3 kernel: identical MAC + windowed inverse
    compute, but instead of writing the (MBH·Vh, MBW·Vw) output tile to
    HBM it reduces the tile IN VMEM to one (max, argmax) pair per
    (batch, kernel, cell) — the detection head (see _peaks_reducer)."""
    setup, reduce_tile = _peaks_reducer(mbh, mbw, vh, vw, out_h, out_w)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, gr_ref, gi_ref, mr_ref,
                mi_ref, val_ref, idx_ref, xr_ref, xi_ref):
        gh = pl.program_id(1)
        gw = pl.program_id(2)
        kr = kr_ref[0].astype(jnp.float32)  # (F, Lh, Wc)
        ki = ki_ref[0].astype(jnp.float32)
        gr, gi = gr_ref[...], gi_ref[...]  # (Vh, Lh)
        dot = _make_dot(precision)
        state = setup(gh, gw)
        best = None
        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows of the group
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, Lh, Wc)
                di = di_ref[0, i, j].astype(jnp.float32)
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
            tile = dot(xr_ref[...], mr_ref[...]) + dot(
                xi_ref[...], mi_ref[...]
            )  # (MBH·Vh, Vw)
            best = reduce_tile(state, tile, j, best)
        # Mosaic requires (8, 128)-divisible output blocks: each cell's
        # (max, argmax) pair is written as a broadcast (8, 128) tile and
        # the caller strides it back out ([..., ::8, ::128]) — the padded
        # pyramid is still ~3000× smaller than the maps it replaces.
        val_ref[0, 0] = jnp.full((8, 128), best[0], jnp.float32)
        idx_ref[0, 0] = jnp.full((8, 128), best[1], jnp.int32)

    return _kernel


def _make_kernel_v4_peaks(mbh: int, mbw: int, f: int, vh: int, vw: int,
                          wc: int, lh: int, w0: int, out_h: int, out_w: int,
                          precision, karatsuba):
    """Peaks variant of the v4 kernel: the radix-2 H stage (two (M, M)
    sub-transform dots + VPU twiddle combine, spectra H-rows pre-permuted
    even-then-odd) with the in-VMEM (max, argmax) reduction epilogue of
    :func:`_make_kernel_v3_peaks` — the detection head at the maps
    kernel's MXU bill (on-chip the v3-based peaks kernel measured SLOWER
    than the v4 maps it replaces: 43.7 vs 38.9 ms bf16io at the DPM plan,
    perf/r4_peaks_grad.py)."""
    m = lh // 2
    c1 = m - w0  # window rows below the period boundary
    setup, reduce_tile = _peaks_reducer(mbh, mbw, vh, vw, out_h, out_w)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, mr_ref,
                mi_ref, val_ref, idx_ref, xr_ref, xi_ref):
        gh = pl.program_id(1)
        gw = pl.program_id(2)
        kr = kr_ref[0].astype(jnp.float32)  # (F, 2M, Wc), even-then-odd
        ki = ki_ref[0].astype(jnp.float32)
        ur, ui = ur_ref[...], ui_ref[...]  # (M, M) sub-transforms
        dot = _make_dot(precision)
        u_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(
            jnp.float32
        )
        twr = jnp.cos(jnp.pi * u_row / m)
        twi = jnp.sin(jnp.pi * u_row / m)
        state = setup(gh, gw)
        best = None

        def csub(sr, si):  # complex (M,M)@(M,Wc) with U = ur + i·ui
            if karatsuba:
                t1 = dot(ur, sr)
                t2 = dot(ui, si)
                t3 = dot(ur + ui, sr + si)
                return t1 - t2, t3 - t1 - t2
            return (dot(ur, sr) - dot(ui, si),
                    dot(ur, si) + dot(ui, sr))

        for j in range(mbw):  # static unroll over W-columns of the group
            for i in range(mbh):  # static unroll over H-rows
                dr = dr_ref[0, i, j].astype(jnp.float32)  # (F, 2M, Wc)
                di = di_ref[0, i, j].astype(jnp.float32)
                s_r = jnp.sum(kr * dr - ki * di, axis=0)  # (2M, Wc)
                s_i = jnp.sum(kr * di + ki * dr, axis=0)
                er, ei = csub(s_r[:m], s_i[:m])
                orr, oi = csub(s_r[m:], s_i[m:])
                tr = twr * orr - twi * oi
                ti = twr * oi + twi * orr
                xr_ref[i * vh:i * vh + c1, :] = (er + tr)[w0:, :]
                xi_ref[i * vh:i * vh + c1, :] = (ei + ti)[w0:, :]
                xr_ref[i * vh + c1:(i + 1) * vh, :] = (er - tr)[: vh - c1, :]
                xi_ref[i * vh + c1:(i + 1) * vh, :] = (ei - ti)[: vh - c1, :]
            tile = dot(xr_ref[...], mr_ref[...]) + dot(
                xi_ref[...], mi_ref[...]
            )  # (MBH·Vh, Vw)
            best = reduce_tile(state, tile, j, best)
        val_ref[0, 0] = jnp.full((8, 128), best[0], jnp.float32)
        idx_ref[0, 0] = jnp.full((8, 128), best[1], jnp.int32)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "block_w", "kh", "kw", "out_h", "out_w",
                     "interpret", "precision", "karatsuba", "mbh", "mbw",
                     "radix_h", "radix_w", "xsliver"),
)
def block_conv_peaks_pallas(
    dr: jnp.ndarray,  # (B, nbh, nbw, F, Lh, Wc) f32 | bf16 (serving tier)
    di: jnp.ndarray,
    kr: jnp.ndarray,  # (N, F, Lh, Wc) — same dtype as the data spectra
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
    mbw: int | None = None,
    radix_h: bool | None = None,
    radix_w: bool = False,
    xsliver: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """→ per-cell block-max pyramid: ``(vals, idxs)`` of shape
    (B, N, gbh, gbw) — the max response and its GLOBAL flat position
    y·out_w + x inside each (MBH·Vh, MBW·Vw) output cell of the fused
    block-conv, computed WITHOUT ever writing the maps to HBM.

    This is the serving detection head: at the fused kernel's roofline the
    output maps are the dominant HBM traffic (~1.68 GB/call at the DPM
    config), but detection consumers want peaks, not maps (the reference's
    DPM/HOG use case validates by peak location,
    demoCudaConvolutionFFT.m:58-61) — the per-cell reduction cuts output
    bytes by vh·vw/2 (≈ 24576× at the (192, 384) plan). Reduce the pyramid
    with ``jnp.max``/argmax over the cell axes for exact per-kernel top-1
    (every cell max is exact), or `lax.top_k` over cells for approximate
    top-k (one candidate per cell region).

    Same operand/precision contract as :func:`block_conv_pallas`.
    ``radix_h=None`` auto-selects the v4-based kernel (radix-2 H stage)
    whenever ``radix_h_legal(block_h, vh)`` — the peaks epilogue replaces
    only the output stores, so the transform upgrade carries over.
    ``radix_w=True`` (requires ``radix_w_legal``) runs the v5 DIF W stage
    with a per-segment reduction epilogue — production dispatch enables it
    only for plans registered with ``register_radix_w_plan(head='peaks')``."""
    b, nbh, nbw, f, lh, wc = dr.shape
    n = kr.shape[0]
    vh, vw = block_h - kh + 1, block_w - kw + 1
    assert lh == block_h and wc == block_w // 2 + 1
    assert dr.dtype == kr.dtype, "data/kernel spectra dtype mismatch"
    tier_bf16 = dr.dtype == jnp.bfloat16
    if precision is None:
        from cuda_fft_convolution_tpu.ops.conv import _matmul_precision
        from cuda_fft_convolution_tpu.utils.config import get_config

        if tier_bf16:
            precision = BF16IO
        else:
            fp = get_config().fused_precision
            precision = BF16X3 if fp == BF16X3 else _matmul_precision()
    if interpret and precision == BF16X3:
        precision = jax.lax.Precision.HIGHEST  # see block_conv_pallas
    if karatsuba is None:
        karatsuba = True
    if mbh is None and mbw is None:
        hit = lookup_fused_group(
            lh, wc, vh, vw, f, 2 if tier_bf16 else 4
        )
        if hit is not None:
            mbh, mbw = min(hit[0], nbh), min(hit[1], nbw)
        else:
            mbh, mbw = _choose_group(nbh, nbw, f, lh, wc, vh, vw, True)
    mbh = min(mbh or 1, nbh)
    mbw = min(mbw or 1, nbw)
    gbh = -(-nbh // mbh)
    gbw = -(-nbw // mbw)
    if gbh * mbh != nbh or gbw * mbw != nbw:
        # padded blocks reduce over −inf-masked coords → never win a cell
        pad = ((0, 0), (0, gbh * mbh - nbh), (0, gbw * mbw - nbw),
               (0, 0), (0, 0), (0, 0))
        dr = jnp.pad(dr, pad)
        di = jnp.pad(di, pad)
    if radix_w:
        radix_h = True  # the v5 W stage builds on the v4 H stage
    if radix_h is None:
        # auto-v4 for f32 only: at the bf16 tier the v4-peaks kernel
        # measured LOSING to v3 (40.0 vs 32.0 ms at the (256,511) plan,
        # perf/r4b_peaks.py v5e 2026-08-19 — single-pass bf16 dots shrink
        # the H-stage share the radix split saves); f32 measured a tie
        # with a slight v4 edge (48.4 vs 48.8).
        radix_h = (not tier_bf16) and radix_h_legal(block_h, vh)
    if radix_h:
        assert radix_h_legal(block_h, vh), (
            "radix_h requires the v4 window/period alignment "
            f"(block_h={block_h}, vh={vh})"
        )
        # even/odd H-row permutation (the MAC commutes with it)
        perm = jnp.concatenate(
            [jnp.arange(0, lh, 2), jnp.arange(1, lh, 2)]
        )
        dr = jnp.take(dr, perm, axis=4)
        di = jnp.take(di, perm, axis=4)
        kr = jnp.take(kr, perm, axis=2)
        ki = jnp.take(ki, perm, axis=2)

    if radix_w:
        # v5-peaks: the same operand prep as block_conv_pallas's radix_w
        # branch (W-permuted even|odd lane groups + 1-lane Nyquist
        # sliver), with the per-segment (max, argmax) epilogue.
        assert radix_w_legal(block_w, kw, vw), (
            f"radix_w requires the v5 W alignment "
            f"(block_w={block_w}, kw={kw}, vw={vw})"
        )
        l4 = block_w // 4
        wc_full = block_w // 2 + 1
        if xsliver:
            slv, par = _xsliver_operands(
                dr, di, kr, ki, block_h, block_w, kw, vh, vw,
                mbh, mbw, gbh, gbw,
            )
        else:
            dslr, dsli = dr[..., wc_full - 1 :], di[..., wc_full - 1 :]
            kslr, ksli = kr[..., wc_full - 1 :], ki[..., wc_full - 1 :]
        perm_w = jnp.concatenate(
            [jnp.arange(0, 2 * l4, 2), jnp.arange(1, 2 * l4, 2)]
        )
        dr = jnp.take(dr, perm_w, axis=5)
        di = jnp.take(di, perm_w, axis=5)
        kr = jnp.take(kr, perm_w, axis=3)
        ki = jnp.take(ki, perm_w, axis=3)
        mat_t5 = jnp.bfloat16 if precision == BF16IO else jnp.float32
        ur_np, ui_np = _radix_mats(block_h)
        ur_m = jnp.asarray(ur_np, mat_t5)
        ui_m = jnp.asarray(ui_np, mat_t5)
        epr_np, epi_np, oqr_np, oqi_np = _dif_w_mats(block_w, kw, vw)
        epr_m = jnp.asarray(epr_np, mat_t5)
        epi_m = jnp.asarray(epi_np, mat_t5)
        oqr_m = jnp.asarray(oqr_np, mat_t5)
        oqi_m = jnp.asarray(oqi_np, mat_t5)
        tn = epr_np.shape[1]
        m_h = block_h // 2
        wc2 = 2 * l4
        grid = (b, gbh, gbw, n)
        spec_d = pl.BlockSpec(
            (1, mbh, mbw, f, lh, wc2),
            lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_dsl = pl.BlockSpec(
            (1, mbh, mbw, f, lh, 1),
            lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_k5 = pl.BlockSpec(
            (1, f, lh, wc2),
            lambda bi, gh, gw, ni: (ni, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_ksl = pl.BlockSpec(
            (1, f, lh, 1),
            lambda bi, gh, gw, ni: (ni, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_c2 = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda bi, gh, gw, ni: (0, 0), memory_space=pltpu.VMEM
        )
        cell_spec5 = pl.BlockSpec(
            (1, 1, 8, 128),
            lambda bi, gh, gw, ni: (bi, ni, gh, gw),
            memory_space=pltpu.VMEM,
        )
        rows = mbh * vh
        if xsliver:
            spec_slv = pl.BlockSpec(
                (1, 1, 1, 1, mbw, rows),
                lambda bi, gh, gw, ni: (bi, ni, gh, gw, 0, 0),
                memory_space=pltpu.VMEM,
            )
            spec_par = pl.BlockSpec(
                (1, tn), lambda bi, gh, gw, ni: (0, 0),
                memory_space=pltpu.VMEM,
            )
            kern = _make_kernel_v5x_peaks(
                mbh, mbw, f, vh, vw, lh, lh - vh, block_w, kw, out_h,
                out_w, precision, karatsuba,
            )
            scratch = [
                pltpu.VMEM((rows, wc2), jnp.float32),
                pltpu.VMEM((rows, wc2), jnp.float32),
            ]
            in_specs = [
                spec_d, spec_d, spec_k5, spec_k5,
                spec_c2((m_h, m_h)), spec_c2((m_h, m_h)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_slv, spec_par,
            ]
            operands = (dr, di, kr, ki, ur_m, ui_m, epr_m, epi_m,
                        oqr_m, oqi_m, slv, par)
        else:
            kern = _make_kernel_v5_peaks(
                mbh, mbw, f, vh, vw, lh, lh - vh, block_w, kw, out_h,
                out_w, precision, karatsuba,
            )
            scratch = [
                pltpu.VMEM((rows, wc2), jnp.float32),
                pltpu.VMEM((rows, wc2), jnp.float32),
                pltpu.VMEM((rows, _SLIVER_LANES), jnp.float32),
            ]
            in_specs = [
                spec_d, spec_d, spec_k5, spec_k5,
                spec_c2((m_h, m_h)), spec_c2((m_h, m_h)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_c2((l4, tn)), spec_c2((l4, tn)),
                spec_dsl, spec_dsl, spec_ksl, spec_ksl,
            ]
            operands = (dr, di, kr, ki, ur_m, ui_m, epr_m, epi_m,
                        oqr_m, oqi_m, dslr, dsli, kslr, ksli)
        flops = (
            8 * f * lh * wc2  # MAC
            + 16 * m_h * m_h * wc2 + 8 * m_h * wc2  # H radix
            + 8 * vh * l4 * tn + 16 * vh * tn  # W DIF (4 dots + combine)
        )
        vals8, idxs8 = pl.pallas_call(
            kern,
            grid=grid,
            scratch_shapes=scratch,
            in_specs=in_specs,
            out_specs=(cell_spec5, cell_spec5),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (b, n, gbh * 8, gbw * 128), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (b, n, gbh * 8, gbw * 128), jnp.int32
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=b * nbh * nbw * n * flops,
                bytes_accessed=(
                    2 * dr.dtype.itemsize * f * lh * wc2 * (b * nbh * nbw)
                    + 2 * dr.dtype.itemsize * f * lh * wc2
                    * (b * gbh * gbw * n)
                    + 8 * b * n * gbh * gbw * 8 * 128
                ),
                transcendentals=4 * (m_h + l4),
            ),
            interpret=interpret,
        )(*operands)
        return vals8[:, :, ::8, ::128], idxs8[:, :, ::8, ::128]

    mat_t = jnp.bfloat16 if precision == BF16IO else jnp.float32
    if radix_h:
        ur_np, ui_np = _radix_mats(block_h)
        gr = jnp.asarray(ur_np, mat_t)  # (M, M) sub-transforms
        gi = jnp.asarray(ui_np, mat_t)
        h_mat_shape = (block_h // 2, block_h // 2)
    else:
        gr_np, gi_np = _inv_full_mats(block_h)
        gr = jnp.asarray(gr_np[kh - 1 : kh - 1 + vh], mat_t)  # (Vh, Lh)
        gi = jnp.asarray(gi_np[kh - 1 : kh - 1 + vh], mat_t)
        h_mat_shape = (vh, lh)
    mr_np, mi_np = _inv_packed_mats(block_w)
    mr = jnp.asarray(mr_np[:, kw - 1 : kw - 1 + vw], mat_t)  # (Wc, Vw)
    mi = jnp.asarray(mi_np[:, kw - 1 : kw - 1 + vw], mat_t)

    grid = (b, gbh, gbw, n)
    spec_k = pl.BlockSpec(
        (1, f, lh, wc),
        lambda bi, gh, gw, ni: (ni, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    spec_const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, gh, gw, ni: (0, 0), memory_space=pltpu.VMEM
    )
    cell_spec = pl.BlockSpec(
        (1, 1, 8, 128),
        lambda bi, gh, gw, ni: (bi, ni, gh, gw),
        memory_space=pltpu.VMEM,
    )
    if radix_h:
        kern = _make_kernel_v4_peaks(
            mbh, mbw, f, vh, vw, wc, lh, lh - vh, out_h, out_w, precision,
            karatsuba
        )
        m_half = lh // 2
        flops_h = 16 * m_half * m_half * wc + 8 * m_half * wc
    else:
        kern = _make_kernel_v3_peaks(
            mbh, mbw, f, vh, vw, wc, out_h, out_w, precision, karatsuba
        )
        flops_h = 8 * vh * lh * wc
    flops_mac = 8 * f * lh * wc
    flops_w = 4 * vh * wc * vw
    vals8, idxs8 = pl.pallas_call(
        kern,
        grid=grid,
        scratch_shapes=[
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
            pltpu.VMEM((mbh * vh, wc), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(
                (1, mbh, mbw, f, lh, wc),
                lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, mbh, mbw, f, lh, wc),
                lambda bi, gh, gw, ni: (bi, gh, gw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            spec_k,
            spec_k,
            spec_const2(h_mat_shape),
            spec_const2(h_mat_shape),
            spec_const2((wc, vw)),
            spec_const2((wc, vw)),
        ],
        out_specs=(cell_spec, cell_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, gbh * 8, gbw * 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n, gbh * 8, gbw * 128), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * nbh * nbw * n * (flops_mac + flops_h + flops_w),
            bytes_accessed=(
                2 * dr.dtype.itemsize * f * lh * wc * (b * nbh * nbw)
                + 2 * dr.dtype.itemsize * f * lh * wc * (b * gbh * gbw * n)
                + 8 * b * n * gbh * gbw * 8 * 128
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, kr, ki, gr, gi, mr, mi)
    return vals8[:, :, ::8, ::128], idxs8[:, :, ::8, ::128]


# block_conv_pallas reads the global config (fused_precision /
# matmul_precision) at trace time when precision=None; register so
# set_config invalidates its cached executables.
from cuda_fft_convolution_tpu.utils.config import register_jit_consumer  # noqa: E402

register_jit_consumer(block_conv_pallas)
register_jit_consumer(block_conv_peaks_pallas)
