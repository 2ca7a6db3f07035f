"""Prototype: v5 (radix-2 DIF W-stage) peaks kernel, interpret-mode parity.

The round-4 v5 DIF W stage cut the fp32 headline maps call 44.4 -> 35.7 ms
(PERF.md round 4b); the detection head still runs v4 (radix_h only). This
prototype grafts the peaks (max, argmax) epilogue onto the v5 kernel body:
the DIF segments P+Q / P-Q are reduced PER SEGMENT against column-sliced
masks instead of being stored — the maps tile never exists even in VMEM.

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python perf/proto_v5_peaks.py
Parity oracle: argmax over block_conv_pallas(radix_w=True) maps.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_platforms", "cpu")

from cuda_fft_convolution_tpu.ops.block_conv import (  # noqa: E402
    _SLIVER_LANES,
    _dif_w_mats,
    _make_dot,
    _peaks_reducer,
    _radix_mats,
    block_conv_pallas,
    radix_h_legal,
    radix_w_legal,
)


def _make_kernel_v5_peaks(mbh, mbw, f, vh, vw, lh, w0, block_w, kw,
                          out_h, out_w, precision, karatsuba):
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
    setup, reduce_tile = _peaks_reducer(mbh, mbw, vh, vw, out_h, out_w)

    def _kernel(dr_ref, di_ref, kr_ref, ki_ref, ur_ref, ui_ref, epr_ref,
                epi_ref, oqr_ref, oqi_ref, dslr_ref, dsli_ref, kslr_ref,
                ksli_ref, val_ref, idx_ref, xr_ref, xi_ref, slr_ref):
        gh = pl.program_id(1)
        gw = pl.program_id(2)
        kr = kr_ref[0].astype(jnp.float32)
        ki = ki_ref[0].astype(jnp.float32)
        kslr = kslr_ref[0].reshape(f, lh).astype(jnp.float32)
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
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, epr.shape[1]), 1)
        parity = jnp.where(
            (k_col + t0) % 2 == 0, 1.0, -1.0
        ).astype(jnp.float32) / block_w
        # peaks state (reducer masks/flat indices for this grid cell)
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
            p_r = dot(xr_ref[:, :l4], epr) + dot(xi_ref[:, :l4], epi)
            q_r = (
                dot(xr_ref[:, l4:wc2], oqr) + dot(xi_ref[:, l4:wc2], oqi)
            )
            sl_r = slr_ref[:, 0:1]
            p_r = p_r + sl_r * parity
            # ---- per-segment (max, argmax) reduction: the maps tile never
            # materializes; each DIF segment reduces against column-sliced
            # masks (same merge semantics as the per-j tile merge) ----
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


def v5_peaks_call(dr, di, kr, ki, block_h, block_w, kh, kw, out_h, out_w,
                  mbh=1, mbw=1, interpret=True):
    """Prototype driver: v5 operand prep (mirrors block_conv_pallas's
    radix_w branch) + the peaks kernel above."""
    b, nbh, nbw, f, lh, wc = dr.shape
    n = kr.shape[0]
    vh, vw = block_h - kh + 1, block_w - kw + 1
    assert radix_h_legal(block_h, vh) and radix_w_legal(block_w, kw, vw)
    precision = jax.lax.Precision.HIGHEST
    gbh = -(-nbh // mbh)
    gbw = -(-nbw // mbw)
    if gbh * mbh != nbh or gbw * mbw != nbw:
        pad = ((0, 0), (0, gbh * mbh - nbh), (0, gbw * mbw - nbw),
               (0, 0), (0, 0), (0, 0))
        dr, di = jnp.pad(dr, pad), jnp.pad(di, pad)
    perm = jnp.concatenate([jnp.arange(0, lh, 2), jnp.arange(1, lh, 2)])
    dr = jnp.take(dr, perm, axis=4)
    di = jnp.take(di, perm, axis=4)
    kr = jnp.take(kr, perm, axis=2)
    ki = jnp.take(ki, perm, axis=2)
    l4 = block_w // 4
    wc_full = block_w // 2 + 1
    dslr, dsli = dr[..., wc_full - 1:], di[..., wc_full - 1:]
    kslr, ksli = kr[..., wc_full - 1:], ki[..., wc_full - 1:]
    perm_w = jnp.concatenate(
        [jnp.arange(0, 2 * l4, 2), jnp.arange(1, 2 * l4, 2)]
    )
    dr = jnp.take(dr, perm_w, axis=5)
    di = jnp.take(di, perm_w, axis=5)
    kr = jnp.take(kr, perm_w, axis=3)
    ki = jnp.take(ki, perm_w, axis=3)
    ur_np, ui_np = _radix_mats(block_h)
    ur_m, ui_m = jnp.asarray(ur_np), jnp.asarray(ui_np)
    epr_np, epi_np, oqr_np, oqi_np = _dif_w_mats(block_w, kw, vw)
    epr_m, epi_m = jnp.asarray(epr_np), jnp.asarray(epi_np)
    oqr_m, oqi_m = jnp.asarray(oqr_np), jnp.asarray(oqi_np)
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
    cell_spec = pl.BlockSpec(
        (1, 1, 8, 128),
        lambda bi, gh, gw, ni: (bi, ni, gh, gw),
        memory_space=pltpu.VMEM,
    )
    kern = _make_kernel_v5_peaks(
        mbh, mbw, f, vh, vw, lh, lh - vh, block_w, kw, out_h, out_w,
        precision, True,
    )
    rows = mbh * vh
    vals8, idxs8 = pl.pallas_call(
        kern,
        grid=grid,
        scratch_shapes=[
            pltpu.VMEM((rows, wc2), jnp.float32),
            pltpu.VMEM((rows, wc2), jnp.float32),
            pltpu.VMEM((rows, _SLIVER_LANES), jnp.float32),
        ],
        in_specs=[
            spec_d, spec_d, spec_k5, spec_k5,
            spec_c2((m_h, m_h)), spec_c2((m_h, m_h)),
            spec_c2((l4, tn)), spec_c2((l4, tn)),
            spec_c2((l4, tn)), spec_c2((l4, tn)),
            spec_dsl, spec_dsl, spec_ksl, spec_ksl,
        ],
        out_specs=(cell_spec, cell_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, gbh * 8, gbw * 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n, gbh * 8, gbw * 128), jnp.int32),
        ),
        interpret=interpret,
    )(dr, di, kr, ki, ur_m, ui_m, epr_m, epi_m, oqr_m, oqi_m,
      dslr, dsli, kslr, ksli)
    return vals8[:, :, ::8, ::128], idxs8[:, :, ::8, ::128]


def main():
    import cuda_fft_convolution_tpu as fc  # noqa: F401
    from cuda_fft_convolution_tpu.ops.tiled import fft_data_blocks
    from cuda_fft_convolution_tpu.ops.dft import rfft2_mm_planes

    rng = np.random.default_rng(7)
    failures = 0
    # (data, kernel, blocks, mbh, mbw, F): exercise 1 & multi-cell grids,
    # group padding, F>1 sliver sum, vw > l2 three-segment case
    cases = [
        ((400, 700), (65, 129), (256, 512), 1, 1, 1),
        ((400, 700), (65, 129), (256, 512), 2, 2, 1),
        ((500, 1200), (65, 129), (256, 512), 2, 1, 3),
        ((256, 950), (65, 129), (256, 1024), 1, 1, 2),  # vw=896 > l2=512
    ]
    for (dh, dw), (kh, kw), (bh, bw), mbh, mbw, f in cases:
        data = rng.standard_normal((dh, dw, f)).astype(np.float32)
        n = 3
        kerns = rng.standard_normal((n, kh, kw, f)).astype(np.float32)
        arr = jnp.asarray(np.moveaxis(data, -1, 0))[None]  # (1, F, H, W)
        d_re, d_im = fft_data_blocks(arr, bh, bw, kh, kw)
        karr = jnp.asarray(np.moveaxis(kerns, -1, 1))  # (N, F, Kh, Kw)
        kpad = jnp.zeros((n, f, bh, bw), jnp.float32)
        kpad = kpad.at[:, :, :kh, :kw].set(karr)
        k_re, k_im = rfft2_mm_planes(kpad, bh, bw)
        out_h, out_w = dh + kh - 1, dw + kw - 1
        maps = block_conv_pallas(
            d_re, d_im, k_re, k_im, bh, bw, kh, kw, out_h, out_w,
            interpret=True, mbh=mbh, mbw=mbw, radix_h=True, radix_w=True,
        )
        m = np.asarray(maps)[0]
        flat = m.reshape(n, -1)
        want_i = flat.argmax(axis=1)
        want_v = flat[np.arange(n), want_i]
        vals, idxs = v5_peaks_call(
            d_re, d_im, k_re, k_im, bh, bw, kh, kw, out_h, out_w,
            mbh=mbh, mbw=mbw,
        )
        cells = np.asarray(vals)[0].reshape(n, -1)
        ci = cells.argmax(axis=1)
        got_v = cells[np.arange(n), ci]
        got_i = np.asarray(idxs)[0].reshape(n, -1)[np.arange(n), ci]
        ok_v = np.allclose(got_v, want_v, rtol=1e-5)
        ok_i = np.array_equal(got_i, want_i)
        tag = "OK " if (ok_v and ok_i) else "FAIL"
        if not (ok_v and ok_i):
            failures += 1
        print(
            f"{tag} data={dh}x{dw} k={kh}x{kw} blocks={bh}x{bw} "
            f"group=({mbh},{mbw}) F={f}: vals {got_v} vs {want_v}; "
            f"idx {got_i} vs {want_i}"
        )
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")


if __name__ == "__main__":
    main()
