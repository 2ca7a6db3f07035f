"""Measured block-geometry autotuning for the overlap-save engine.

The tiled engine's throughput is set by the (valid_h, valid_w) block
geometry; the right choice is a hardware property, not a formula — so this
module keeps a MEASURED table (seeded from sweeps on real chips,
perf/sweep_*.py) and lets users extend it on their own device.

Key: (kernel-envelope pow2 per axis, feature-dim bucket). Lookup happens in
``ops.tiled.choose_block_fft`` before the analytic fallback formula.

This is the TPU analogue of the reference's user-tunable thread-block dims
(the optional ``[H W D 2D]`` 4-vector, src/cudaConvolutionFFT.cu:72-82) —
except the knob ships with measured defaults and a tuner instead of magic
numbers.
"""

from __future__ import annotations

import json
import os
import time

# (kh_env, kw_env, f_bucket, dtype_tag) -> (valid_h, valid_w,
# use_fused[, block_h, block_w]). Envelopes are pow-2 round-ups; f_bucket:
# 1 for F == 1, 2 for 2 <= F < 8 (falls back to bucket 1 when unmeasured
# — the single-channel plan is the best-known prior, EXCEPT where the
# v5 DIF plan is involved: its per-F VPU cost made the F=1 winner lose
# at F >= 2, perf/r4e_v5_fmulti.py), 8 for F >= 8;
# dtype_tag: 'f32' | 'bf16' (the serving tier
# changes both the VMEM legality gate and the measured winner — round-3
# VERDICT weak #5). Lookups for the bf16 tier FALL BACK to the f32 entry
# when no tier-specific measurement exists (the f32 geometry is the
# best-known prior; dispatch stays dtype-aware through fused_dispatch_auto
# regardless). ``use_fused`` routes the shape through the fused Pallas
# block-conv kernel (ops/block_conv.py) when its alignment/VMEM constraints
# hold. Optional explicit (block_h, block_w) override the derived
# vh+kh_env-1 block — used by plans whose effective kernel envelope is
# deliberately larger than the user's (e.g. the radix-2 v4 plan: blocks
# (256, 511) with valid (192, 384) → effective envelope (65, 128), every
# MXU dot dimension 128-native).
# Measured on TPU v5e (perf/sweep_focused.py + perf/bench_fused_*.py,
# 2048² image, N=100 bank). Findings: lane-aligned Hermitian width
# (Wc = (vw+kw-1)//2+1 multiple of 128) dominates the unfused vw axis
# (best (64,192) = 80.1 ms); the fused v2 kernel at its alignment-legal
# geometries matched it ((64,512) = 77.8 ms).
# Shipped seeds, measured on TPU v5e in this repo's perf/ sweeps; the
# user-level _MEASURED overlay (register_tuned_geometry / cache file)
# takes precedence and can be cleared without losing these.
_BUILTIN: dict = {
    # 2048² image × 100 kernels of 64², F=1: the v5 DIF plan — blocks
    # (256, 512), valid (192, 384), effective envelope (65, 129); the
    # radix-2 DIF W stage (ops/block_conv._BUILTIN_RADIX_W) cuts W-stage
    # MACs 2.25× — measured 35.7 ms one-shot vs 44.4 at the previous
    # v4-tuned (256, 511) plan (perf/r4_v5w.py, v5e 2026-08-19; earlier
    # r2 family numbers: v4@511 59-61 ms vs 61.8 v3, 77.8 v2, 75-90
    # unfused).
    (64, 64, 1, "f32"): (192, 384, True, 256, 512),
    # Same envelope at F ∈ [2, 8): the v5 DIF stage measured LOSING
    # (perf/r4e_v5_fmulti.py, v5e 2026-08-19, 2048²×32 streamed: F=2
    # 9.53 ms v4@(256,511) vs 11.28 v5@512; F=4 11.14 vs 17.70 — the
    # sliver MAC's F-unrolled channel sum + per-F halves shuffles scale
    # with F), so multi-F banks keep the v4 radix-2 plan.
    (64, 64, 2, "f32"): (192, 384, True, 256, 511),
    # 32² kernels: the v5 DIF plan at blocks (128, 512), valid (96, 384)
    # — streamed 15.6 ms/frame vs 17.4 at the previous v4 (128, 511)
    # plan (perf/r4h_v5_k32.py, v5e 2026-08-19; the round-3
    # sweep_envelopes numbers for v4@511: amortized 'same' 56.9 ms vs
    # 84.3 analytic-auto). (128² kernels: the analytic (255, 895) v3
    # plan WINS (76.6 ms) over v4 at M=256 (121 ms — sub-transform cost
    # grows as 2M²); no entry.)
    (32, 32, 1, "f32"): (96, 384, True, 128, 512),
    # Same envelope at F ∈ [2, 8): v5 is F=1-only (the r4e lesson), and
    # v4 at 512 blocks pays the Wc=257 lane pad — multi-F banks keep the
    # v4 (128, 511) plan (the round-3 measured winner at this envelope).
    (32, 32, 2, "f32"): (96, 384, True, 128, 511),
    # DPM/HOG envelope: 12² kernels, F=31, 512² features (perf/tune_dpm.py,
    # r3, N=256 bank): the analytic valid (16, 128) (blocks (27, 139)) WON
    # at 43.6 ms vs Wc-dense/taller alternatives (58.6–105.2) — pinned so
    # future analytic-formula changes can't regress the measured choice.
    # Unfused (the F=31 VMEM economics reject the fused kernel; PERF.md).
    (16, 16, 8, "f32"): (16, 128, False, 27, 139),
    # ---- round-4 on-chip autotune (perf/r4_autotune.py, v5e 2026-08-19;
    # amortized 'same', group sweep included — winning (MBH, MBW) pinned
    # in ops/block_conv._BUILTIN_GROUPS) ----
    # 64² kernels, F=8 f32 (1024²×64 bank): the v4-family (128,511) plan
    # at 44.3 ms vs analytic (64,192)-class 50.9-65.6.
    (64, 64, 8, "f32"): (64, 384, True, 128, 511),
    # 64² kernels, F=8 bf16: the FULL v4 (256,511) plan wins (33.0 vs
    # 36.4 at (128,511)) — unlike f32, whose VMEM gate rejects it.
    (64, 64, 8, "bf16"): (192, 384, True, 256, 511),
    # 64² kernels, F=1 bf16 (the headline config's serving tier): the
    # v5x DIF plan at blocks (256, 512) — the round-5 tier MXU lever
    # (XLA-hoisted Nyquist sliver + rank-1 MXU update,
    # ops/block_conv._BUILTIN_RADIX_W_XSLIVER): streamed 9.94 ms/frame
    # kernel-level / 9.8 end-to-end vs 12.16 at the round-4 tier-tuned
    # v3 (128,511) and 10.42 v4 @ (256,511) (perf/r5a_v5x.py +
    # r5b_v5x_api.py, v5e 2026-08-20; group (1,3) pinned in
    # _BUILTIN_GROUPS; tier parity vs direct 4.7e-3).
    (64, 64, 1, "bf16"): (192, 384, True, 256, 512),
    # Same envelope at F ∈ [2, 8): the v5x plan is F=1-only (multi-F
    # measured losing at BOTH sliver variants — perf/r4e_v5_fmulti.py,
    # r5a_v5x.py: F=2 v5x 12.61 vs v4@511 9.76) — multi-F bf16 banks
    # keep the round-4 tier plan (128, 511) so the F=1 entry's (256,512)
    # blocks never leak to them through the bucket fallback.
    (64, 64, 2, "bf16"): (64, 384, True, 128, 511),
    # 32² kernels, F=1 bf16: (128,511) blocks, valid (96,384): 33.6 vs
    # 39.7 at the f32-tuned family's (64,511).
    (32, 32, 1, "bf16"): (96, 384, True, 128, 511),
    # ---- detection-head ("peaks") geometries (perf/r4b_peaks.py +
    # r4g2_v5_peaks_api.py, v5e 2026-08-19). The peaks kernel reduces
    # cells in VMEM, so it prefers TALLER cells than conv (fewer grid
    # steps per image: bf16 peaks at (256,511) measured 32.0 ms vs ~50
    # at the tier's conv-tuned (128,511)). f32 peaks runs the v5 DIF
    # plan at (256,512) since round 4g (_BUILTIN_RADIX_W_PEAKS):
    # streamed 18.4 ms/frame vs 21.2 at the previous (256,511) v4 plan
    # — and the SAME spectra now serve both the conv (v5) and peaks
    # (v5) heads optimally. bf16 keeps the 511 plan (v3-gated tier). ----
    (64, 64, 1, "f32", "peaks"): (192, 384, True, 256, 512),
    (64, 64, 1, "bf16", "peaks"): (192, 384, True, 256, 511),
    # round-5 cells (perf/r5c_ragged_peaks.py, v5e 2026-08-20 —
    # detect_peaks API streamed sync/9, 1024²×64 of 32²): 32² bf16 peaks
    # prefers the TALLER (256,511) cells (4.19 vs 4.33 ms/frame at the
    # conv-entry fallback's (128,511)) — the r4b taller-cells lesson at
    # this envelope; F=8 bf16 peaks flips back to (128,511) (6.90 vs
    # 7.48 — 8 spectra planes per block make tall cells VMEM/fetch-bound).
    (32, 32, 1, "bf16", "peaks"): (192, 384, True, 256, 511),
    (32, 32, 8, "bf16", "peaks"): (96, 384, True, 128, 511),
}
_MEASURED: dict = {}

_ENV_CACHE_PATH = "FFTCONV_AUTOTUNE_CACHE"


def _envelope(n: int) -> int:
    return max(1 << (int(n) - 1).bit_length(), 8)


def _dtype_tag(store_dtype) -> str:
    return "bf16" if str(store_dtype) in ("bfloat16", "bf16") else "f32"


def _key(
    kh: int, kw: int, f: int, store_dtype="float32", head: str = "conv"
) -> tuple:
    base = (
        _envelope(kh), _envelope(kw),
        8 if f >= 8 else (2 if f >= 2 else 1),
        _dtype_tag(store_dtype),
    )
    # conv entries keep the historical 4-tuple key; other heads (the
    # peaks detection head) append their tag — the geometry winner can
    # differ per head (the peaks kernel has no W-radix stage, so the v5
    # 512-wide conv plans tile-pad its Wc; and its VMEM reduction
    # epilogue prefers taller cells — perf/r4b_peaks.py).
    return base if head == "conv" else base + (head,)


def register_tuned_geometry(
    kh: int, kw: int, valid_h: int, valid_w: int, *, f: int = 1,
    fused: bool = False, block_h: int | None = None,
    block_w: int | None = None, store_dtype="float32",
    head: str = "conv",
) -> None:
    """Record a measured-best geometry (and whether the fused Pallas
    block-conv won) for kernels in (kh, kw)'s envelope at the given
    storage tier. Explicit ``block_h/block_w`` pin the block beyond the
    derived vh+kh-1 (plans with an enlarged effective kernel envelope).
    ``head='peaks'`` records a detection-head geometry (looked up by
    models.detect_peaks; falls back to the conv entry when absent)."""
    entry = [int(valid_h), int(valid_w), bool(fused)]
    if block_h is not None and block_w is not None:
        entry += [int(block_h), int(block_w)]
    _MEASURED[_key(kh, kw, f, store_dtype, head)] = tuple(entry)


def _lookup_one(key) -> tuple | None:
    eh, ew, fb, tag = key[:4]
    head = key[4:]
    # Fallback chain: exact → F-bucket 1 at the same tier (the F=1 plan
    # is the best prior for an unmeasured 2 ≤ F < 8 bank) → the f32
    # entries in the same order (the tier fallback predates the tiers'
    # own measurements and stays last).
    buckets = (fb, 1) if fb == 2 else (fb,)
    tags = (tag, "f32") if tag != "f32" else (tag,)
    for t in tags:
        for b in buckets:
            k = (eh, ew, b, t) + head
            hit = _MEASURED.get(k, _BUILTIN.get(k))
            if hit is not None:
                return hit
    return None


def lookup_tuned_geometry(
    kh: int, kw: int, f: int = 1, store_dtype="float32",
    head: str = "conv",
) -> tuple | None:
    """Best-known (valid_h, valid_w, use_fused[, block_h, block_w]) for
    this kernel envelope at this storage tier, or None. bf16 lookups fall
    back to the f32 entry when the tier has no measurement of its own;
    non-conv heads fall back to the conv entry."""
    _load_user_cache()
    hit = _lookup_one(_key(kh, kw, f, store_dtype, head))
    if hit is None and head != "conv":
        hit = _lookup_one(_key(kh, kw, f, store_dtype))
    if hit is None:
        return None
    if len(hit) == 2:  # legacy 2-tuple cache entries
        return (hit[0], hit[1], False)
    return tuple(hit)


_user_cache_loaded = False


def _load_user_cache() -> None:
    global _user_cache_loaded
    if _user_cache_loaded:
        return
    _user_cache_loaded = True
    path = os.environ.get(_ENV_CACHE_PATH, "")
    if path and os.path.exists(path):
        try:
            with open(path) as fh:
                for k, v in json.load(fh).items():
                    parts = k.split(",")
                    env_h, env_w, fb = (int(x) for x in parts[:3])
                    # legacy 3-part keys load as the f32 tier; a 5th
                    # part is a non-conv head tag (e.g. "peaks")
                    tag = parts[3] if len(parts) > 3 else "f32"
                    key = (env_h, env_w, fb, tag) + tuple(parts[4:5])
                    _MEASURED[key] = tuple(
                        bool(x) if i == 2 else int(x)
                        for i, x in enumerate(v)
                    )
        except Exception:
            pass


def save_user_cache() -> None:
    """Persist the current table to $FFTCONV_AUTOTUNE_CACHE (if set)."""
    path = os.environ.get(_ENV_CACHE_PATH, "")
    if not path:
        return
    with open(path, "w") as fh:
        json.dump(
            {",".join(str(x) for x in k): list(v)
             for k, v in _MEASURED.items()},
            fh,
        )


def default_candidates(kh: int, kw: int) -> list[tuple]:
    """Candidate plans for ``autotune_block_geometry``: (vh, vw) analytic
    geometries plus (vh, vw, block_h, block_w) enlarged-envelope plans in
    the two measured-winning families (the v4 radix-2 plans: blocks
    (4·Ke, 511) with 128-native dot dims — see _BUILTIN)."""
    ke_h, ke_w = _envelope(kh), _envelope(kw)
    base_h = [max(8, _envelope(kh - 1) // 2), _envelope(kh - 1),
              2 * _envelope(kh - 1)]
    # vw candidates with lane-aligned Hermitian width: block_w = vw+kw−1
    # must be 256·m − 1 (odd) so Wc = block_w//2 + 1 = 128·m exactly —
    # any other width tile-pads the spectra planes (a 129-wide Wc
    # physically occupies 256 lanes: 1.98× traffic on every MAC/product
    # byte). m starts at the first multiple that clears vw ≥ 128, so
    # large kernels (512²+) get candidates too.
    cand_w = []
    m0 = -(-(128 + kw) // 256)
    for m in (m0, m0 + 1, m0 + 2):
        vw = 256 * m - kw
        if vw >= 128:
            cand_w.append(vw)
    cands: list[tuple] = [(vh, vw) for vh in base_h for vw in cand_w]
    # enlarged-envelope fused plans (effective envelope (Ke+1, 128)):
    # blocks (4Ke, 511) → valid (4Ke − Ke, 384); radix-2-legal when the
    # half-period 2Ke ≤ 128 and window start Ke is 8-aligned.
    if ke_h % 8 == 0 and kw <= 128:
        for mult in (2, 4):
            bh = mult * ke_h
            vh = bh - ke_h
            if vh >= 8:
                cands.append((vh, 384, bh, 511))
    return cands


def autotune_block_geometry(
    data_shape: tuple,  # (H, W, F) channels-last
    kh: int,
    kw: int,
    *,
    n_kernels: int = 32,
    candidates: list[tuple] | None = None,
    iters: int = 3,
    register: bool = True,
    store_dtype: str = "float32",
    sweep_groups: bool = True,
) -> tuple[tuple, dict]:
    """Measure candidate block plans ON THIS DEVICE for the given workload
    shape and return (best, {plan: seconds}). Plans are (valid_h, valid_w)
    or (valid_h, valid_w, block_h, block_w) — the latter pins explicit
    blocks with an enlarged effective kernel envelope (extra prehistory
    zeros; results identical).

    The winning plan is registered with FULL fidelity: explicit blocks and
    whether the fused Pallas block-conv engaged for it, so the later
    lookup→dispatch reproduces exactly the measured configuration.

    ``store_dtype='bfloat16'`` tunes the bf16 serving tier: candidates run
    with bf16 spectra (BF16IO dots where fused) and the winner registers
    under the tier's own table key, so bf16 dispatch stops inheriting
    f32-measured geometry on faith. When the winning plan engages the
    fused kernel and ``sweep_groups`` is set, the (MBH, MBW) block group is
    ALSO swept and the measured winner pinned via ``register_fused_group``
    (the analytic group heuristic was tuned at HIGHEST only).

    Timing uses the probe-fetch barrier (utils.profiling.device_sync
    semantics) so it is honest on tunneled runtimes. Each candidate costs
    one compile — run once per deployment shape, then ``save_user_cache``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuda_fft_convolution_tpu import api as _api

    h, w, f = data_shape
    if candidates is None:
        candidates = default_candidates(kh, kw)

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((h, w, f)).astype(np.float32))
    kerns = jnp.asarray(
        rng.standard_normal((n_kernels, kh, kw, f)).astype(np.float32)
    )

    def probed(fn):
        def wrapped(*args):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.ravel(leaf)[:4], out

        return jax.jit(wrapped)

    timings: dict = {}
    fused_flags: dict = {}
    for cand in candidates:
        if len(cand) == 4:
            vh, vw, bh, bw = cand
        else:
            vh, vw = cand
            bh, bw = vh + kh - 1, vw + kw - 1
        pkh, pkw = bh - vh + 1, bw - vw + 1  # effective envelope
        if pkh < kh or pkw < kw:
            continue
        if bh > h + pkh - 1 or bw > w + pkw - 1:
            continue
        try:
            sd = _api.fft_data_tiled(
                data, pkh, pkw, block_h=bh, block_w=bw,
                store_dtype=store_dtype,
            )
            sk = _api.fft_kernels(
                kerns, spectral=sd, store_dtype=store_dtype,
                storage="planar",
            )
            jax.block_until_ready((sd.re, sk.re))
            conv = probed(
                lambda s, k: _api.conv_spectral(s, k, mode="same")
            )
            p, _ = conv(sd, sk)
            np.asarray(p)  # warmup + barrier
            t0 = time.perf_counter()
            for _ in range(iters):
                p, _ = conv(sd, sk)
                np.asarray(p)
            timings[cand] = (time.perf_counter() - t0) / iters
            fused_flags[cand] = _fused_gate(f, bh, bw, vh, vw, store_dtype)
            del sd, sk
        except Exception:
            continue
    if not timings:
        raise RuntimeError("no autotune candidate ran successfully")
    best = min(timings, key=timings.get)
    if len(best) == 4:
        vh, vw, bh, bw = best
    else:
        vh, vw = best
        bh, bw = vh + kh - 1, vw + kw - 1
    if register:
        register_tuned_geometry(
            kh, kw, vh, vw, f=f, fused=fused_flags[best],
            block_h=bh, block_w=bw, store_dtype=store_dtype,
        )
    if sweep_groups and fused_flags[best]:
        _sweep_groups(
            data, kerns, kh, kw, vh, vw, bh, bw, f, store_dtype, iters,
            register,
        )
    return best, timings


def _sweep_groups(
    data, kerns, kh, kw, vh, vw, bh, bw, f, store_dtype, iters, register
):
    """Measure (MBH, MBW) block-group candidates for the winning fused plan
    at its storage tier and pin the best via register_fused_group."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuda_fft_convolution_tpu import api as _api
    from cuda_fft_convolution_tpu.ops.block_conv import (
        block_conv_vmem_bytes,
        register_fused_group,
    )

    spec_bytes = 2 if _dtype_tag(store_dtype) == "bf16" else 4
    wc = bw // 2 + 1
    pkh, pkw = bh - vh + 1, bw - vw + 1
    sd = _api.fft_data_tiled(
        data, pkh, pkw, block_h=bh, block_w=bw, store_dtype=store_dtype
    )
    sk = _api.fft_kernels(
        kerns, spectral=sd, store_dtype=store_dtype, storage="planar"
    )
    jax.block_until_ready((sd.re, sk.re))

    def probed(fn):
        def wrapped(*args):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.ravel(leaf)[:4], out

        return jax.jit(wrapped)

    results: dict = {}
    for mbh, mbw in (
        (1, 1), (2, 1), (2, 2), (4, 1), (4, 2), (1, 2), (8, 1),
    ):
        if block_conv_vmem_bytes(
            f, bh, wc, vh, vw, mbh, True, mbw, spec_bytes
        ) >= (12 << 20):
            continue
        register_fused_group(bh, wc, vh, vw, f, spec_bytes, mbh, mbw)
        conv = probed(lambda s, k: _api.conv_spectral(s, k, mode="same"))
        try:
            p, _ = conv(sd, sk)
            np.asarray(p)
            t0 = time.perf_counter()
            for _ in range(iters):
                p, _ = conv(sd, sk)
                np.asarray(p)
            results[(mbh, mbw)] = (time.perf_counter() - t0) / iters
        except Exception:
            continue
    if results:
        best = min(results, key=results.get)
        if register:
            register_fused_group(
                bh, wc, vh, vw, f, spec_bytes, best[0], best[1]
            )
    return results


def _fused_gate(
    f: int, bh: int, bw: int, vh: int, vw: int,
    store_dtype: str = "float32",
) -> bool:
    """conv_blocks' auto fused-dispatch condition, evaluated for a measured
    plan so the registered entry records what actually ran — delegates to
    the single-sourced predicate (ops/tiled.py fused_dispatch_auto)."""
    import jax.numpy as jnp

    from cuda_fft_convolution_tpu.ops.tiled import fused_dispatch_auto

    dt = jnp.bfloat16 if _dtype_tag(store_dtype) == "bf16" else jnp.float32
    return fused_dispatch_auto(f, bh, bw, vh, vw, dt)
