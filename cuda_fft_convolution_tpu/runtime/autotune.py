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

# (kh_env, kw_env, f_bucket) -> (valid_h, valid_w, use_fused[, block_h,
# block_w]). Envelopes are pow-2 round-ups; f_bucket: 1 for F < 8, 8 for
# F >= 8. ``use_fused`` routes the shape through the fused Pallas
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
    # 2048² image × 100 kernels of 64², F=1 (perf/bench_fused_v3/v4.py, r2):
    # the radix-2 v4 plan — blocks (256, 511), valid (192, 384), effective
    # envelope (65, 128), every MXU dot dimension 128-native — measured
    # 59–61 ms vs 61.8 (v3 (64,384)), 77.8 (v2 (64,512)), 75–90 (unfused).
    (64, 64, 1): (192, 384, True, 256, 511),
    # 32² kernels (perf/sweep_envelopes.py): v4 plan blocks (128, 511),
    # valid (96, 384) — amortized 'same' 56.9 ms vs 84.3 analytic-auto.
    # (128² kernels: the analytic (255, 895) v3 plan WINS (76.6 ms) over
    # v4 at M=256 (121 ms — sub-transform cost grows as 2M²); no entry.)
    (32, 32, 1): (96, 384, True, 128, 511),
    # DPM/HOG envelope: 12² kernels, F=31, 512² features (perf/tune_dpm.py,
    # r3, N=256 bank): the analytic valid (16, 128) (blocks (27, 139)) WON
    # at 43.6 ms vs Wc-dense/taller alternatives (58.6–105.2) — pinned so
    # future analytic-formula changes can't regress the measured choice.
    # Unfused (the F=31 VMEM economics reject the fused kernel; PERF.md).
    (16, 16, 8): (16, 128, False, 27, 139),
}
_MEASURED: dict = {}

_ENV_CACHE_PATH = "FFTCONV_AUTOTUNE_CACHE"


def _envelope(n: int) -> int:
    return max(1 << (int(n) - 1).bit_length(), 8)


def _key(kh: int, kw: int, f: int) -> tuple:
    return (_envelope(kh), _envelope(kw), 8 if f >= 8 else 1)


def register_tuned_geometry(
    kh: int, kw: int, valid_h: int, valid_w: int, *, f: int = 1,
    fused: bool = False, block_h: int | None = None,
    block_w: int | None = None,
) -> None:
    """Record a measured-best geometry (and whether the fused Pallas
    block-conv won) for kernels in (kh, kw)'s envelope. Explicit
    ``block_h/block_w`` pin the block beyond the derived vh+kh-1 (plans
    with an enlarged effective kernel envelope)."""
    entry = [int(valid_h), int(valid_w), bool(fused)]
    if block_h is not None and block_w is not None:
        entry += [int(block_h), int(block_w)]
    _MEASURED[_key(kh, kw, f)] = tuple(entry)


def lookup_tuned_geometry(
    kh: int, kw: int, f: int = 1
) -> tuple | None:
    """Best-known (valid_h, valid_w, use_fused[, block_h, block_w]) for
    this kernel envelope, or None."""
    _load_user_cache()
    key = _key(kh, kw, f)
    hit = _MEASURED.get(key, _BUILTIN.get(key))
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
                    env_h, env_w, fb = (int(x) for x in k.split(","))
                    _MEASURED[(env_h, env_w, fb)] = tuple(
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
            {f"{k[0]},{k[1]},{k[2]}": list(v) for k, v in _MEASURED.items()},
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
) -> tuple[tuple, dict]:
    """Measure candidate block plans ON THIS DEVICE for the given workload
    shape and return (best, {plan: seconds}). Plans are (valid_h, valid_w)
    or (valid_h, valid_w, block_h, block_w) — the latter pins explicit
    blocks with an enlarged effective kernel envelope (extra prehistory
    zeros; results identical).

    The winning plan is registered with FULL fidelity: explicit blocks and
    whether the fused Pallas block-conv engaged for it, so the later
    lookup→dispatch reproduces exactly the measured configuration.

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
                data, pkh, pkw, block_h=bh, block_w=bw
            )
            sk = _api.fft_kernels(kerns, spectral=sd)
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
            fused_flags[cand] = _fused_gate(f, bh, bw, vh, vw)
            del sd, sk
        except Exception:
            continue
    if not timings:
        raise RuntimeError("no autotune candidate ran successfully")
    best = min(timings, key=timings.get)
    if register:
        if len(best) == 4:
            vh, vw, bh, bw = best
        else:
            vh, vw = best
            bh, bw = vh + kh - 1, vw + kw - 1
        register_tuned_geometry(
            kh, kw, vh, vw, f=f, fused=fused_flags[best],
            block_h=bh, block_w=bw,
        )
    return best, timings


def _fused_gate(f: int, bh: int, bw: int, vh: int, vw: int) -> bool:
    """conv_blocks' auto fused-dispatch condition, evaluated for a measured
    plan so the registered entry records what actually ran — delegates to
    the single-sourced predicate (ops/tiled.py fused_dispatch_auto)."""
    from cuda_fft_convolution_tpu.ops.tiled import fused_dispatch_auto

    return fused_dispatch_auto(f, bh, bw, vh, vw)
