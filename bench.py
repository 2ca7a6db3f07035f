#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline config (BASELINE.json): 2048×2048 image × 100 kernels of 64×64,
fp32 — the library's recommended one-shot path (`fft_conv` with
algorithm='auto', 'same' maps), jit-wrapped end-to-end (the public API is
jit-transparent) so one call is one XLA program. Kernel FFTs are INCLUDED —
this is the cudaConvolutionFFT-equivalent workload.

``vs_baseline`` = measured throughput / the algorithm-independent HBM floor
(read image + read bank + write output maps at device bandwidth — the
speed-of-light no implementation can beat). The reference publishes no
numbers (SURVEY.md §6), so this floor is the only stable yardstick; it does
not move as our implementation changes.

EVERY BASELINE.json config is measured in the default run (round-1 shipped
nulls for the secondary configs — no more):
  - configs[0/1] correctness: the accuracy check vs a float64 CPU FFT oracle
  - configs[2]: 2048² × 512² kernels (large-kernel/crossover regime)
  - configs[3]: batch of 8 × 100 kernels, pipelined/tiled
  - configs[4]: bf16 DPM/HOG — 4K image → HOG features (512²×31) → 1000+
    filter bank, fp32 spectral accumulation; plus the F=31 giant-bank
    DIRECT config (~9 GB of bank spectra) that round 1 could not run at all
    before split-plane storage made the bank donatable.

Set BENCH_QUICK=1 to run only the headline + tiled + accuracy (fast
inner-loop benching during development).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# HBM bandwidth (GB/s) for the roofline denominator, by device kind.
_HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0,
             "v6e": 1640.0}


def _device_hbm_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


def _probed(fn):
    """Wrap a jittable fn so it ALSO returns a 4-element probe as the first
    output: fetching the probe is then a single D2H round trip that waits
    for the whole program (block_until_ready alone returns early on
    tunneled runtimes, and an eager ravel+slice probe costs 2 extra
    dispatch round trips ≈ 60 ms measured)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out

    return jax.jit(wrapped)


def _time_fn(fn, *args, warmup=2, iters=5, sync_every=1) -> float:
    """fn must be _probed: sync = one fetch of the tiny first output.

    ``sync_every`` > 1 pipelines dispatches between syncs (a streaming
    server's steady state — amortizes the tunnel RTT) at the cost of
    holding that many working sets concurrently."""
    for _ in range(warmup):
        probe, _ = fn(*args)
        np.asarray(probe)
    t0 = time.perf_counter()
    probe = None
    for i in range(iters):
        probe, _ = fn(*args)
        if (i + 1) % sync_every == 0:
            np.asarray(probe)
    np.asarray(probe)
    return (time.perf_counter() - t0) / iters


def _time_stream(stream, frame, iters=18, sync_every=9) -> float:
    """Steady-state serving through a stream runtime (RaggedConvStream):
    pipelined submits, honest probe-fetch sync every ``sync_every``
    frames — the stream analogue of ``_time_fn``'s sync_every mode.
    ``stream.depth`` must be >= sync_every."""
    fut = stream.submit(frame)
    fut.result()  # warmup
    stream.flush()
    t0 = time.perf_counter()
    fut = None
    done = 0
    while done < iters:
        for _ in range(min(sync_every, iters - done)):
            fut = stream.submit(frame)
            done += 1
        fut.result()
    return (time.perf_counter() - t0) / iters


def _rtt_floor() -> float:
    """Measured per-sync round-trip floor (s): a trivial probed program."""
    import jax.numpy as jnp

    f = _probed(lambda x: x * 2.0)
    x = jnp.ones((8, 128), jnp.float32)
    ts = []
    np.asarray(f(x)[0])
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _backend_or_report(timeout_s: float = 600.0) -> bool:
    """Initialize the JAX backend under a watchdog. The tunneled TPU
    runtime, when its relay is down, HANGS inside backend init for minutes
    before raising (observed: ~3 min per attempt, 'Unable to initialize
    backend axon: UNAVAILABLE') — a crashed/hung bench leaves no record.
    On timeout or init failure this prints an honest zero-value JSON line
    (with the error in detail) and returns False."""
    import threading

    result: dict = {}

    def _init():
        try:
            import jax

            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            result["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in result:
        return True
    print(
        json.dumps(
            {
                "metric": "GPix*filters/s, one-shot fft_conv (jit-fused, "
                          "auto engine), 2048^2 image x 100 64x64 kernels, "
                          "fp32, 'same' maps",
                "value": 0.0,
                "unit": "GPix*filters/s",
                "vs_baseline": 0.0,
                "detail": {
                    "error": result.get(
                        "error",
                        f"backend init timed out after {timeout_s:.0f}s "
                        "(TPU tunnel unavailable)",
                    )
                },
            }
        )
    )
    return False


def main() -> None:
    if not _backend_or_report():
        return
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: first-compile of big programs through the
    # remote-compile tunnel is minutes; cached reruns are seconds.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import cuda_fft_convolution_tpu as fc
    from cuda_fft_convolution_tpu.utils.fft_size import compute_fft_size

    quick = os.environ.get("BENCH_QUICK", "0") == "1"
    # BENCH_SMOKE=1: shrink every config so ALL rows execute quickly on CPU
    # — a plumbing check (tests/test_aux.py runs it), not a measurement.
    # Real sizes stay the single source of truth in the else branch.
    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"

    rng = np.random.default_rng(0)
    if smoke:
        H = W = 256
        N, KH, KW, F = 10, 16, 16, 1
        ACC = 128           # accuracy-check image size
        BIGK, NB = 48, 2    # large-kernel regime
        BATCH_B, BATCH_HW = 2, 128
        IMG4K, NK, KD, NKD = 256, 16, 12, 8
    else:
        H = W = 2048
        N, KH, KW, F = 100, 64, 64, 1
        ACC = 512
        BIGK, NB = 512, 16
        BATCH_B, BATCH_HW = 8, 1024
        IMG4K, NK, KD, NKD = 4096, 1024, 12, 576
    data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
    kernels = jnp.asarray(rng.standard_normal((N, KH, KW, F)).astype(np.float32))
    jax.block_until_ready((data, kernels))
    gpix_filters = H * W * N / 1e9

    # --- accuracy vs float64 CPU FFT oracle first, while HBM is empty
    # (512²×8 kernels shares every code path incl. the tiled engine —
    # BASELINE configs[0]/[1] correctness scenario)
    dh = np.asarray(data[:ACC, :ACC, :])
    ks = np.asarray(kernels[:8, :, :, :])
    got = np.array(fc.fft_conv(dh, KH, KW, ks, mode="full"))
    oh, ow = ACC + KH - 1, ACC + KW - 1
    err = 0.0
    for i in range(ks.shape[0]):
        ref = np.zeros((oh, ow))
        for c in range(F):
            ref += np.real(
                np.fft.ifft2(
                    np.fft.fft2(dh[:, :, c].astype(np.float64), (oh, ow))
                    * np.fft.fft2(ks[i, :, :, c].astype(np.float64), (oh, ow))
                )
            )
        err = max(err, np.max(np.abs(got[i] - ref)) / np.max(np.abs(ref)))
    del got

    # --- headline: recommended one-shot, jit-fused end-to-end
    one_shot = _probed(
        lambda d, k: fc.fft_conv(d, KH, KW, k, mode="same", algorithm="auto")
    )
    t_head = _time_fn(one_shot, data, kernels)
    v_head = gpix_filters / t_head

    # --- tiled amortized (overlap-save serving path: block spectra + bank
    # spectra precomputed, MAC + windowed MXU-DFT inverse per call; the
    # 'same' window is baked into the tiling — no trim copy)
    sdt = fc.fft_data_tiled(data, KH, KW, trim_mode="same")
    skt = fc.fft_kernels(kernels, spectral=sdt)
    jax.block_until_ready((sdt.re, skt.re))
    conv_t = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    t_tiled = _time_fn(conv_t, sdt, skt)
    v_tiled = gpix_filters / t_tiled
    # steady-state serving: dispatches pipelined, sync every 9th call —
    # amortizes the tunnel RTT the per-call numbers include (depth sweep
    # perf/diag_stream_depth2.py: sync9 19.1 ms/frame vs sync3 25.8; the
    # device-side ~17-18 ms is the asymptote)
    t_stream = _time_fn(conv_t, sdt, skt, iters=18, sync_every=9)
    v_stream = gpix_filters / t_stream
    del sdt, skt

    v_fftmap = v_amort = v_bf16 = v_bf16_stream = v_batch = None
    v_bf16out_stream = None
    t_bigk = t_gd = None  # one-shot wall times for the minus-RTT details
    v_bigk = v_bigk_stream = v_dpm_direct = v_dpm = None
    v_dpm_direct_stream = None
    v_dpm_stream = None
    v_peaks = v_peaks_stream = peaks_stream_ms = None
    v_peaks_f32_stream = peaks_f32_stream_ms = None
    peaks_fetch_ms = maps_fetch_est_ms = None
    v_ragged = v_ragged_stream = v_dpmf8_stream = None
    v_dpm_bf16out = None
    if not quick:
        import gc as _gc

        # reference-parity one-shot: raw circular fftmaps. 'auto' routes
        # these through the tiled engine since round 3f — the baked FFT
        # canvas makes overlap-save emit direct-parity raw maps.
        fftmap_shot = _probed(
            lambda d, k: fc.fft_conv(d, KH, KW, k, mode="fftmap")
        )
        v_fftmap = gpix_filters / _time_fn(fftmap_shot, data, kernels, iters=3)

        # amortized direct: precomputed data + kernel spectra (split API)
        sd = fc.fft_data(data, KH, KW)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.re, sk.re))
        conv_d = _probed(lambda s, k: fc.conv_spectral(s, k))
        v_amort = gpix_filters / _time_fn(conv_d, sd, sk, iters=3)

        # NOTE: rounds 1-4 carried a `pipelined` row here
        # (conv_spectral_pipelined chunk_size=16 on this 100-kernel bank).
        # It measured statistically identical to amortized_direct in every
        # round — at this bank size chunking does not bind (XLA already
        # pipelines the dispatch), so the row was a non-signal (round-4
        # VERDICT weak #6). Chunked dispatch is still exercised where it
        # actually binds: the giant-bank DPM rows below run the planner's
        # HBM-budget chunking end to end, and tests/test_api.py pins the
        # chunk-floor regression.
        del sd, sk

        # bf16 inputs, fp32 spectral accumulation (BASELINE configs[4]
        # dtype): the bf16 serving tier end-to-end — spectra stored bf16,
        # the fused Pallas kernel runs single-pass BF16IO dots with f32
        # accumulation (one third of bf16x3's passes, half the spectra
        # bytes). Measured 35.8 ms one-shot vs 44.3 fp32-fused
        # (perf/diag_bf16_fused.py); tier rel err ~5e-3.
        bf16_shot = _probed(
            lambda d, k: fc.fft_conv(
                d, KH, KW, k, mode="same", store_dtype="bfloat16"
            )
        )
        v_bf16 = gpix_filters / _time_fn(
            bf16_shot, data.astype(jnp.bfloat16),
            kernels.astype(jnp.bfloat16), iters=3,
        )
        # tier serving steady state: amortized bf16 spectra + deep
        # pipeline — the fused call's ~9 ms device time almost fully
        # exposed (46.7 GPix·F/s measured)
        sdt16 = fc.fft_data_tiled(
            data, KH, KW, trim_mode="same", store_dtype="bfloat16"
        )
        skt16 = fc.fft_kernels(
            kernels, spectral=sdt16, store_dtype="bfloat16"
        )
        jax.block_until_ready((sdt16.re, skt16.re))
        conv_16 = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_bf16s = _time_fn(conv_16, sdt16, skt16, iters=18, sync_every=9)
        v_bf16_stream = gpix_filters / t_bf16s
        # out_dtype composition at the headline (round 5, VERDICT #3):
        # bf16 spectra + bf16 output maps — the maps write is the
        # dominant output-side traffic term; kernel-level the composed
        # tier measured 9.69 vs 10.08 ms/frame at the v5x plan
        # (perf/r5b_v5x_api.py), API-level within noise — this row
        # records the composed serving number either way.
        conv_16b = _probed(
            lambda s, k: fc.conv_spectral(
                s, k, mode="same", out_dtype="bfloat16"
            )
        )
        t_bf16sb = _time_fn(conv_16b, sdt16, skt16, iters=18, sync_every=9)
        v_bf16out_stream = gpix_filters / t_bf16sb
        del sdt16, skt16

        # batch of 8 images (BASELINE configs[3]; 1024² so the (8, 100, H, W)
        # output fits 16 GB HBM)
        bdata = jnp.asarray(
            rng.standard_normal(
                (BATCH_B, BATCH_HW, BATCH_HW, F)
            ).astype(np.float32)
        )
        sdb = fc.fft_data_tiled(bdata, KH, KW, trim_mode="same")
        skb = fc.fft_kernels(kernels, spectral=sdb)
        jax.block_until_ready((sdb.re, skb.re))
        conv_b = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_batch = _time_fn(conv_b, sdb, skb, iters=3)
        v_batch = BATCH_B * BATCH_HW * BATCH_HW * N / 1e9 / t_batch
        del sdb, skb, bdata

        # BASELINE configs[4]: DPM/HOG detection — 4K image → HOG features
        # (512²×31, bf16) → 1000+ filter bank, fp32 spectral accumulation.
        from cuda_fft_convolution_tpu.models import hog_features

        img4k = jnp.asarray(
            rng.standard_normal((IMG4K, IMG4K)).astype(np.float32)
        )
        feats = jax.jit(
            lambda im: hog_features(im, cell=8, bins=31).astype(jnp.bfloat16)
        )(img4k)
        jax.block_until_ready(feats)
        del img4k
        FD = 31
        dpm_bank = jnp.asarray(
            rng.standard_normal((NK, KD, KD, FD)).astype(np.float32)
        )
        dpm_gpixf = feats.shape[0] * feats.shape[1] * NK / 1e9

        # giant-bank DIRECT engine first, while HBM is least fragmented
        # (round-1 OOM config: ~9 GB of F=31 bank spectra at the full 540²
        # FFT size — runnable now that spectra are donatable split-f32
        # planes), reference-parity fftmap output. Drain the async queue
        # and collect garbage first: buffers del'd above are only freed
        # once their queued work completes, and the bank needs most of HBM.
        import gc

        gc.collect()
        np.asarray(_probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
        # NKD=576, bf16 serving tier: resident spectra store FLAT
        # (lane-packed, fft_kernels storage='auto') AND bfloat16 — flat
        # packing kills the 1.43× (8,128)-tile padding of (540, 271)
        # planes (capped round 2 at 224 f32 kernels), and the bf16 tier
        # halves the remaining bytes: 576 kernels resident in the HBM
        # that held 288 f32 ones (~10.5 GB), with the traffic-bound MAC
        # reading half the bytes per kernel (the config's declared "bf16
        # inputs, fp32 spectral accumulation"). The planner chunks the
        # call (store_bytes-aware) and the chunked MAC runs the upcast
        # lowering — measured 82.9 ms/call, 72.4 streamed
        # (perf/diag_bf16d.py) vs round 2's f32 0.867 GPix·F/s.
        sdf = fc.fft_data(
            feats.astype(jnp.float32), KD, KD, store_dtype="bfloat16"
        )
        skf = fc.fft_kernels(
            dpm_bank[:NKD], spectral=sdf, store_dtype="bfloat16"
        )
        # true queue drain (block_until_ready returns early on axon): the
        # conv must not enqueue on top of still-executing bank transforms
        np.asarray(_probed(lambda a: a[0, 0, :16])(skf.re)[0])
        bank_gb = 2 * skf.re.size * skf.re.dtype.itemsize / 1e9
        conv_gd = _probed(lambda s, k: fc.conv_spectral(s, k, mode="fftmap"))
        t_gd = _time_fn(conv_gd, sdf, skf, iters=2)
        v_dpm_direct = feats.shape[0] * feats.shape[1] * NKD / 1e9 / t_gd
        # steady-state serving counterpart (dispatches pipelined, sync
        # every 6th call — the streams variant's latency-hiding goal,
        # src/cudaConvFFTDataStreams.cu:292-327). The bf16 bank (5.2 GB,
        # half the f32 tier) leaves room for the deeper pipeline's
        # in-flight map sets (perf/diag_stream_depth.py: sync6 = 2.55 vs
        # sync2 = 2.15); the per-call run's buffers must have actually
        # been released — drain the queue and collect first.
        gc.collect()
        np.asarray(_probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
        t_gds = _time_fn(conv_gd, sdf, skf, iters=12, sync_every=6)
        v_dpm_direct_stream = (
            feats.shape[0] * feats.shape[1] * NKD / 1e9 / t_gds
        )
        del sdf, skf

        # tiled amortized serving path (the production detector loop);
        # drain the giant-bank config's queued frees first
        gc.collect()
        np.asarray(_probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
        # bf16 serving tier (the config's declared dtype): block spectra
        # and bank stored bf16, f32 accumulation — measured 82.2 → 69.3 ms
        # vs the fp32 tier on this config (perf/diag_bf16.py)
        sdd = fc.fft_data_tiled(
            feats, KD, KD, trim_mode="same", store_dtype="bfloat16"
        )
        skd = fc.fft_kernels(
            dpm_bank, spectral=sdd, store_dtype="bfloat16"
        )
        jax.block_until_ready((sdd.re, skd.re))
        conv_dpm = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_dpm = _time_fn(conv_dpm, sdd, skd, iters=3)
        v_dpm = dpm_gpixf / t_dpm
        # detector serving steady state: pipelined dispatch, sync every 9th
        # frame — the bf16 bank's halved residency affords the deeper
        # pipeline (perf/diag_stream_depth.py: sync9 38.4 ms/frame = 6.98
        # vs sync3 45.7 = 5.87; device-side is ~34 ms, so depth 9 leaves
        # ~3.7 ms of residual RTT per frame)
        t_dpms = _time_fn(conv_dpm, sdd, skd, iters=18, sync_every=9)
        v_dpm_stream = dpm_gpixf / t_dpms
        # bf16 OUTPUT maps (out_dtype='bfloat16', round 4j): the F=31
        # pipeline is traffic-bound at its f32 roofline — casting the maps
        # bf16 halves the final write + reassembly bytes AND halves the
        # in-flight set per frame (1.07 → 0.54 GB), affording a deeper
        # pipeline (sync 12 fits where f32 capped at 9). Score rounding
        # ~4e-3 — the detection serving tier's envelope.
        conv_dpmb = _probed(
            lambda s, k: fc.conv_spectral(
                s, k, mode="same", out_dtype="bfloat16"
            )
        )
        t_dpmb = _time_fn(conv_dpmb, sdd, skd, iters=24, sync_every=12)
        v_dpm_bf16out = dpm_gpixf / t_dpmb
        del sdd, skd, feats, dpm_bank

        # Detection head (round 4): per-kernel top-1 peaks over the
        # headline config at the bf16 serving tier. At the fused roofline
        # the OUTPUT MAPS are the dominant HBM traffic (~1.68 GB/call ≈
        # 6 ms write floor); the peaks variant of the fused kernel
        # reduces each output cell in VMEM and writes only the block-max
        # pyramid — the row reports equivalent GPix·F/s against the same
        # work the maps rows do (peak-parity pinned in tests/test_detect).
        from cuda_fft_convolution_tpu.models import detect_peaks as _dp

        _gc.collect()
        np.asarray(_probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
        # peaks-head plan (taller cells than the tier's conv plan:
        # runtime/autotune.py "peaks" entries, perf/r4b_peaks.py)
        from cuda_fft_convolution_tpu.ops.tiled import (
            choose_block_plan as _cbp,
        )

        _pk_plan = _cbp(H, W, KH, KW, store_dtype="bfloat16", head="peaks")
        _pkh_kw = dict(trim_mode="same", store_dtype="bfloat16")
        if _pk_plan is not None:
            _lh, _lw, _pkh, _pkw = _pk_plan
            sdp = fc.fft_data_tiled(
                data, _pkh, _pkw, block_h=_lh, block_w=_lw,
                trim_kernel_h=KH, trim_kernel_w=KW, **_pkh_kw
            )
        else:
            sdp = fc.fft_data_tiled(data, KH, KW, **_pkh_kw)
        skp = fc.fft_kernels(
            kernels, spectral=sdp, store_dtype="bfloat16",
            storage="planar", correlation=True,
        )
        jax.block_until_ready((sdp.re, skp.re))
        peaks_fn = _probed(lambda s, k: _dp(s, k, mode="same"))
        t_pk = _time_fn(peaks_fn, sdp, skp, iters=3)
        v_peaks = gpix_filters / t_pk
        t_pks = _time_fn(peaks_fn, sdp, skp, iters=18, sync_every=9)
        v_peaks_stream = gpix_filters / t_pks
        peaks_stream_ms = t_pks * 1e3
        # End-to-end CONSUMPTION: a detection consumer fetches results to
        # host. Peaks fetch the full (vals, pos) tuples; the maps
        # equivalent is estimated from ONE kernel's map × N (fetching all
        # N maps = N·H·W·4 bytes through the tunnel takes seconds — the
        # ×N scaling is labeled an estimate).
        import time as _t

        pprobe, (pvv, ppv) = peaks_fn(sdp, skp)
        np.asarray(pprobe)  # true sync: compute done, fetch timed alone
        t0f = _t.perf_counter()
        np.asarray(pvv), np.asarray(ppv)
        peaks_fetch_ms = (_t.perf_counter() - t0f) * 1e3
        conv_pkplan = _probed(
            lambda s, k: fc.conv_spectral(s, k, mode="same")
        )
        mprobe, maps_out = conv_pkplan(sdp, skp)
        np.asarray(mprobe)
        t0f = _t.perf_counter()
        np.asarray(maps_out[0])
        maps_fetch_est_ms = (_t.perf_counter() - t0f) * 1e3 * N
        del maps_out, pvv, ppv
        del sdp, skp

        # fp32 peaks (round 4g): the default-precision detection head now
        # runs the v5 DIF peaks kernel at its (256,512) plan
        # (_BUILTIN_RADIX_W_PEAKS — 18.4 vs 21.2 ms/frame streamed at
        # the previous v4 plan, perf/r4g2_v5_peaks_api.py)
        _pk32 = _cbp(H, W, KH, KW, store_dtype="float32", head="peaks")
        if _pk32 is not None:
            _lh, _lw, _pkh, _pkw = _pk32
            sdp32 = fc.fft_data_tiled(
                data, _pkh, _pkw, block_h=_lh, block_w=_lw,
                trim_mode="same", trim_kernel_h=KH, trim_kernel_w=KW,
            )
        else:
            sdp32 = fc.fft_data_tiled(data, KH, KW, trim_mode="same")
        skp32 = fc.fft_kernels(
            kernels, spectral=sdp32, storage="planar", correlation=True,
        )
        jax.block_until_ready((sdp32.re, skp32.re))
        t_pk32 = _time_fn(peaks_fn, sdp32, skp32, iters=18, sync_every=9)
        v_peaks_f32_stream = gpix_filters / t_pk32
        peaks_f32_stream_ms = t_pk32 * 1e3
        del sdp32, skp32

        # BASELINE configs[1]: small mixed-size filter bank sharing ONE
        # data FFT (the reference's cell-array scenario,
        # demoCudaConvolutionFFT.m:41-43) — 512² image × 16 kernels of 4
        # sizes; fft_conv buckets by shape, one data FFT per bucket size.
        rag_data = jnp.asarray(
            rng.standard_normal((512, 512, F)).astype(np.float32)
        )
        rag_cells = [
            jnp.asarray(
                rng.standard_normal((k, k, F)).astype(np.float32)
            )
            for k in (9, 17, 33, 64) for _ in range(4)
        ]
        jax.block_until_ready(rag_data)
        rag_fn = _probed(
            lambda d: jnp.concatenate([
                jnp.ravel(o) for o in fc.fft_conv(
                    d, kernels=rag_cells, mode="same"
                )
            ])
        )
        t_rag = _time_fn(rag_fn, rag_data, iters=3)
        v_ragged = (512 * 512 * len(rag_cells) / 1e9) / t_rag
        # steady-state counterpart (round 5): the serving RUNTIME, not
        # the one-shot API — RaggedConvStream holds per-shape-group AOT
        # plans with the bank spectra resident (the round-4 row re-ran
        # fft_conv per frame: per-bucket bank FFTs recomputed every
        # frame) and compiles every group's pipeline + completion probe
        # into ONE fused dispatch per frame (perf/r5d_ragged_diag.py:
        # split dispatches cost ~14 ms/frame of pure overhead here).
        # direct group plans measured 4.43 vs 8.88 ms/frame tiled at
        # these sizes; depth/sync 12 — the 16-cell frame's in-flight set
        # is only ~16 MB, so the deeper pipeline is nearly free.
        rag_stream = fc.RaggedConvStream(
            (512, 512, F), rag_cells, depth=12, algorithm="direct",
            mode="same",
        )
        t_rags = _time_stream(
            rag_stream, rag_data, iters=24, sync_every=12
        )
        v_ragged_stream = (512 * 512 * len(rag_cells) / 1e9) / t_rags
        rag_stream.flush()
        del rag_data, rag_cells, rag_stream

        # F=8 fused serving row: the round-4a sweep's admitted F≥8 bf16
        # envelope exercised through dispatch (1024² × 64 kernels of 32²,
        # F=8, bf16 tier — autotune entry (64,64,8,'bf16')).
        f8_data = jnp.asarray(
            rng.standard_normal((1024, 1024, 8)).astype(np.float32)
        )
        f8_bank = jnp.asarray(
            rng.standard_normal((64, 32, 32, 8)).astype(np.float32)
        )
        sd8 = fc.fft_data_tiled(
            f8_data, 32, 32, trim_mode="same", store_dtype="bfloat16"
        )
        sk8 = fc.fft_kernels(
            f8_bank, spectral=sd8, store_dtype="bfloat16",
            storage="planar",
        )
        jax.block_until_ready((sd8.re, sk8.re))
        f8_fn = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_f8 = _time_fn(f8_fn, sd8, sk8, iters=18, sync_every=9)
        v_dpmf8_stream = (1024 * 1024 * 64 / 1e9) / t_f8
        del sd8, sk8, f8_data, f8_bank

        # BASELINE configs[2]: large-kernel regime, 2048² × a bank of 16
        # 512² kernels (FFT-vs-direct crossover). The auto engine tiles at
        # (1023, 1024) blocks (measured 66.8 ms vs direct-CT 85.2 and
        # direct-XLA-FFT 100.8 on v5e); the direct fallback at the 2560²
        # FFT size runs the two-stage Cooley–Tukey MXU transform
        # (ops/dft.py) — beyond round 2's 2304-axis cap. Measured LAST in
        # the run SINCE ROUND 4: rounds 2-3 saw a deterministic ~4×
        # allocator degradation when this ~8 GB-peak config ran late
        # (225 vs 55-65 ms, bisecting to no single predecessor —
        # perf/bisect_bigk*.py) and the bench hid it by running bigk
        # first; perf/bigk_late_mitigations.py (round 4, 2026-08-19)
        # measured the degradation GONE on the current runtime (48-61 ms
        # after a bench-shaped prefix). Keeping the config in its natural
        # late position makes this row the regression sentinel users
        # actually experience.
        _gc.collect()
        np.asarray(_probed(lambda x: x + 1.0)(jnp.ones((8, 128)))[0])
        kbig = jnp.asarray(
            rng.standard_normal((NB, BIGK, BIGK, F)).astype(np.float32)
        )
        bigk_shot = _probed(
            lambda d, k: fc.fft_conv(d, BIGK, BIGK, k, mode="same")
        )
        t_bigk = _time_fn(bigk_shot, data, kbig, iters=3)
        v_bigk = H * W * NB / 1e9 / t_bigk
        # serving counterpart: data spectra amortized, dispatch pipelined
        # (sync every 8th call) — the one-shot number is ~55% tunnel RTT
        # (depth sweep perf/diag_stream_depth2.py: sync8 27.6 ms/call =
        # 2.43 vs sync2 39.1 = 1.72)
        sdbk = fc.fft_data_tiled(data, BIGK, BIGK, trim_mode="same")
        skbk = fc.fft_kernels(kbig, spectral=sdbk)
        jax.block_until_ready((sdbk.re, skbk.re))
        conv_bk = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_bigks = _time_fn(conv_bk, sdbk, skbk, iters=16, sync_every=8)
        v_bigk_stream = H * W * NB / 1e9 / t_bigks
        del kbig, sdbk, skbk

    # --- algorithm-independent HBM floor: any implementation must at least
    # read the image, read the bank, and write N 'same' maps.
    floor_bytes = (
        H * W * F * 4 + N * KH * KW * F * 4 + N * H * W * 4
    )
    floor_s = floor_bytes / (_device_hbm_gbps() * 1e9)
    roofline = gpix_filters / floor_s

    fft_h, fft_w = compute_fft_size(H, W, KH, KW, "fast")
    # Device-side view of the headline: the tunnel RTT (measured above, a
    # harness property — a plain PCIe/gRPC host pays ~1 ms) subtracted
    # from the per-call wall time. The pipelined 'streaming' number is the
    # fully-measured counterpart (RTT amortized over in-flight calls).
    rtt_s = _rtt_floor()
    v_device = gpix_filters / max(t_head - rtt_s, 1e-9)
    result = {
        "metric": "GPix*filters/s, one-shot fft_conv (jit-fused, auto engine), "
                  "2048^2 image x 100 64x64 kernels, fp32, 'same' maps",
        "value": round(v_head, 3),
        "unit": "GPix*filters/s",
        "vs_baseline": round(v_head / roofline, 4),
        "detail": {
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
            "headline_ms": round(t_head * 1e3, 3),
            "sync_rtt_floor_ms": round(rtt_s * 1e3, 3),
            "headline_minus_rtt_GPixF_s": round(v_device, 3),
            "amortized_tiled_GPixF_s": round(v_tiled, 3),
            "amortized_tiled_ms": round(t_tiled * 1e3, 3),
            "streaming_tiled_GPixF_s": round(v_stream, 3),
            "hbm_floor_GPixF_s": round(roofline, 3),
            "direct_fft_size": [fft_h, fft_w],
            "max_rel_err_vs_f64_fft": float(f"{err:.3e}"),
            # full-run configs (BENCH_QUICK=1 skips → null):
            "fftmap_parity_GPixF_s": None if v_fftmap is None else round(v_fftmap, 3),
            "amortized_direct_GPixF_s": None if v_amort is None else round(v_amort, 3),
            "bf16_GPixF_s": None if v_bf16 is None else round(v_bf16, 3),
            "bf16_streaming_GPixF_s": (
                None if v_bf16_stream is None else round(v_bf16_stream, 3)
            ),
            # composed serving tier: bf16 spectra + bf16 output maps
            "bf16_bf16out_streaming_GPixF_s": (
                None if v_bf16out_stream is None
                else round(v_bf16out_stream, 3)
            ),
            "batch8_1024_GPixF_s": None if v_batch is None else round(v_batch, 3),
            "bigkernel_512_GPixF_s": None if v_bigk is None else round(v_bigk, 3),
            # device-side view (round-4 VERDICT weak #6): the one-shot
            # row minus the measured tunnel RTT — the residue between
            # this and the streamed row is dispatch-side host work
            "bigkernel_512_minus_rtt_GPixF_s": (
                None if t_bigk is None
                else round(H * W * NB / 1e9 / max(t_bigk - rtt_s, 1e-9), 3)
            ),
            "bigkernel_streaming_GPixF_s": (
                None if v_bigk_stream is None else round(v_bigk_stream, 3)
            ),
            "dpm_hog_bf16_1024f_GPixF_s": None if v_dpm is None else round(v_dpm, 3),
            "dpm_hog_streaming_GPixF_s": (
                None if v_dpm_stream is None else round(v_dpm_stream, 3)
            ),
            # bf16 output-maps serving tier (out_dtype, round 4j)
            "dpm_hog_bf16out_stream_GPixF_s": (
                None if v_dpm_bf16out is None else round(v_dpm_bf16out, 3)
            ),
            "detect_peaks_bf16_GPixF_s": (
                None if v_peaks is None else round(v_peaks, 3)
            ),
            "detect_peaks_bf16_stream_GPixF_s": (
                None if v_peaks_stream is None else round(v_peaks_stream, 3)
            ),
            "detect_peaks_bf16_stream_ms_frame": (
                None if peaks_stream_ms is None else round(peaks_stream_ms, 2)
            ),
            # fp32 default-precision peaks (v5 DIF peaks plan, round 4g)
            "detect_peaks_f32_stream_GPixF_s": (
                None if v_peaks_f32_stream is None
                else round(v_peaks_f32_stream, 3)
            ),
            "detect_peaks_f32_stream_ms_frame": (
                None if peaks_f32_stream_ms is None
                else round(peaks_f32_stream_ms, 2)
            ),
            # end-to-end consumption: fetching results to host (the maps
            # figure is ONE map's fetch × N — labeled estimate)
            "peaks_result_fetch_ms": (
                None if peaks_fetch_ms is None else round(peaks_fetch_ms, 2)
            ),
            "maps_result_fetch_est_ms": (
                None if maps_fetch_est_ms is None
                else round(maps_fetch_est_ms, 1)
            ),
            # BASELINE configs[1]: 512² × 16 mixed-size cell bank
            "ragged_bank16_GPixF_s": (
                None if v_ragged is None else round(v_ragged, 3)
            ),
            "ragged_bank16_stream_GPixF_s": (
                None if v_ragged_stream is None
                else round(v_ragged_stream, 3)
            ),
            # F=8 bf16 fused serving (round-4a admitted envelope)
            "dpm_f8_bf16_stream_GPixF_s": (
                None if v_dpmf8_stream is None else round(v_dpmf8_stream, 3)
            ),
            "dpm_direct_giantbank_GPixF_s": (
                None if v_dpm_direct is None else round(v_dpm_direct, 3)
            ),
            "dpm_direct_minus_rtt_GPixF_s": (
                None if t_gd is None
                else round(
                    IMG4K // 8 * (IMG4K // 8) * NKD / 1e9
                    / max(t_gd - rtt_s, 1e-9),
                    3,
                )
            ),
            "dpm_direct_streaming_GPixF_s": (
                None if v_dpm_direct_stream is None
                else round(v_dpm_direct_stream, 3)
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
