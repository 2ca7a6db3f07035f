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

Secondary configs in "detail": reference-parity fftmap one-shot, amortized
(precomputed spectra ≈ cudaFFTData+cudaConvFFTData), tiled amortized
(overlap-save serving path), pipelined big bank, bf16 inputs, and accuracy
vs a float64 CPU FFT oracle.
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


def main() -> None:
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

    rng = np.random.default_rng(0)
    H = W = 2048
    N, KH, KW, F = 100, 64, 64, 1
    data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
    kernels = jnp.asarray(rng.standard_normal((N, KH, KW, F)).astype(np.float32))
    jax.block_until_ready((data, kernels))
    gpix_filters = H * W * N / 1e9

    # --- accuracy vs float64 CPU FFT oracle first, while HBM is empty
    # (512²×8 kernels shares every code path incl. the tiled engine)
    dh = np.asarray(data[:512, :512, :])
    ks = np.asarray(kernels[:8, :, :, :])
    got = np.array(fc.fft_conv(dh, KH, KW, ks, mode="full"))
    oh, ow = 512 + KH - 1, 512 + KW - 1
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
    # spectra precomputed, MAC + windowed MXU-DFT inverse per call)
    sdt = fc.fft_data_tiled(data, KH, KW)
    skt = fc.fft_kernels(kernels, spectral=sdt)
    jax.block_until_ready((sdt.fft, skt.fft))
    conv_t = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
    t_tiled = _time_fn(conv_t, sdt, skt)
    v_tiled = gpix_filters / t_tiled
    # steady-state serving: dispatches pipelined, sync every 3rd call —
    # amortizes the tunnel RTT the per-call numbers include
    t_stream = _time_fn(conv_t, sdt, skt, iters=6, sync_every=3)
    v_stream = gpix_filters / t_stream
    del sdt, skt

    # Secondary configs compile several more whole programs (minutes from a
    # cold compile cache through the remote-compile tunnel) — opt-in.
    full = os.environ.get("BENCH_FULL", "0") == "1"
    v_fftmap = v_amort = v_pipe = v_bf16 = v_batch = None
    if full:
        # reference-parity one-shot: raw circular fftmaps, direct engine
        fftmap_shot = _probed(
            lambda d, k: fc.fft_conv(d, KH, KW, k, mode="fftmap")
        )
        v_fftmap = gpix_filters / _time_fn(fftmap_shot, data, kernels, iters=3)

        # amortized direct: precomputed data + kernel spectra (split API)
        sd = fc.fft_data(data, KH, KW)
        sk = fc.fft_kernels(kernels, spectral=sd)
        jax.block_until_ready((sd.fft, sk.fft))
        conv_d = _probed(lambda s, k: fc.conv_spectral(s, k))
        v_amort = gpix_filters / _time_fn(conv_d, sd, sk, iters=3)

        # pipelined big-bank path (chunked ≈ streams variant)
        conv_p = _probed(
            lambda s, k: fc.conv_spectral_pipelined(s, k, chunk_size=16)
        )
        v_pipe = gpix_filters / _time_fn(conv_p, sd, sk, iters=3)
        del sd, sk

        # bf16 inputs, fp32 spectral accumulation (BASELINE config 5)
        v_bf16 = gpix_filters / _time_fn(
            one_shot, data.astype(jnp.bfloat16), kernels.astype(jnp.bfloat16),
            iters=3,
        )

        # batch of 8 images (BASELINE config 4; 1024² so the (8, 100, H, W)
        # output fits 16 GB HBM)
        bdata = jnp.asarray(
            rng.standard_normal((8, 1024, 1024, F)).astype(np.float32)
        )
        sdb = fc.fft_data_tiled(bdata, KH, KW)
        skb = fc.fft_kernels(kernels, spectral=sdb)
        jax.block_until_ready((sdb.fft, skb.fft))
        conv_b = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
        t_batch = _time_fn(conv_b, sdb, skb, iters=3)
        v_batch = 8 * 1024 * 1024 * N / 1e9 / t_batch
        del sdb, skb, bdata

    # --- algorithm-independent HBM floor: any implementation must at least
    # read the image, read the bank, and write N 'same' maps.
    floor_bytes = (
        H * W * F * 4 + N * KH * KW * F * 4 + N * H * W * 4
    )
    floor_s = floor_bytes / (_device_hbm_gbps() * 1e9)
    roofline = gpix_filters / floor_s

    fft_h, fft_w = compute_fft_size(H, W, KH, KW, "fast")
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
            "sync_rtt_floor_ms": round(_rtt_floor() * 1e3, 3),
            "amortized_tiled_GPixF_s": round(v_tiled, 3),
            "amortized_tiled_ms": round(t_tiled * 1e3, 3),
            "streaming_tiled_GPixF_s": round(v_stream, 3),
            "hbm_floor_GPixF_s": round(roofline, 3),
            "direct_fft_size": [fft_h, fft_w],
            "max_rel_err_vs_f64_fft": float(f"{err:.3e}"),
            # BENCH_FULL=1 extras (null when skipped):
            "fftmap_parity_GPixF_s": None if v_fftmap is None else round(v_fftmap, 3),
            "amortized_direct_GPixF_s": None if v_amort is None else round(v_amort, 3),
            "pipelined_GPixF_s": None if v_pipe is None else round(v_pipe, 3),
            "bf16_GPixF_s": None if v_bf16 is None else round(v_bf16, 3),
            "batch8_1024_GPixF_s": None if v_batch is None else round(v_batch, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
