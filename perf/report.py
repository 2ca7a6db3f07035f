"""Roofline report: BENCH_r*.json → per-config throughput vs the floors.

Two floors per config:
  - nominal: HBM datasheet bandwidth (819 GB/s on v5e) — the
    algorithm-independent bound bench.py's ``vs_baseline`` uses;
  - measured: the ~281 GB/s this runtime actually sustains
    (perf/calibrate.py) — the achievable bound through the tunnel.

Usage: python perf/report.py [BENCH_r03.json ...]   (default: all BENCH_r*)
"""

from __future__ import annotations

import glob
import json
import sys

NOMINAL_GBPS = 819.0
MEASURED_GBPS = 281.0  # perf/calibrate.py write bandwidth through axon

# config -> (bytes moved at the floor, pixel*filters) per call
_GPF = 2048 * 2048 * 100 / 1e9


def _floor_gpixfs(h, w, n, kh, kw, f, out_h=None, out_w=None, io_bytes=4):
    oh, ow = out_h or h, out_w or w
    floor_bytes = h * w * f * io_bytes + n * kh * kw * f * io_bytes + n * oh * ow * 4
    return (h * w * n / 1e9) / (floor_bytes / (MEASURED_GBPS * 1e9))


CONFIGS = {
    "value": ("headline one-shot 2048²×100×64²", _floor_gpixfs(2048, 2048, 100, 64, 64, 1)),
    "streaming_tiled_GPixF_s": ("headline streaming", _floor_gpixfs(2048, 2048, 100, 64, 64, 1)),
    "bf16_GPixF_s": ("bf16 tier one-shot", _floor_gpixfs(2048, 2048, 100, 64, 64, 1, io_bytes=2)),
    "bf16_streaming_GPixF_s": ("bf16 tier streaming", _floor_gpixfs(2048, 2048, 100, 64, 64, 1, io_bytes=2)),
    "bigkernel_512_GPixF_s": ("512² kernels one-shot", _floor_gpixfs(2048, 2048, 16, 512, 512, 1)),
    "bigkernel_streaming_GPixF_s": ("512² kernels streaming", _floor_gpixfs(2048, 2048, 16, 512, 512, 1)),
    "dpm_hog_bf16_1024f_GPixF_s": ("DPM tiled 512²×31×1024", _floor_gpixfs(512, 512, 1024, 12, 12, 31, io_bytes=2)),
    "dpm_hog_streaming_GPixF_s": ("DPM tiled streaming", _floor_gpixfs(512, 512, 1024, 12, 12, 31, io_bytes=2)),
    "dpm_direct_giantbank_GPixF_s": ("DPM direct 576 bank", _floor_gpixfs(512, 512, 576, 12, 12, 31, 540, 540, io_bytes=2)),
    "dpm_direct_streaming_GPixF_s": ("DPM direct streaming", _floor_gpixfs(512, 512, 576, 12, 12, 31, 540, 540, io_bytes=2)),
    "fftmap_parity_GPixF_s": ("fftmap parity (auto: tiled canvas)", _floor_gpixfs(2048, 2048, 100, 64, 64, 1, 2160, 2160)),
    "batch8_1024_GPixF_s": ("batch 8 × 1024²", _floor_gpixfs(1024, 1024, 100, 64, 64, 1)),
    # (the detect_peaks_* rows are deliberately absent: with no output
    # maps the head is MXU-bound, so a traffic floor is meaningless —
    # PERF.md round 4c/4g report them as ms/frame vs the conv rows)
}


def report(path: str) -> None:
    with open(path) as fh:
        rec = json.load(fh)
    parsed = rec.get("parsed", rec)
    detail = dict(parsed.get("detail", {}))
    detail["value"] = parsed.get("value")
    print(f"\n== {path} ==")
    print(f"{'config':<28} {'GPix·F/s':>9} {'floor':>8} {'% of floor':>10}")
    for key, (name, floor) in CONFIGS.items():
        v = detail.get(key)
        if v is None:
            continue
        print(f"{name:<28} {v:>9.2f} {floor:>8.1f} {100 * v / floor:>9.1f}%")


if __name__ == "__main__":
    paths = sys.argv[1:] or sorted(glob.glob("BENCH_r*.json"))
    for p in paths:
        report(p)
