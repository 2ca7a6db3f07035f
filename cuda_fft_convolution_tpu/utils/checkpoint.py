"""Spectral-state persistence (checkpoint / resume).

SURVEY.md §5: the reference's nearest checkpoint analogue is the
*materialized intermediate* — cudaFFTData's persistent on-device gpuArray
(src/cudaFFTData.cu:97-150) that later calls resume from, but it dies with
the MATLAB session. Here the spectral objects are real checkpoints: any
SpectralData / TiledSpectralData / SpectralKernels saves to one ``.npz``
and loads back on any backend (complex spectra stored as re/im planes, so
the save path never hits runtimes that cannot D2H complex buffers).
Serving systems use this to ship precomputed filter-bank spectra to fleets
instead of re-FFT-ing at startup.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from cuda_fft_convolution_tpu.types import (
    SpectralData,
    SpectralKernels,
    TiledSpectralData,
)
from cuda_fft_convolution_tpu.utils.errors import validate

_KINDS = {
    "SpectralData": SpectralData,
    "TiledSpectralData": TiledSpectralData,
    "SpectralKernels": SpectralKernels,
}


def save_spectral(path: str, obj) -> None:
    """Serialize a spectral object to ``path`` (.npz). Spectra are split
    (re, im) f32 planes in memory already (types.py), so the save is two
    plain f32 D2H copies — no complex transfer exists to go wrong."""
    kind = type(obj).__name__
    validate(kind in _KINDS, f"not a spectral object: {type(obj)}")
    meta = {
        f.name: getattr(obj, f.name)
        for f in dataclasses.fields(obj)
        if f.name not in ("re", "im")
    }
    # bf16-tier spectra persist as f32 planes (npz has no bfloat16) with the
    # store dtype recorded, so a load restores the tier exactly.
    np.savez(
        path,
        kind=kind,
        store_dtype=str(obj.re.dtype),
        fft_re=np.asarray(obj.re, np.float32),
        fft_im=np.asarray(obj.im, np.float32),
        **{
            # None-valued optional ints (e.g. TiledSpectralData.win_h)
            # serialize as -1 (npz has no null scalar)
            k: np.asarray(-1 if v is None else v)
            for k, v in meta.items()
        },
    )


def load_spectral(path: str):
    """Load a spectral object saved by ``save_spectral`` (this version's
    split-plane format or round-1's complex-holding format — the .npz keys
    are identical); spectra land on the default device."""
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["kind"])
        validate(kind in _KINDS, f"unknown spectral kind {kind!r}")
        cls = _KINDS[kind]
        store_t = (
            jnp.bfloat16
            if "store_dtype" in z and str(z["store_dtype"]) == "bfloat16"
            else jnp.float32
        )
        kwargs = {
            "re": jnp.asarray(z["fft_re"], store_t),
            "im": jnp.asarray(z["fft_im"], store_t),
        }
        for f in dataclasses.fields(cls):
            if f.name in ("re", "im", "store_dtype"):
                continue
            if f.name not in z:
                # field added after this file was saved → dataclass default
                continue
            v = z[f.name]
            if v.ndim == 0:
                iv = int(v)
                if iv < 0 and f.default is None:
                    # the save-side None-as-−1 convention applies only to
                    # optional fields; int fields whose sentinel IS −1
                    # (e.g. SpectralData.band_h 'unknown') load verbatim
                    kwargs[f.name] = None
                elif f.type in ("bool", bool):
                    kwargs[f.name] = bool(iv)
                else:
                    kwargs[f.name] = iv
            else:
                kwargs[f.name] = tuple(int(x) for x in v)
        return cls(**kwargs)
