"""Sharded filter-bank convolution over a device mesh.

Strategy (the reference's multi-GPU intent, done the TPU way — SURVEY.md §2
parallelism table + §5 "distributed communication backend"):

  - **kernel axis**: the filter bank (N axis) is sharded across devices —
    the declarative form of the reference's round-robin of kernels over
    GPUs (src/cudaConvFFTDataStreams.cu:341-349).
  - **data axis**: the image batch (B axis) is sharded across devices —
    classic data parallelism (no reference analogue; it is single-image).
  - The data spectrum is *replicated* along the kernel axis — what the
    reference does imperatively with cudaMemcpyPeerAsync (:279-289), XLA
    expresses as an all-gather/broadcast over ICI inserted automatically
    from the sharding specs.

Each device then runs the identical single-device program (fused spectral
MAC + inverse FFT) on its bank shard; results come back sharded over
(data, kernels) with zero cross-device math — bank convolution is
embarrassingly parallel over kernels, so scaling is linear in devices as
long as the replicated data FFT fits HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda_fft_convolution_tpu import api as _api
from cuda_fft_convolution_tpu.ops.conv import irfft2_norm
from cuda_fft_convolution_tpu.ops.spectral_mac import spectral_mac_auto
from cuda_fft_convolution_tpu.ops.tiled import conv_blocks
from cuda_fft_convolution_tpu.types import (
    SpectralData,
    SpectralKernels,
    TiledSpectralData,
)
from cuda_fft_convolution_tpu.utils.errors import validate

DATA_AXIS = "data"
KERNEL_AXIS = "kernels"


def make_mesh(
    data: int = 1,
    kernels: int | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, kernels) mesh. ``kernels=None`` → use all remaining
    devices on the kernel axis (bank sharding is the primary scaling axis
    for this workload, as in the reference's kernel round-robin)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if kernels is None:
        validate(n % data == 0, f"{n} devices not divisible by data={data}")
        kernels = n // data
    validate(
        data * kernels == n,
        f"mesh {data}x{kernels} != {n} available devices",
    )
    dev_mesh = mesh_utils.create_device_mesh((data, kernels), devices=devices)
    return Mesh(dev_mesh, (DATA_AXIS, KERNEL_AXIS))


def _pad_bank(kfft: jnp.ndarray, shards: int) -> tuple[jnp.ndarray, int]:
    """Zero-pad the bank axis to a multiple of the kernel-axis size.

    Zero kernels convolve to zero maps — results are trimmed after. (The
    reference's round-robin simply leaves trailing slots idle,
    src/cudaConvFFTDataStreams.cu:353-360.)"""
    n = kfft.shape[0]
    n_pad = -(-n // shards) * shards
    if n_pad != n:
        kfft = jnp.pad(kfft, ((0, n_pad - n),) + ((0, 0),) * (kfft.ndim - 1))
    return kfft, n


def shard_kernel_bank(sk: SpectralKernels, mesh: Mesh) -> SpectralKernels:
    """Place a kernel bank's spectra sharded over the mesh's kernel axis
    (pad-to-divisible included). Amortizes bank placement across calls."""
    kshards = mesh.shape[KERNEL_AXIS]
    kfft, _ = _pad_bank(sk.fft, kshards)
    sharding = NamedSharding(mesh, P(KERNEL_AXIS, None, None, None))
    return SpectralKernels(
        fft=jax.device_put(kfft, sharding),
        fft_h=sk.fft_h,
        fft_w=sk.fft_w,
        kernel_hs=sk.kernel_hs,
        kernel_ws=sk.kernel_ws,
    )


def conv_spectral_sharded(
    spectral: SpectralData,
    kernels,
    mesh: Mesh,
    *,
    mode: str = "fftmap",
    correlation: bool = False,
    use_pallas: bool | None = None,
):
    """Bank convolution sharded over ``mesh`` — the multi-device
    ``conv_spectral``.

    Data spectrum: replicated along the kernel axis, sharded over the data
    axis when batched. Kernel bank: sharded over the kernel axis. Output maps
    come back sharded over (data, kernels) — downstream sharded consumers
    (e.g. detection NMS per filter) never gather them.

    Accepts a ``TiledSpectralData`` too: the overlap-save engine runs
    per-device on the bank shard (block spectra replicated like the direct
    spectrum)."""
    if isinstance(kernels, SpectralKernels):
        sk = kernels
        validate(not correlation, "correlation must be baked into fft_kernels "
                 "when passing SpectralKernels")
    else:
        sk = _api.fft_kernels(kernels, spectral=spectral, correlation=correlation)
    tiled = isinstance(spectral, TiledSpectralData)
    if tiled:
        validate(
            mode != "fftmap",
            "mode='fftmap' requires the direct engine (tiled spectra hold "
            "linear-convolution blocks only)",
        )
        validate(
            sk.fft_h == spectral.block_h and sk.fft_w == spectral.block_w,
            "SpectralKernels FFT dims do not match the tiled block dims",
        )
    else:
        validate(
            sk.fft_h == spectral.fft_h and sk.fft_w == spectral.fft_w,
            "SpectralKernels FFT dims do not match SpectralData",
        )

    batched = spectral.batched
    dfft = spectral.fft if batched else spectral.fft[None]
    b = dfft.shape[0]
    dshards = mesh.shape[DATA_AXIS]
    kshards = mesh.shape[KERNEL_AXIS]
    validate(
        b % dshards == 0,
        f"batch {b} not divisible by data-axis size {dshards}",
    )

    kfft, n = _pad_bank(sk.fft, kshards)

    dspec = P(*([DATA_AXIS] + [None] * (dfft.ndim - 1)))
    kspec = P(KERNEL_AXIS, None, None, None)
    dfft = jax.device_put(dfft, NamedSharding(mesh, dspec))
    kfft = jax.device_put(kfft, NamedSharding(mesh, kspec))

    if tiled:
        bh, bw = spectral.block_h, spectral.block_w
        mkh, mkw = spectral.max_kh, spectral.max_kw
        oh, ow = spectral.out_h, spectral.out_w

        def _local_conv(dfft_shard, kfft_shard):
            # Per-device overlap-save on this device's bank shard; the block
            # spectra are replicated along the kernel axis via their
            # PartitionSpec (≈ the reference's peer-copy of the data FFT,
            # src/cudaConvFFTDataStreams.cu:279-289, as a sharding).
            return conv_blocks(
                dfft_shard, kfft_shard, bh, bw, mkh, mkw, oh, ow, use_pallas
            )
    else:
        fft_h, fft_w = spectral.fft_h, spectral.fft_w

        def _local_conv(dfft_shard, kfft_shard):
            # Per-device body: the exact single-device program on this
            # device's (batch-shard × bank-shard) block. No collectives —
            # bank convolution is embarrassingly parallel once the data
            # spectrum is in place; the replication of dfft along the kernel
            # axis is expressed by its PartitionSpec and rides ICI.
            prod = spectral_mac_auto(
                dfft_shard, kfft_shard, use_pallas=use_pallas
            )
            return irfft2_norm(prod, fft_h, fft_w)

    _sharded_conv = jax.jit(
        jax.shard_map(
            _local_conv,
            mesh=mesh,
            in_specs=(dspec, kspec),
            out_specs=P(DATA_AXIS, KERNEL_AXIS, None, None),
        )
    )

    maps = _sharded_conv(dfft, kfft)[:, :n]
    return _api._trim(maps, spectral, sk.kernel_hs, sk.kernel_ws, mode, batched)
