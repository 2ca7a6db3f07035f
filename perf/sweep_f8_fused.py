#!/usr/bin/env python
"""Sweep the F>=8 fused-gate territory: fused Pallas block-conv vs the
unfused pipeline at every analytic geometry the legality gate admits for
F in {8, 16, 31}, at both storage tiers.

Why: the fused auto-dispatch condition in ops/tiled.py is pure legality
(alignment + fits_vmem), validated by measurement only at F=1 (PERF.md).
The bf16 tier's halved spec bytes widen fits_vmem into F>=8 shapes nobody
has timed; the closed F=31 argument (kernel-spectra refetch bill) says
fused should LOSE as F and N grow — this sweep decides whether the gate
needs an F cap.

Run attached to the TPU; first-time fused shapes are sibling Mosaic
compiles (1-4 min each through the remote service).
"""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc


def probed(fn):
    def w(*a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4].astype(jnp.float32), out
    return jax.jit(w)


def tfn(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        p, _ = fn(*a)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*a)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(7)
H = Wd = 1024
N = 64

CASES = [  # (F, K) — every combination the analytic gate admits somewhere,
    # plus F=2/4 to locate where the fused kernel stops winning (the
    # traffic model says the fused d-refetch bill scales as F×product
    # round-trip: fused should win only while MXU-bound, i.e. small F)
    (2, 64), (4, 64), (8, 64), (16, 64),
    (2, 32), (4, 32), (8, 32), (16, 32), (31, 32),
    (8, 48), (16, 48), (31, 48),
]

from cuda_fft_convolution_tpu.ops.block_conv import block_conv_fits_vmem
from cuda_fft_convolution_tpu.ops.tiled import choose_block_fft

for F, K in CASES:
    data = jnp.asarray(rng.standard_normal((H, Wd, F)).astype(np.float32))
    bank = jnp.asarray(
        rng.standard_normal((N, K, K, F)).astype(np.float32)
    )
    gpixf = H * Wd * N / 1e9
    for dt in ("float32", "bfloat16"):
        drain()
        sd = fc.fft_data_tiled(data, K, K, trim_mode="same", store_dtype=dt)
        sk = fc.fft_kernels(bank, spectral=sd, store_dtype=dt)
        jax.block_until_ready((sd.re, sk.re))
        row = {"F": F, "K": K, "tier": dt}
        # forcing fused bypasses the fits_vmem legality check — guard it
        # here so an over-VMEM shape can't Mosaic-abort the sweep
        plan = choose_block_fft(H, Wd, K, K, matmul_engine=True,
                                feature_dim=F, _with_plan=True)
        lh, lw, pkh, pkw = plan
        legal = block_conv_fits_vmem(
            F, lh, lw // 2 + 1, lh - pkh + 1, lw - pkw + 1,
            2 if dt == "bfloat16" else 4,
        )
        row["blocks"] = [lh, lw]
        outs = {}
        for label, force in (("unfused", False), ("fused", True)):
            if force and not legal:
                row["fused_ms"] = "vmem-illegal"
                continue
            fc.set_config(use_fused_block_conv=force)
            # fresh outer jit per force setting: set_config clears the
            # REGISTERED inner jit caches (conv_blocks), but a reused outer
            # wrapper would keep serving its first trace
            conv = probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
            try:
                t = tfn(conv, sd, sk)
            except Exception as e:  # noqa: BLE001 — record and move on
                row[label + "_err"] = repr(e)[:120]
                continue
            row[label + "_ms"] = round(t, 1)
            row[label + "_gpixf"] = round(gpixf / (t / 1e3), 2)
            _, outs[label] = conv(sd, sk)
        fc.set_config(use_fused_block_conv=None)
        if "fused" in outs and "unfused" in outs:
            scale = jax.jit(lambda o: jnp.max(jnp.abs(o)))(outs["unfused"])
            rel = jax.jit(
                lambda a, b, s: jnp.max(jnp.abs(a - b)) / s
            )(outs["fused"], outs["unfused"], scale)
            row["fused_vs_unfused_rel"] = float(np.asarray(rel))
        emit(**row)
        del sd, sk, outs
        drain()
    del data, bank
emit(kind="done")
