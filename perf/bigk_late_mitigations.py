#!/usr/bin/env python
"""Round-4 item 3: mitigate the late-in-sequence big-kernel degradation in
the LIBRARY, not the bench.

Known state (round 3, perf/bisect_bigk*.py): the 2048²×16×512² tiled
config measures ~49-65 ms/call when run early, deterministically ~225 ms
when run late in a bench-shaped sequence; no single predecessor bisects —
it is allocator/arena state, not one bad neighbor. The bench works around
it by ordering; a user running big kernels after other work inherits the
4×.

This script dirties the allocator exactly like the bench prefix (headline
accuracy → one-shot → amortized/streaming rows), then measures the bigk
config repeatedly under candidate mitigations, emitting one JSON line per
measurement:

  late_baseline     — bigk after the prefix, current drain (gc + dummy)
  repeat            — 2nd/3rd measurement of the SAME executable (is the
                      cost per-execution or first-execution?)
  fresh_operands    — device_put fresh copies of spectra (re-layout)
  chunked           — set_config(chunk_size=4): smaller temporary peak
  balloon           — allocate+free a ~6 GB dummy between prefix and bigk
                      (arena high-water forced early, then released)
  early_control     — same plan at process start measured in a SECOND
                      process would be the control; here we emit the
                      prefix-free number from cache warmth as reference
"""
import gc, json, os, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import cuda_fft_convolution_tpu as fc


def _probed(fn):
    def wrapped(*args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[:4], out
    return jax.jit(wrapped)


def _time(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        p, _ = fn(*args)
        np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, _ = fn(*args)
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def drain():
    gc.collect()
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.ones((8, 128))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
H = W = 2048
N, K, F = 100, 64, 1
NB, BIGK = 16, 512
data = jnp.asarray(rng.standard_normal((H, W, F)).astype(np.float32))
kernels = jnp.asarray(rng.standard_normal((N, K, K, F)).astype(np.float32))

# ---- bench-shaped prefix (dirty the allocator) -------------------------
got = np.array(fc.fft_conv(np.asarray(data[:512, :512, :]), K, K,
                           np.asarray(kernels[:8]), mode="full"))
del got
one = _probed(lambda d, k: fc.fft_conv(d, K, K, k, mode="same"))
emit(stage="prefix_oneshot_ms", ms=round(_time(one, data, kernels), 1))
sd = fc.fft_data_tiled(data, K, K, trim_mode="same")
sk = fc.fft_kernels(kernels, spectral=sd)
jax.block_until_ready((sd.re, sk.re))
conv = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
emit(stage="prefix_amortized_ms", ms=round(_time(conv, sd, sk), 1))
emit(stage="prefix_stream_ms", ms=round(_time(conv, sd, sk, iters=18), 1))
del sd, sk
drain()

# ---- bigk late, candidate mitigations ----------------------------------
kbig = jnp.asarray(rng.standard_normal((NB, BIGK, BIGK, F)).astype(np.float32))
gpix = H * W * NB / 1e9

sdb = fc.fft_data_tiled(data, BIGK, BIGK, trim_mode="same")
skb = fc.fft_kernels(kbig, spectral=sdb)
jax.block_until_ready((sdb.re, skb.re))
convb = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))

t = _time(convb, sdb, skb, warmup=1, iters=1)
emit(stage="late_baseline_first_ms", ms=round(t, 1),
     gpixf=round(gpix / (t / 1e3), 2))
for i in range(3):
    t = _time(convb, sdb, skb, warmup=0, iters=1)
    emit(stage=f"repeat{i}_ms", ms=round(t, 1))

# fresh operand copies (re-layout / re-place)
sdb2 = jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), sdb)
skb2 = jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), skb)
jax.block_until_ready(jax.tree_util.tree_leaves((sdb2.re, skb2.re)))
t = _time(convb, sdb2, skb2, warmup=1, iters=2)
emit(stage="fresh_operands_ms", ms=round(t, 1))
del sdb2, skb2
drain()

# chunked execution: smaller temporary peak
fc.set_config(chunk_size=4)
convc = _probed(lambda s, k: fc.conv_spectral(s, k, mode="same"))
try:
    t = _time(convc, sdb, skb, warmup=1, iters=2)
    emit(stage="chunked4_ms", ms=round(t, 1))
finally:
    fc.set_config(chunk_size=None)
drain()

# balloon: force the arena through a big alloc/free cycle, then re-measure
try:
    balloon = jnp.zeros((6 * 1024, 1024, 256), jnp.float32)  # ~6 GB
    jax.block_until_ready(balloon)
    del balloon
    drain()
    t = _time(convb, sdb, skb, warmup=0, iters=2)
    emit(stage="post_balloon_ms", ms=round(t, 1))
except Exception as e:  # noqa: BLE001
    emit(stage="post_balloon_ms", err=repr(e)[:160])

# everything-freed control: drop ALL other arrays, re-measure
del data, kernels, one, conv
drain()
t = _time(convb, sdb, skb, warmup=0, iters=2)
emit(stage="all_freed_ms", ms=round(t, 1))
emit(kind="done")
