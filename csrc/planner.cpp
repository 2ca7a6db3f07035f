// Native planner — the TPU-native equivalent of the reference's host
// utility layer (src/cudaConvFFTData.h: iDivUp/iAlignUp grid math,
// computeFFTsize/computeFFTsize16 FFT-size policies) plus the execution
// planning the streams variant hard-codes (src/cudaConvFFTDataStreams.cu:
// N_BATCH_PER_GPU=2 double buffering, fixed round-robin).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (cuda_fft_convolution_tpu/runtime/native.py). The Python implementations
// in utils/fft_size.py are the semantic definition of record; this library
// must match them bit-for-bit (tests/test_runtime.py cross-checks).
//
// Build: g++ -O2 -shared -fPIC -o libfftconv_planner.so planner.cpp

#include <cstdint>
#include <initializer_list>

extern "C" {

// ceil(a / b) — reference iDivUp (src/cudaConvFFTData.h:36).
int64_t ffc_ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

// round a up to a multiple of b — reference iAlignUp (src/cudaConvFFTData.h:41).
int64_t ffc_align_up(int64_t a, int64_t b) { return ffc_ceil_div(a, b) * b; }

// round up to a multiple of 16 — reference computeFFTsize16
// (src/cudaConvFFTData.h:96).
int64_t ffc_next_multiple_of_16(int64_t n) {
  return ffc_align_up(n < 1 ? 1 : n, 16);
}

// align to 16 then next power of two — reference computeFFTsize
// (src/cudaConvFFTData.h:67).
int64_t ffc_next_pow2(int64_t n) {
  n = ffc_align_up(n < 1 ? 1 : n, 16);
  int64_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

static bool is_5_smooth(int64_t m) {
  for (int64_t p : {2, 3, 5}) {
    while (m % p == 0) m /= p;
  }
  return m == 1;
}

// smallest 5-smooth integer >= n (XLA-FFT-friendly sizes).
int64_t ffc_next_fast_len(int64_t n) {
  if (n < 1) n = 1;
  if (n <= 5) return n;
  while (!is_5_smooth(n)) ++n;
  return n;
}

// smallest 5-smooth multiple of `align` >= n (`align` must be 5-smooth).
int64_t ffc_next_fast_len_aligned(int64_t n, int64_t align) {
  return align * ffc_next_fast_len(ffc_ceil_div(n, align));
}

// FFT-size policy dispatch; must match utils/fft_size.py:compute_fft_size.
// policy: 0=multiple16, 1=pow2, 2=fast, 3=tpu.
void ffc_compute_fft_size(int64_t data_h, int64_t data_w, int64_t max_kh,
                          int64_t max_kw, int32_t policy, int64_t* out_h,
                          int64_t* out_w) {
  const int64_t need_h = data_h + max_kh - 1;
  const int64_t need_w = data_w + max_kw - 1;
  switch (policy) {
    case 0:
      *out_h = ffc_next_multiple_of_16(need_h);
      *out_w = ffc_next_multiple_of_16(need_w);
      return;
    case 1:
      *out_h = ffc_next_pow2(need_h);
      *out_w = ffc_next_pow2(need_w);
      return;
    case 2:
      *out_h = ffc_next_fast_len(need_h);
      *out_w = ffc_next_fast_len(need_w);
      return;
    default:  // tpu: sublane-align H (8 for fp32), lane-align W (128)
      *out_h = ffc_next_fast_len_aligned(need_h, 8);
      *out_w = ffc_next_fast_len_aligned(need_w, 128);
      return;
  }
}

// Bank execution plan: choose the kernel-chunk size for the pipelined bank
// loop so that one chunk's working set (chunk spectra + products + output
// maps, all live at once while the next chunk overlaps) fits the memory
// budget — the decision src/cudaConvFFTDataStreams.cu bakes in as
// "2 streams x 1 kernel each".
//
// Inputs: bank size n, feature dim f, fft dims, batch b, HBM budget bytes,
// spectra store width in bytes (4 = f32 tier, 2 = the bf16 serving tier —
// data/bank/product spectra all halve; output maps stay f32).
// Outputs: chunk size (>=1) and estimated peak working-set bytes.
void ffc_plan_bank(int64_t n, int64_t f, int64_t fft_h, int64_t fft_w,
                   int64_t b, int64_t hbm_budget_bytes, int64_t store_bytes,
                   int64_t* out_chunk, int64_t* out_peak_bytes) {
  const int64_t wc = fft_w / 2 + 1;
  // PADDED bytes: TPU HBM stores f32 arrays in (8, 128) tiles, so the
  // trailing (h, wc) dims round up — a (540, 271) spectrum plane occupies
  // (544, 384), 1.43x its nominal bytes (measured: the nominal model
  // OOM'd a 9.3 GB-nominal / 13.3 GB-padded bank at every chunk size).
  const int64_t h_pad = ffc_align_up(fft_h, 8);
  const int64_t spec = h_pad * ffc_align_up(wc, 128) * 2 * store_bytes;
  const int64_t map = h_pad * ffc_align_up(fft_w, 128) * 4;
  // Fixed: data spectra (b*f planes), input data, the RESIDENT bank spectra
  // (n*f planes), and the full output maps (b*n) — all live for the whole
  // call regardless of chunking.
  const int64_t fixed =
      b * f * spec + b * f * fft_h * fft_w * 4 + n * f * spec + b * n * map;
  // UNCHUNKED working set per kernel: products (b planes) + inverse scratch
  // (~2 maps); x2 for producer/consumer overlap. For f > 1 keep a
  // bank/16 slack for MAC fusion failures: the F-contraction einsum was
  // once modeled as a full bank-sized relayout copy, but the whole-bank
  // MAC at the F=31, N=224, 11.6 GB-padded-bank config measured RUNNING
  // unchunked within 2.4 GB of real slack (perf/diag_dpm.py
  // mac256_einsum) — the full-bank allowance forced a chunked plan that
  // was 6-12x slower than the unchunked pass it prohibited.
  const int64_t per_unchunked = 2 * (b * spec + 2 * b * map);
  const int64_t unchunked_extra = (f > 1) ? (n * f * spec) / 16 : 0;
  int64_t budget = hbm_budget_bytes - fixed;
  if (budget >= n * per_unchunked + unchunked_extra) {
    // Whole bank in one pass — measured to be both the fastest and the
    // memory-honest choice (a chunked lax.map pays a bank-slice COPY per
    // chunk; with chunk_size 1 that was a measured 30x slowdown).
    *out_chunk = n;
    *out_peak_bytes = fixed + n * per_unchunked + unchunked_extra;
    return;
  }
  // Chunked: each chunk's working set adds a bank-slice copy PLUS its
  // F-contraction relayout (f planes each, f > 1) on top of products/maps;
  // x2 for double buffering. (A chunk of 42 with the single-copy model
  // OOM'd on hardware; the relayout term restores the safety margin.)
  const int64_t slice_copies = (f > 1) ? 2 * f * spec : f * spec;
  const int64_t per_chunked = 2 * (slice_copies + b * spec + b * (3 * map));
  if (budget < per_chunked) budget = per_chunked;
  int64_t chunk = budget / per_chunked;
  if (chunk > n) chunk = n;
  if (chunk < 1) chunk = 1;
  *out_chunk = chunk;
  *out_peak_bytes = fixed + chunk * per_chunked;
}

// ABI version for the ctypes loader's compatibility check.
int32_t ffc_abi_version() { return 2; }

}  // extern "C"
