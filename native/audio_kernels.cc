// Native host-side audio runtime: WAV decode + polyphase resampling.
//
// The reference leans on librosa/soxr native wheels for this work
// (audio_search.py:233); this image has neither, so the framework ships its
// own. Exposed as a plain C ABI consumed via ctypes
// (multimodal_audio_search_tpu/audio/native.py). Python fallbacks exist for
// every entry point; this path exists because ingest decode/resample runs on
// a single host core and feeds the TPU.
//
// Build: g++ -O3 -shared -fPIC (driven by audio/native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV probe
// Returns 0 on success. Fills format info and the byte offset/length of the
// data payload. tag is the (resolved) format tag: 1=PCM, 3=IEEE float.
int mas_wav_probe(const uint8_t* data, int64_t len,
                  int32_t* tag, int32_t* channels, int32_t* rate,
                  int32_t* bits, int64_t* data_off, int64_t* data_len) {
  if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  bool have_fmt = false, have_data = false;
  int64_t pos = 12;
  while (pos + 8 <= len) {
    const uint8_t* cid = data + pos;
    uint32_t size;
    std::memcpy(&size, data + pos + 4, 4);
    int64_t body = pos + 8;
    int64_t avail = std::min<int64_t>(size, len - body);
    if (std::memcmp(cid, "fmt ", 4) == 0 && avail >= 16) {
      uint16_t t, ch, blk, b;
      uint32_t r, br;
      std::memcpy(&t, data + body, 2);
      std::memcpy(&ch, data + body + 2, 2);
      std::memcpy(&r, data + body + 4, 4);
      std::memcpy(&br, data + body + 8, 4);
      std::memcpy(&blk, data + body + 12, 2);
      std::memcpy(&b, data + body + 14, 2);
      if (t == 0xFFFE && avail >= 26)  // EXTENSIBLE: real tag in SubFormat
        std::memcpy(&t, data + body + 24, 2);
      *tag = t; *channels = ch; *rate = (int32_t)r; *bits = b;
      have_fmt = true;
    } else if (std::memcmp(cid, "data", 4) == 0) {
      *data_off = body;
      *data_len = avail;
      have_data = true;
    }
    pos = body + size + (size & 1);
  }
  return (have_fmt && have_data && *channels > 0) ? 0 : -2;
}

// --------------------------------------------------------- WAV decode(mono)
// Decodes the data payload to mono float32 (channel average). `frames` must
// equal data_len / (channels * bytes_per_sample). Returns 0 on success.
int mas_wav_decode_mono(const uint8_t* payload, int64_t data_len,
                        int32_t tag, int32_t channels, int32_t bits,
                        float* out, int64_t frames) {
  const int ch = channels;
  const double inv_ch = 1.0 / ch;
  if (tag == 1 && bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(payload);
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      out[i] = (float)(acc * inv_ch) * k;
    }
  } else if (tag == 1 && bits == 8) {
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) acc += (int)payload[i * ch + c] - 128;
      out[i] = (float)(acc * inv_ch / 128.0);
    }
  } else if (tag == 1 && bits == 24) {
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) {
        const uint8_t* b = payload + (i * ch + c) * 3;
        int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
        if (v >= (1 << 23)) v -= (1 << 24);
        acc += v;
      }
      out[i] = (float)(acc * inv_ch / 8388608.0);
    }
  } else if (tag == 1 && bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(payload);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      out[i] = (float)(acc * inv_ch / 2147483648.0);
    }
  } else if (tag == 3 && bits == 32) {
    const float* p = reinterpret_cast<const float*>(payload);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      out[i] = (float)(acc * inv_ch);
    }
  } else if (tag == 3 && bits == 64) {
    const double* p = reinterpret_cast<const double*>(payload);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      out[i] = (float)(acc * inv_ch);
    }
  } else {
    return -1;
  }
  return 0;
}

// ----------------------------------------------------- polyphase resampling
// y[k] = sum_t h[t*up + phase(k)] * x[base(k) - t], the standard L/M
// polyphase form of upfirdn. `start` is the group-delay offset in the
// upsampled domain (matches audio/resample.py). Out-of-range x treated as 0.
void mas_resample_poly(const float* x, int64_t n,
                       const double* h, int64_t nh,
                       int32_t up, int32_t down, int64_t start,
                       float* y, int64_t n_out) {
  const int64_t taps_per_phase = (nh + up - 1) / up;
  for (int64_t k = 0; k < n_out; ++k) {
    const int64_t m = k * (int64_t)down + start;
    const int64_t phase = m % up;
    const int64_t base = m / up;
    double acc = 0.0;
    int64_t t_lo = std::max<int64_t>(0, base - (n - 1));
    int64_t t_hi = std::min<int64_t>(taps_per_phase - 1, base);
    for (int64_t t = t_lo; t <= t_hi; ++t) {
      const int64_t hi = t * up + phase;
      if (hi < nh) acc += h[hi] * x[base - t];
    }
    y[k] = (float)acc;
  }
}

// ------------------------------------------------- peak-scan (normalization)
float mas_peak_abs(const float* x, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(x[i]);
    if (a > peak) peak = a;
  }
  return peak;
}

// --------------------------------------------- transfer-encode quantization
// Single-pass fused (scale -> int16-grid index -> mu-law LUT) encode of one
// segment window. Replaces five numpy passes (multiply, nan_to_num, rint,
// clip, gather) plus their 80 MB of temporaries on the 1-core ingest host.
// Arithmetic mirrors the numpy path bit-for-bit in f32 (the build passes
// -ffp-contract=off so the mul+add below cannot fuse into an FMA, which
// would round half-grid samples differently): nearbyintf under the default
// rounding mode == np.rint (round-half-to-even); NaN maps to grid center
// like nan_to_num; +/-inf clamp to the grid ends.
void mas_quantize_mulaw(const float* x, int64_t n, float scale,
                        const int8_t* lut /* 65536 entries */, int8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i] * scale;
    if (std::isnan(v)) v = 0.0f;
    float t = v * 32767.5f + 32767.5f;
    t = nearbyintf(t);
    if (!(t >= 0.0f)) t = 0.0f;
    if (t > 65535.0f) t = 65535.0f;
    out[i] = lut[(uint32_t)t];
  }
}

// int16 transfer encode: clip to [-1,1], scale, truncate toward zero —
// identical to numpy's cast of `np.clip(w*scale,-1,1)*32767.0` to int16.
void mas_quantize_int16(const float* x, int64_t n, float scale,
                        int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i] * scale;
    // NaN passes both clip comparisons; the float->int cast of NaN is
    // UB in C (the other two kernels already guard it)
    if (std::isnan(v)) v = 0.0f;
    if (v < -1.0f) v = -1.0f;
    if (v > 1.0f) v = 1.0f;
    out[i] = (int16_t)(int32_t)(v * 32767.0f);
  }
}

// int12 packed transfer encode: two signed 12-bit samples per 3 bytes
// (little-endian nibble layout: b0 = q0&0xFF, b1 = q0>>8 | (q1&0xF)<<4,
// b2 = q1>>4). Samples are two's-complement (v & 0xFFF) so all-zero
// padding bytes decode to silence on the device. `out` must hold
// 3*ceil(n/2) bytes; an odd tail pairs with an implicit zero sample.
void mas_quantize_int12(const float* x, int64_t n, float scale,
                        uint8_t* out) {
  const int64_t pairs = (n + 1) / 2;
  for (int64_t k = 0; k < pairs; ++k) {
    uint32_t q[2] = {0u, 0u};
    for (int j = 0; j < 2; ++j) {
      const int64_t i = 2 * k + j;
      if (i >= n) break;                // implicit zero for the odd tail
      float v = x[i] * scale;
      if (std::isnan(v)) v = 0.0f;
      float t = v * 2047.0f;
      t = nearbyintf(t);
      if (!(t >= -2048.0f)) t = -2048.0f;
      if (t > 2047.0f) t = 2047.0f;
      q[j] = (uint32_t)(int32_t)t & 0xFFFu;
    }
    out[3 * k] = (uint8_t)(q[0] & 0xFFu);
    out[3 * k + 1] = (uint8_t)((q[0] >> 8) | ((q[1] & 0xFu) << 4));
    out[3 * k + 2] = (uint8_t)(q[1] >> 4);
  }
}

}  // extern "C"

// ------------------------------------------------------------ host log-mel
// Fused mel16/mel12 transfer encode for ops/mel.py::encode_mel16/12: one
// pass of window -> real FFT (f64) -> complex64-rounded power -> banded mel
// filterbank -> log10 -> code quantize, replacing five numpy passes whose
// temporaries (complex128 roundtrip, [B,T,F] power) dominate the host cost
// on the 1-core ingest machine. Numerics follow the HF
// WhisperFeatureExtractor recipe the numpy path reproduces: f64 FFT rounded
// through complex64, f64 power/mel/log10 (reference behavior:
// /root/reference/audio_search.py:315-340 via transformers' extractor).
// The FFT is a recursive mixed-radix (2/5) complex DIT over the half-size
// packed-real transform, so any n_fft = 2^a * 5^b is supported (Whisper's
// 400 = 2^4*5^2); unsupported sizes return -1 and Python falls back to
// numpy. Codes match the numpy path to <=1 ulp-of-code (FFT summation
// order differs at ~1e-15 relative, below the complex64 rounding that
// defines the contract).

namespace {

struct Cplx { double re, im; };

bool mel_factorable(int n) {
  while (n % 2 == 0) n /= 2;
  while (n % 5 == 0) n /= 5;
  return n == 1;
}

// Mixed-radix DIT: y <- FFT_n(x strided by s). W is the exp(-2*pi*i*k/nfft)
// table; every sub-transform's twiddles are strides into it (n | nfft).
void mel_fft_rec(const Cplx* x, Cplx* y, int n, int s,
                 const Cplx* W, int nfft) {
  if (n == 1) {
    y[0] = x[0];
    return;
  }
  const int r = (n % 2 == 0) ? 2 : 5;
  const int m = n / r;
  for (int j = 0; j < r; ++j)
    mel_fft_rec(x + (int64_t)j * s, y + (int64_t)j * m, m, s * r, W, nfft);
  const int tw = nfft / n;
  if (r == 2) {
    for (int k = 0; k < m; ++k) {
      const Cplx a = y[k], v = y[m + k];
      const Cplx w = W[(int64_t)k * tw];
      const double br = v.re * w.re - v.im * w.im;
      const double bi = v.re * w.im + v.im * w.re;
      y[k] = {a.re + br, a.im + bi};
      y[m + k] = {a.re - br, a.im - bi};
    }
  } else {
    // fifth roots w_5^t = W[t*nfft/5]; (i*j) mod 5 resolved via table
    const Cplx w5[5] = {W[0], W[(size_t)(nfft / 5)],
                        W[(size_t)(2 * (nfft / 5))],
                        W[(size_t)(3 * (nfft / 5))],
                        W[(size_t)(4 * (nfft / 5))]};
    Cplx t[5];
    for (int k = 0; k < m; ++k) {
      t[0] = y[k];
      for (int j = 1; j < r; ++j) {
        // j*k*tw = j*k*nfft/n <= 4*(m-1)*nfft/n < nfft: no modulo
        const Cplx v = y[(int64_t)j * m + k];
        const Cplx w = W[(int64_t)j * k * tw];
        t[j] = {v.re * w.re - v.im * w.im, v.re * w.im + v.im * w.re};
      }
      for (int i = 0; i < r; ++i) {
        double re = t[0].re, im = t[0].im;
        for (int j = 1; j < r; ++j) {
          const Cplx w = w5[(i * j) % 5];
          re += t[j].re * w.re - t[j].im * w.im;
          im += t[j].re * w.im + t[j].im * w.re;
        }
        y[(int64_t)i * m + k] = {re, im};
      }
    }
  }
}

}  // namespace

extern "C" {

// x: [b, xlen] f64, already padded exactly as ops/mel.py::host_log_mel pads
// (reflect half-window + zero extension); xlen >= (n_frames-1)*hop + n_fft.
// win: [n_fft] f64 Hann. melw: [n_freq, n_mels] f64 row-major filterbank
// (transposed, as _host_mel_fb returns it). out per batch row: bits==16 ->
// uint16 codes [n_mels, n_frames] row-major; bits==12 -> the 2-codes-per-
// 3-bytes pack of the row-major flattened codes (encode_mel12's layout);
// bits==8 -> 1 byte/code. relative!=0 quantizes against the row's
// gmax - 8 window instead of log_lo (ops/mel.py::_relative_codes) and
// appends the row's float32 gmax (LE) as a 4-byte tail.
// Returns 0, or -1 when this n_fft/bits combination is unsupported here.
int mas_mel_encode(const double* x, int64_t b, int64_t xlen,
                   const double* win, const double* melw,
                   int32_t n_fft, int32_t hop, int32_t n_freq,
                   int32_t n_mels, int32_t n_frames, int32_t bits,
                   double log_lo, double code_scale, int32_t relative,
                   uint8_t* out, int64_t out_row_bytes) {
  if (n_fft <= 0 || n_fft % 2 != 0 || !mel_factorable(n_fft / 2) ||
      n_freq != n_fft / 2 + 1 || hop <= 0 || n_frames <= 0 || n_mels <= 0)
    return -1;
  if (bits != 16 && bits != 12 && bits != 8)
    return -1;
  const int64_t n_codes = (int64_t)n_mels * n_frames;
  if (bits == 12 && n_codes % 2 != 0)
    return -1;
  if (xlen < (int64_t)(n_frames - 1) * hop + n_fft)
    return -1;
  // the 4-byte gmax tail exists only in relative mode (mel16 is
  // absolute); reject row buffers that can't hold what we will write
  const int64_t need_row =
      (bits == 16 ? n_codes * 2
                  : (bits == 12 ? n_codes / 2 * 3 : n_codes))
      + (relative ? 4 : 0);
  if (out_row_bytes < need_row || (relative && bits == 16))
    return -1;
  const int h = n_fft / 2;
  const double cmax = bits == 16 ? 65535.0 : (bits == 12 ? 4095.0 : 255.0);

  // twiddle table exp(-2*pi*i*k/n_fft)
  std::vector<Cplx> W((size_t)n_fft);
  for (int k = 0; k < n_fft; ++k) {
    const double a = -2.0 * 3.14159265358979323846 * (double)k
        / (double)n_fft;
    W[(size_t)k] = {std::cos(a), std::sin(a)};
  }
  // banded filterbank: per mel bin, the contiguous nonzero freq range
  std::vector<int> blo((size_t)n_mels, 0), bhi((size_t)n_mels, 0);
  for (int j = 0; j < n_mels; ++j) {
    int lo = n_freq, hi = 0;
    for (int f = 0; f < n_freq; ++f) {
      if (melw[(int64_t)f * n_mels + j] != 0.0) {
        if (f < lo) lo = f;
        hi = f + 1;
      }
    }
    blo[(size_t)j] = lo < hi ? lo : 0;
    bhi[(size_t)j] = hi;
  }

  // rows are independent (per-row scratch, disjoint output rows, gmax
  // is per-row), so batch rows parallelize across host cores with
  // bitwise-identical results; the 1-core dev host runs nthreads=1
  auto encode_row = [&](int64_t row, std::vector<Cplx>& z,
                        std::vector<Cplx>& Z, std::vector<double>& p,
                        std::vector<double>& logv,
                        std::vector<uint16_t>& codes) {
    const double* xr = x + row * xlen;
    double gmax = -1e300;
    for (int t = 0; t < n_frames; ++t) {
      const double* fr = xr + (int64_t)t * hop;
      // windowed frame packed as h complex points
      for (int k = 0; k < h; ++k)
        z[(size_t)k] = {fr[2 * k] * win[2 * k],
                        fr[2 * k + 1] * win[2 * k + 1]};
      mel_fft_rec(z.data(), Z.data(), h, 1, W.data(), n_fft);
      // real-input untangle + complex64-rounded power (numpy's
      // .astype(complex64).astype(complex128) then re^2+im^2)
      for (int k = 0; k < n_freq; ++k) {
        const Cplx Zk = Z[(size_t)(k == h ? 0 : k)];
        Cplx Zc = Z[(size_t)((h - k) % h)];
        Zc.im = -Zc.im;
        const double dre = Zk.re - Zc.re, dim = Zk.im - Zc.im;
        const double Ere = (Zk.re + Zc.re) * 0.5;
        const double Eim = (Zk.im + Zc.im) * 0.5;
        const double Ore = dim * 0.5, Oim = -dre * 0.5;
        const Cplx w = W[(size_t)k];
        const float sr = (float)(Ere + w.re * Ore - w.im * Oim);
        const float si = (float)(Eim + w.re * Oim + w.im * Ore);
        p[(size_t)k] = (double)sr * sr + (double)si * si;
      }
      for (int j = 0; j < n_mels; ++j) {
        double acc = 0.0;
        const int lo = blo[(size_t)j], hi = bhi[(size_t)j];
        for (int f = lo; f < hi; ++f)
          acc += p[(size_t)f] * melw[(int64_t)f * n_mels + j];
        if (!(acc > 1e-10)) acc = 1e-10;   // np.maximum floor
        const double lg = std::log10(acc);
        logv[(size_t)j * n_frames + t] = lg;
        if (lg > gmax) gmax = lg;
      }
    }
    const double base = relative ? gmax - 8.0 : log_lo;
    for (int64_t i = 0; i < n_codes; ++i) {
      double c = nearbyint((logv[(size_t)i] - base) * code_scale);
      if (!(c >= 0.0)) c = 0.0;
      if (c > cmax) c = cmax;
      codes[(size_t)i] = (uint16_t)c;
    }
    uint8_t* orow = out + row * out_row_bytes;
    if (bits == 16) {
      std::memcpy(orow, codes.data(), (size_t)n_codes * 2);
      orow += n_codes * 2;
    } else if (bits == 12) {
      for (int64_t k = 0; k < n_codes / 2; ++k) {
        const uint32_t a = codes[(size_t)(2 * k)];
        const uint32_t c2 = codes[(size_t)(2 * k + 1)];
        orow[3 * k] = (uint8_t)(a & 0xFFu);
        orow[3 * k + 1] = (uint8_t)((a >> 8) | ((c2 & 0xFu) << 4));
        orow[3 * k + 2] = (uint8_t)(c2 >> 4);
      }
      orow += n_codes / 2 * 3;
    } else {
      for (int64_t i = 0; i < n_codes; ++i)
        orow[i] = (uint8_t)codes[(size_t)i];
      orow += n_codes;
    }
    if (relative) {
      const float g = (float)gmax;
      std::memcpy(orow, &g, 4);     // little-endian f32 tail
    }
  };

  const unsigned hw = std::thread::hardware_concurrency();
  const int64_t nthreads =
      std::max<int64_t>(1, std::min<int64_t>(b, hw ? hw : 1));
  if (nthreads == 1) {
    std::vector<Cplx> z((size_t)h), Z((size_t)h);
    std::vector<double> p((size_t)n_freq), logv((size_t)n_codes);
    std::vector<uint16_t> codes((size_t)n_codes);
    for (int64_t row = 0; row < b; ++row)
      encode_row(row, z, Z, p, logv, codes);
  } else {
    std::vector<std::thread> pool;
    pool.reserve((size_t)nthreads);
    std::atomic<int64_t> next{0};
    for (int64_t ti = 0; ti < nthreads; ++ti)
      pool.emplace_back([&]() {
        std::vector<Cplx> z((size_t)h), Z((size_t)h);
        std::vector<double> p((size_t)n_freq), logv((size_t)n_codes);
        std::vector<uint16_t> codes((size_t)n_codes);
        for (int64_t row = next.fetch_add(1); row < b;
             row = next.fetch_add(1))
          encode_row(row, z, Z, p, logv, codes);
      });
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
