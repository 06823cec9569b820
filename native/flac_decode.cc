// Native FLAC decoder (capability: the reference accepts .flac uploads via
// librosa/audioread, audio_search.py:776; this image has no such wheels).
//
// Supports the format breadth real encoders emit: CONSTANT, VERBATIM,
// FIXED (orders 0-4) and LPC (orders 1-32) subframes, Rice/Rice2 residual
// partitions with escape codes, wasted bits, 8/12/16/20/24/32 bps, and all
// four channel assignments (independent, left/side, right/side, mid/side).
// CRCs are parsed but not enforced (tolerant reader, like the decode chain
// in audio/wav.py). Output is mono float32 (channel average), matching
// audio/decode.py's contract.
//
// Exposed via the same C ABI/ctypes pattern as audio_kernels.cc.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t len;      // bytes
  int64_t pos = 0;  // bit position
  bool ok = true;

  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      int64_t byte = (pos + i) >> 3;
      if (byte >= len) { ok = false; return 0; }
      v = (v << 1) | ((data[byte] >> (7 - ((pos + i) & 7))) & 1);
    }
    pos += n;
    return v;
  }

  int64_t sbits(int n) {  // signed, two's complement
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)v - (1LL << n);
    return (int64_t)v;
  }

  uint32_t unary() {  // count 0s until a 1
    uint32_t q = 0;
    while (ok) {
      int64_t byte = pos >> 3;
      if (byte >= len) { ok = false; return 0; }
      if ((data[byte] >> (7 - (pos & 7))) & 1) { ++pos; return q; }
      ++pos; ++q;
      if (q > 1u << 24) { ok = false; return 0; }  // corrupt stream guard
    }
    return 0;
  }

  void align() { pos = (pos + 7) & ~7LL; }
};

int64_t rice_decode(BitReader& br, int param) {
  uint32_t q = br.unary();
  uint64_t low = br.bits(param);
  uint64_t v = ((uint64_t)q << param) | low;
  return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);  // zigzag
}

// UTF-8-style coded number in frame header (up to 56 bits)
bool read_utf8(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.bits(8);
  if (!br.ok) return false;
  int n;
  if (b0 < 0x80) { *out = b0; return true; }
  else if ((b0 & 0xE0) == 0xC0) { n = 1; *out = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { n = 2; *out = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { n = 3; *out = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { n = 4; *out = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { n = 5; *out = b0 & 0x01; }
  else if (b0 == 0xFE) { n = 6; *out = 0; }
  else return false;
  for (int i = 0; i < n; ++i) {
    uint64_t b = br.bits(8);
    if (!br.ok || (b & 0xC0) != 0x80) return false;
    *out = (*out << 6) | (b & 0x3F);
  }
  return true;
}

bool decode_residuals(BitReader& br, int blocksize, int order,
                      std::vector<int64_t>& x) {
  int method = (int)br.bits(2);
  if (method > 1 || !br.ok) return false;
  int pbits = method == 0 ? 4 : 5;
  int escape = method == 0 ? 0xF : 0x1F;
  int porder = (int)br.bits(4);
  int nparts = 1 << porder;
  if (blocksize % nparts) return false;
  int psize = blocksize >> porder;
  int idx = order;
  for (int p = 0; p < nparts; ++p) {
    int count = psize - (p == 0 ? order : 0);
    if (count < 0) return false;
    int param = (int)br.bits(pbits);
    if (!br.ok) return false;
    if (param == escape) {
      int raw = (int)br.bits(5);
      for (int i = 0; i < count; ++i) x[idx++] = br.sbits(raw);
    } else {
      for (int i = 0; i < count; ++i) x[idx++] = rice_decode(br, param);
    }
    if (!br.ok) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& x) {
  if (br.bits(1) != 0) return false;  // reserved
  int type = (int)br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = 1 + (int)br.unary();
  if (!br.ok) return false;
  // a crafted wasted-bits run would make the effective bps negative:
  // bits(-n) then runs zero iterations but still advances pos by -n,
  // rewinding the cursor into out-of-bounds reads BEFORE the buffer
  // (and v <<= wasted below would be UB past 63)
  if (wasted >= bps || wasted > 32) return false;
  bps -= wasted;
  x.assign(blocksize, 0);

  if (type == 0) {                                    // CONSTANT
    int64_t v = br.sbits(bps);
    std::fill(x.begin(), x.end(), v);
  } else if (type == 1) {                             // VERBATIM
    for (int i = 0; i < blocksize; ++i) x[i] = br.sbits(bps);
  } else if (type >= 8 && type <= 12) {               // FIXED order 0-4
    int order = type - 8;
    // warmup writes x[0..order-1]: a crafted 1-sample frame with a
    // higher order would write past the blocksize-sized vector
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) x[i] = br.sbits(bps);
    if (!decode_residuals(br, blocksize, order, x)) return false;
    for (int i = order; i < blocksize; ++i) {
      switch (order) {
        case 0: break;
        case 1: x[i] += x[i-1]; break;
        case 2: x[i] += 2*x[i-1] - x[i-2]; break;
        case 3: x[i] += 3*x[i-1] - 3*x[i-2] + x[i-3]; break;
        case 4: x[i] += 4*x[i-1] - 6*x[i-2] + 4*x[i-3] - x[i-4]; break;
      }
    }
  } else if (type >= 32) {                            // LPC, order 1-32
    int order = (type & 0x1F) + 1;
    if (order > blocksize) return false;  // warmup overflow (see FIXED)
    for (int i = 0; i < order; ++i) x[i] = br.sbits(bps);
    int precision = (int)br.bits(4) + 1;
    if (precision == 16) return false;  // 0b1111 is invalid
    int shift = (int)br.sbits(5);
    if (shift < 0) shift = 0;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.sbits(precision);
    if (!decode_residuals(br, blocksize, order, x)) return false;
    for (int i = order; i < blocksize; ++i) {
      __int128 acc = 0;
      for (int j = 0; j < order; ++j)
        acc += (__int128)coef[j] * x[i - 1 - j];
      x[i] += (int64_t)(acc >> shift);
    }
  } else {
    return false;  // reserved types
  }
  if (!br.ok) return false;
  if (wasted) for (auto& v : x) v <<= wasted;
  return true;
}

const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleSizes[8] = {0, 8, 12, -1, 16, 20, 24, 32};

}  // namespace

extern "C" {

// Probe: returns 0 on success; fills rate/channels/bps/total_samples (total
// may be 0 if unknown in STREAMINFO).
int mas_flac_probe(const uint8_t* data, int64_t len, int32_t* rate,
                   int32_t* channels, int32_t* bps, int64_t* total) {
  if (len < 42 || std::memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t off = 4;
  bool have_info = false;
  while (off + 4 <= len) {
    uint8_t hdr = data[off];
    uint32_t blen = (data[off+1] << 16) | (data[off+2] << 8) | data[off+3];
    off += 4;
    if ((hdr & 0x7F) == 0 && blen >= 34 && off + 34 <= len) {
      const uint8_t* p = data + off;
      *rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      *channels = ((p[12] >> 1) & 0x7) + 1;
      *bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      *total = ((int64_t)(p[13] & 0x0F) << 32) | ((int64_t)p[14] << 24) |
               (p[15] << 16) | (p[16] << 8) | p[17];
      have_info = true;
    }
    off += blen;
    if (hdr & 0x80) break;  // last metadata block
  }
  return have_info && *rate > 0 ? 0 : -2;
}

// Decode to mono float32. `out` must hold `capacity` samples; returns the
// number of frames written, or a negative error.
int64_t mas_flac_decode_mono(const uint8_t* data, int64_t len,
                             float* out, int64_t capacity) {
  int32_t rate, channels, bps;
  int64_t total;
  if (mas_flac_probe(data, len, &rate, &channels, &bps, &total) != 0)
    return -1;
  // skip metadata
  int64_t off = 4;
  while (off + 4 <= len) {
    uint8_t hdr = data[off];
    uint32_t blen = (data[off+1] << 16) | (data[off+2] << 8) | data[off+3];
    off += 4 + blen;
    if (hdr & 0x80) break;
  }
  BitReader br{data, len, off * 8};

  int64_t written = 0;
  std::vector<std::vector<int64_t>> ch;
  while (br.ok && (br.pos >> 3) + 2 < len) {
    // frame sync
    uint64_t sync = br.bits(14);
    if (!br.ok) break;
    if (sync != 0x3FFE) return written > 0 ? written : -3;
    br.bits(1);                       // reserved
    br.bits(1);                       // blocking strategy
    int bs_code = (int)br.bits(4);
    int sr_code = (int)br.bits(4);
    int ch_asgn = (int)br.bits(4);
    int ss_code = (int)br.bits(3);
    br.bits(1);                       // reserved
    uint64_t frame_no;
    // tolerant-reader contract: a corrupt frame mid-stream salvages the
    // cleanly decoded prefix (matching the lost-sync path above) instead
    // of failing the whole upload
    if (!read_utf8(br, &frame_no)) return written > 0 ? written : -4;
    int blocksize;
    if (bs_code == 6) blocksize = (int)br.bits(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.bits(16) + 1;
    else if (kBlockSizes[bs_code] > 0) blocksize = kBlockSizes[bs_code];
    else return written > 0 ? written : -5;
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int fbps = ss_code == 0 ? bps : kSampleSizes[ss_code];
    if (fbps <= 0) return written > 0 ? written : -6;
    br.bits(8);                       // CRC-8 (not enforced)
    if (!br.ok) return written > 0 ? written : -7;

    int nch = ch_asgn < 8 ? ch_asgn + 1 : 2;
    ch.assign(nch, {});
    for (int c = 0; c < nch; ++c) {
      int sub_bps = fbps;
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return written > 0 ? written : -8;
    }
    br.align();
    br.bits(16);                      // CRC-16 (not enforced)

    // stereo decorrelation
    if (ch_asgn == 8) {        // left/side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_asgn == 9) { // side/right
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (ch_asgn == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t mid = (ch[0][i] << 1) | (ch[1][i] & 1);
        int64_t side = ch[1][i];
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    double scale = 1.0 / (double)(1LL << (fbps - 1));
    int n = std::min<int64_t>(blocksize, capacity - written);
    for (int i = 0; i < n; ++i) {
      double acc = 0;
      for (int c = 0; c < nch; ++c) acc += (double)ch[c][i];
      out[written + i] = (float)(acc / nch * scale);
    }
    written += n;
    if (written >= capacity) break;
    if (total > 0 && written >= total) break;
  }
  return written;
}

}  // extern "C"
