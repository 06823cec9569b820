// From-scratch MPEG-1/2/2.5 Layer III decoder (no third-party code).
//
// Reference behavior: the reference accepts .mp3 uploads
// (audio_search.py:776) and decodes them via librosa -> audioread -> a
// system decoder. Round-2 first bound libmpg123 directly (audio/mp3.py);
// this file removes even that dependency from the production path: a
// clean-room Layer III implementation whose only non-trivial numeric
// tables — the 15 Huffman code books, count1 A/B, and the 512-tap
// polyphase synthesis window — are MACHINE-PROBED out of libmpg123 by
// tools/probe_mp3_tables.py / probe_mp3_synth.py (provenance in
// tools/mp3_tables.json) rather than transcribed from a document.
// libmpg123 remains in tests as the independent conformance oracle
// (tests/test_mp3_native.py: sample-exact agreement on lame-encoded
// vectors across all three MPEG versions).
//
// Structure (ISO 11172-3 / 13818-3 semantics):
//   frame sync + header -> side info (V1: 2 granules, scfsi; LSF: 1
//   granule, 9-bit scalefac_compress) -> bit reservoir -> scalefactors ->
//   Huffman (big_values pairs + count1 quads) -> requantize -> MS /
//   intensity stereo -> short-block reorder -> alias reduction -> IMDCT
//   (block types 0-3, mixed) with overlap-add + frequency inversion ->
//   polyphase synthesis (DCT-32 matrixing + probed window).
//
// C ABI for ctypes (audio/mp3_native.py):
//   mas_mp3_decode(data, len, &out, &frames, &channels, &rate) -> 0/neg
//   mas_mp3_free(out)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "mp3_tables.inc"
#include "mp3_synth_window.inc"

namespace {

// ------------------------------------------------------------ bit reader
struct BitReader {
  const uint8_t* data;
  int64_t nbits;
  int64_t pos = 0;
  BitReader(const uint8_t* d, int64_t nbytes) : data(d), nbits(nbytes * 8) {}
  int bit() {
    if (pos >= nbits) { pos++; return 0; }
    int b = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
    pos++;
    return b;
  }
  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }
  bool overrun() const { return pos > nbits; }
};

// ------------------------------------------------------------ header
struct Header {
  int version;      // 1, 2, or 25 (MPEG-2.5)
  int layer;        // must be 3
  bool crc;
  int bitrate;      // bits/s
  int rate;         // Hz
  bool padding;
  int mode;         // 0 stereo, 1 joint, 2 dual, 3 mono
  int mode_ext;
  int frame_bytes;
  int channels() const { return mode == 3 ? 1 : 2; }
  bool lsf() const { return version != 1; }
  int granules() const { return lsf() ? 1 : 2; }
  int samples() const { return lsf() ? 576 : 1152; }
};

const int kBitrateV1[16] = {0, 32, 40, 48, 56, 64, 80, 96, 112,
                            128, 160, 192, 224, 256, 320, 0};
const int kBitrateV2[16] = {0, 8, 16, 24, 32, 40, 48, 56, 64,
                            80, 96, 112, 128, 144, 160, 0};
const int kRate[4][3] = {{11025, 12000, 8000},    // 2.5
                         {0, 0, 0},
                         {22050, 24000, 16000},   // 2
                         {44100, 48000, 32000}};  // 1

bool parse_header(const uint8_t* p, Header* h) {
  if (p[0] != 0xFF || (p[1] & 0xE0) != 0xE0) return false;
  int ver2 = (p[1] >> 3) & 3;
  if (ver2 == 1) return false;
  h->version = ver2 == 3 ? 1 : (ver2 == 2 ? 2 : 25);
  h->layer = 4 - ((p[1] >> 1) & 3);
  if (h->layer != 3) return false;
  h->crc = !(p[1] & 1);
  int bi = (p[2] >> 4) & 15;
  int si = (p[2] >> 2) & 3;
  if (bi == 0 || bi == 15 || si == 3) return false;
  h->bitrate = (h->version == 1 ? kBitrateV1 : kBitrateV2)[bi] * 1000;
  h->rate = kRate[ver2][si];
  h->padding = (p[2] >> 1) & 1;
  h->mode = (p[3] >> 6) & 3;
  h->mode_ext = (p[3] >> 4) & 3;
  int per = h->version == 1 ? 144 : 72;
  h->frame_bytes = per * h->bitrate / h->rate + (h->padding ? 1 : 0);
  return h->frame_bytes > 4;
}

// ------------------------------------------------- scalefactor band tables
// Start indices (long: 23 entries to 576, short: 14 entries to 192 per
// window), ISO 11172-3 Table B.8 / 13818-3. Verified end-to-end by the
// cross-decoder conformance suite (tests/test_mp3_native.py).
struct SfbTable { int long_[23]; int short_[14]; };

const SfbTable kSfb44100 = {
    {0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162,
     196, 238, 288, 342, 418, 576},
    {0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192}};
const SfbTable kSfb48000 = {
    {0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128, 156,
     190, 230, 276, 330, 384, 576},
    {0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192}};
const SfbTable kSfb32000 = {
    {0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156, 194,
     240, 296, 364, 448, 576},
    {0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192}};
const SfbTable kSfb22050 = {
    {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
     238, 284, 336, 396, 464, 522, 576},
    {0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192}};
const SfbTable kSfb24000 = {
    {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162, 194,
     232, 278, 332, 394, 464, 540, 576},
    {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192}};
const SfbTable kSfb16000 = {
    {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
     238, 284, 336, 396, 464, 522, 576},
    {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192}};
const SfbTable kSfb11025 = {
    {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
     238, 284, 336, 396, 464, 522, 576},
    {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192}};
const SfbTable kSfb12000 = {
    {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
     238, 284, 336, 396, 464, 522, 576},
    {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192}};
const SfbTable kSfb8000 = {
    {0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232, 280, 336,
     400, 476, 566, 568, 570, 572, 574, 576},
    {0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 192}};

// Mixed-block spectral split for requantize/reorder/intensity: the long
// scalefactor bands cover the lines below the first short band's start
// (x3 windows). 3*short_[3] == 36 at every rate EXCEPT MPEG-2.5 8 kHz,
// where the wide short bands put it at 72 — hardcoding 36 there decoded
// LSF mixed frames with the wrong band layout (round-2 advisor finding;
// conformance-fixed against libmpg123 with crafted frames,
// tests/test_mp3_native.py::test_lsf_mixed_block_crafted_frames). The
// FILTERBANK split (antialias subbands, IMDCT window types) stays at 2
// subbands = 36 lines by construction.
static inline int mixed_split(const SfbTable& sfb) {
  return 3 * sfb.short_[3];
}

const SfbTable* sfb_for(int rate) {
  switch (rate) {
    case 44100: return &kSfb44100;
    case 48000: return &kSfb48000;
    case 32000: return &kSfb32000;
    case 22050: return &kSfb22050;
    case 24000: return &kSfb24000;
    case 16000: return &kSfb16000;
    case 11025: return &kSfb11025;
    case 12000: return &kSfb12000;
    case 8000:  return &kSfb8000;
  }
  return nullptr;
}

const int kPretab[22] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                         1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0};

// ----------------------------------------------------------- side info
struct Granule {
  int part2_3_length = 0;
  int big_values = 0;
  int global_gain = 0;
  int scalefac_compress = 0;
  bool window_switching = false;
  int block_type = 0;
  bool mixed = false;
  int table_select[3] = {0, 0, 0};
  int subblock_gain[3] = {0, 0, 0};
  int region0_count = 0;
  int region1_count = 0;
  bool preflag = false;
  int scalefac_scale = 0;
  int count1table_select = 0;
  // decoded scalefactors: long [22], short [13][3]
  int scf_l[23] = {0};
  int scf_s[13][3] = {{0}};
  // LSF intensity channel: per-band "illegal is_pos" marker, (2^slen)-1
  // of the group each band was read with (13818-3: all-ones means "no
  // intensity for this band")
  int ill_l[23] = {0};
  int ill_s[13][3] = {{0}};
};

struct SideInfo {
  int main_data_begin = 0;
  int scfsi[2][4] = {{0}};
  Granule gr[2][2];  // [granule][channel]
};

bool read_side_info(BitReader* br, const Header& h, SideInfo* si) {
  int ch = h.channels();
  si->main_data_begin = br->bits(h.lsf() ? 8 : 9);
  br->bits(h.lsf() ? (ch == 1 ? 1 : 2) : (ch == 1 ? 5 : 3));  // private
  if (!h.lsf())
    for (int c = 0; c < ch; ++c)
      for (int b = 0; b < 4; ++b) si->scfsi[c][b] = br->bit();
  for (int g = 0; g < h.granules(); ++g) {
    for (int c = 0; c < ch; ++c) {
      Granule* gr = &si->gr[g][c];
      gr->part2_3_length = br->bits(12);
      gr->big_values = br->bits(9);
      gr->global_gain = br->bits(8);
      gr->scalefac_compress = br->bits(h.lsf() ? 9 : 4);
      gr->window_switching = br->bit();
      if (gr->window_switching) {
        gr->block_type = br->bits(2);
        gr->mixed = br->bit();
        gr->table_select[0] = br->bits(5);
        gr->table_select[1] = br->bits(5);
        gr->table_select[2] = 0;
        for (int w = 0; w < 3; ++w) gr->subblock_gain[w] = br->bits(3);
        if (gr->block_type == 0) return false;
        gr->region0_count = (gr->block_type == 2 && !gr->mixed) ? 8 : 7;
        gr->region1_count = 20 - gr->region0_count;
      } else {
        for (int r = 0; r < 3; ++r) gr->table_select[r] = br->bits(5);
        gr->region0_count = br->bits(4);
        gr->region1_count = br->bits(3);
        gr->block_type = 0;
      }
      if (!h.lsf()) gr->preflag = br->bit();
      gr->scalefac_scale = br->bit();
      gr->count1table_select = br->bit();
      if (gr->big_values > 288) return false;
    }
  }
  return !br->overrun();
}

// -------------------------------------------------------- scalefactors
const int kSlen1[16] = {0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4};
const int kSlen2[16] = {0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3};
// 13818-3: LSF scalefactor group sizes, [block][bt 0=long,1=short,2=mixed]
const int kLsfNsfb[6][3][4] = {
    {{6, 5, 5, 5}, {9, 9, 9, 9}, {6, 9, 9, 9}},
    {{6, 5, 7, 3}, {9, 9, 12, 6}, {6, 9, 12, 6}},
    {{11, 10, 0, 0}, {18, 18, 0, 0}, {15, 18, 0, 0}},
    {{7, 7, 7, 0}, {12, 12, 12, 0}, {6, 15, 12, 0}},
    {{6, 6, 6, 3}, {12, 9, 9, 6}, {6, 12, 9, 6}},
    {{8, 8, 5, 0}, {15, 12, 9, 0}, {6, 18, 9, 0}}};

void read_scalefactors_v1(BitReader* br, const SideInfo& si, int g, int c,
                          Granule* gr) {
  int s1 = kSlen1[gr->scalefac_compress];
  int s2 = kSlen2[gr->scalefac_compress];
  if (gr->window_switching && gr->block_type == 2) {
    if (gr->mixed) {
      for (int b = 0; b < 8; ++b) gr->scf_l[b] = br->bits(s1);
      for (int b = 3; b < 6; ++b)
        for (int w = 0; w < 3; ++w) gr->scf_s[b][w] = br->bits(s1);
      for (int b = 6; b < 12; ++b)
        for (int w = 0; w < 3; ++w) gr->scf_s[b][w] = br->bits(s2);
    } else {
      for (int b = 0; b < 6; ++b)
        for (int w = 0; w < 3; ++w) gr->scf_s[b][w] = br->bits(s1);
      for (int b = 6; b < 12; ++b)
        for (int w = 0; w < 3; ++w) gr->scf_s[b][w] = br->bits(s2);
    }
  } else {
    const Granule& g0 = si.gr[0][c];
    static const int kScfsiBands[5] = {0, 6, 11, 16, 21};
    for (int grp = 0; grp < 4; ++grp) {
      int slen = grp < 2 ? s1 : s2;
      for (int b = kScfsiBands[grp]; b < kScfsiBands[grp + 1]; ++b) {
        if (g == 1 && si.scfsi[c][grp])
          gr->scf_l[b] = g0.scf_l[b];
        else
          gr->scf_l[b] = br->bits(slen);
      }
    }
  }
}

void read_scalefactors_lsf(BitReader* br, const Header& h, int c,
                           Granule* gr, bool intensity_ch) {
  // LSF has no preflag side-info bit: it is implied by sfc >= 500 below
  // and must be RESET here — Granule objects persist across frames, so
  // a latched preflag from an earlier sfc>=500 frame would mis-scale
  // bands 11-20 of every later frame in this granule/channel slot
  gr->preflag = false;
  int sfc = gr->scalefac_compress;
  int slen[4] = {0, 0, 0, 0};
  int block = 0;
  if (!intensity_ch) {
    if (sfc < 400) {
      slen[0] = (sfc >> 4) / 5;
      slen[1] = (sfc >> 4) % 5;
      slen[2] = (sfc & 15) >> 2;
      slen[3] = sfc & 3;
      block = 0;
    } else if (sfc < 500) {
      int t = sfc - 400;
      slen[0] = (t >> 2) / 5;
      slen[1] = (t >> 2) % 5;
      slen[2] = t & 3;
      block = 1;
    } else {
      int t = sfc - 500;
      slen[0] = t / 3;
      slen[1] = t % 3;
      gr->preflag = true;
      block = 2;
    }
  } else {
    int t = sfc >> 1;
    if (t < 180) {
      slen[0] = t / 36;
      slen[1] = (t % 36) / 6;
      slen[2] = t % 6;
      block = 3;
    } else if (t < 244) {
      t -= 180;
      slen[0] = (t & 63) >> 4;
      slen[1] = (t & 15) >> 2;
      slen[2] = t & 3;
      block = 4;
    } else {
      t -= 244;
      slen[0] = t / 3;
      slen[1] = t % 3;
      block = 5;
    }
  }
  int bt = gr->block_type == 2 ? (gr->mixed ? 2 : 1) : 0;
  // read group by group into the long/short arrays in decode order
  int li = 0, sb = gr->block_type == 2 ? (gr->mixed ? 3 : 0) : 0, sw = 0;
  bool in_short = gr->block_type == 2 && !gr->mixed;
  int long_limit = gr->block_type == 2 ? (gr->mixed ? 6 : 0) : 23;
  for (int grp = 0; grp < 4; ++grp) {
    int ill = (1 << slen[grp]) - 1;     // all-ones = "illegal" is_pos
    for (int i = 0; i < kLsfNsfb[block][bt][grp]; ++i) {
      int v = br->bits(slen[grp]);
      if (!in_short && li < long_limit) {
        gr->ill_l[li] = ill;
        gr->scf_l[li++] = v;
        if (li >= long_limit && gr->block_type == 2) in_short = true;
      } else {
        if (sb < 13) {
          gr->scf_s[sb][sw] = v;
          gr->ill_s[sb][sw] = ill;
        }
        if (++sw == 3) { sw = 0; sb++; }
        in_short = true;
      }
    }
  }
}

// ----------------------------------------------------------- Huffman
struct Book {
  const MasHuffEntry* e;
  int n;
};
const Book kBooks[32] = {
    {nullptr, 0},
    {mas_book_1, (int)(sizeof(mas_book_1) / sizeof(MasHuffEntry))},
    {mas_book_2, (int)(sizeof(mas_book_2) / sizeof(MasHuffEntry))},
    {mas_book_3, (int)(sizeof(mas_book_3) / sizeof(MasHuffEntry))},
    {nullptr, 0},
    {mas_book_5, (int)(sizeof(mas_book_5) / sizeof(MasHuffEntry))},
    {mas_book_6, (int)(sizeof(mas_book_6) / sizeof(MasHuffEntry))},
    {mas_book_7, (int)(sizeof(mas_book_7) / sizeof(MasHuffEntry))},
    {mas_book_8, (int)(sizeof(mas_book_8) / sizeof(MasHuffEntry))},
    {mas_book_9, (int)(sizeof(mas_book_9) / sizeof(MasHuffEntry))},
    {mas_book_10, (int)(sizeof(mas_book_10) / sizeof(MasHuffEntry))},
    {mas_book_11, (int)(sizeof(mas_book_11) / sizeof(MasHuffEntry))},
    {mas_book_12, (int)(sizeof(mas_book_12) / sizeof(MasHuffEntry))},
    {mas_book_13, (int)(sizeof(mas_book_13) / sizeof(MasHuffEntry))},
    {nullptr, 0},
    {mas_book_15, (int)(sizeof(mas_book_15) / sizeof(MasHuffEntry))},
    {mas_book_16, (int)(sizeof(mas_book_16) / sizeof(MasHuffEntry))},
    {mas_book_16, 0}, {mas_book_16, 0}, {mas_book_16, 0},
    {mas_book_16, 0}, {mas_book_16, 0}, {mas_book_16, 0},
    {mas_book_16, 0},
    {mas_book_24, (int)(sizeof(mas_book_24) / sizeof(MasHuffEntry))},
    {mas_book_24, 0}, {mas_book_24, 0}, {mas_book_24, 0},
    {mas_book_24, 0}, {mas_book_24, 0}, {mas_book_24, 0},
    {mas_book_24, 0}};

// two-level LUT decoder: 10-bit primary, 9-bit secondary (max code 19)
struct HuffLut {
  // primary[v]: if len<=10 and resolved: (sym<<5)|len; else 0x80000000|sub
  std::vector<uint32_t> primary;
  std::vector<uint32_t> secondary;  // blocks of 512
  std::vector<uint16_t> sym_xy;     // x<<8|y per symbol index
};

HuffLut build_lut(const MasHuffEntry* e, int n) {
  HuffLut lut;
  lut.primary.assign(1 << 10, 0);
  lut.sym_xy.resize(n);
  // group long codes by their 10-bit prefix
  for (int s = 0; s < n; ++s)
    lut.sym_xy[s] = (uint16_t)((e[s].x << 8) | e[s].y);
  for (int s = 0; s < n; ++s) {
    if (e[s].len <= 10) {
      uint32_t base = e[s].code << (10 - e[s].len);
      uint32_t span = 1u << (10 - e[s].len);
      for (uint32_t v = 0; v < span; ++v)
        lut.primary[base + v] = ((uint32_t)s << 5) | e[s].len;
    }
  }
  for (int s = 0; s < n; ++s) {
    if (e[s].len > 10) {
      uint32_t pref = e[s].code >> (e[s].len - 10);
      if (!(lut.primary[pref] & 0x80000000u)) {
        lut.primary[pref] = 0x80000000u | (uint32_t)(lut.secondary.size());
        lut.secondary.insert(lut.secondary.end(), 512, 0);
      }
      uint32_t sub = lut.primary[pref] & 0x7FFFFFFFu;
      int rem = e[s].len - 10;
      uint32_t tail = e[s].code & ((1u << rem) - 1);
      uint32_t base = tail << (9 - rem);
      uint32_t span = 1u << (9 - rem);
      for (uint32_t v = 0; v < span; ++v)
        lut.secondary[sub + base + v] = ((uint32_t)s << 5) | e[s].len;
    }
  }
  return lut;
}

// All shared decode tables use C++11 magic-static initialization: the
// threaded HTTP server decodes uploads concurrently and ctypes releases
// the GIL, so the previous `if (!init)` lazy patterns were data races
// (torn pointer/vector reads while another thread initialized).
struct LutCache {
  HuffLut* cache[32] = {nullptr};
  LutCache() {
    for (int t = 0; t < 32; ++t)
      if (kBooks[t].e && kBooks[t].n)   // owners; sharers have n == 0
        cache[t] = new HuffLut(build_lut(kBooks[t].e, kBooks[t].n));
  }
};

const HuffLut* lut_for(int table) {
  static const LutCache lc;             // thread-safe one-time build
  const Book& b = kBooks[table];
  if (!b.e) return nullptr;
  // sharers resolve to the owner's LUT
  int owner = table;
  if (table >= 17 && table <= 23) owner = 16;
  if (table >= 25 && table <= 31) owner = 24;
  return lc.cache[owner];
}

int64_t decode_huffman(BitReader* br, const Header& h, const Granule& gr,
                       const int* band_long, float* is576,
                       int64_t part2_start) {
  // returns count of decoded lines (zero-filled to 576), or -1 on error
  for (int i = 0; i < 576; ++i) is576[i] = 0.0f;
  int64_t limit = part2_start + gr.part2_3_length;

  // region boundaries in LINE space
  int region1, region2;
  if (gr.window_switching) {
    // region0_count is implicit: 8 short window-bands for pure short
    // blocks (boundary 3*short[3]), 7 long bands otherwise (long[8]).
    // 36 at MPEG-1 rates either way, but NOT at LSF rates.
    const SfbTable* sfb_ws = sfb_for(h.rate);
    region1 = (gr.block_type == 2 && !gr.mixed)
                  ? 3 * sfb_ws->short_[3]
                  : sfb_ws->long_[8];
    region2 = 576;
  } else {
    int r0 = gr.region0_count + 1;
    int r1 = r0 + gr.region1_count + 1;
    if (r0 > 22) r0 = 22;
    if (r1 > 22) r1 = 22;
    region1 = band_long[r0];
    region2 = band_long[r1];
  }

  int nlines = gr.big_values * 2;
  if (nlines > 576) return -1;
  int line = 0;
  while (line < nlines) {
    int table = line < region1 ? gr.table_select[0]
                : line < region2 ? gr.table_select[1]
                                 : gr.table_select[2];
    if (table == 4 || table == 14) return -1;
    if (table == 0) {
      is576[line] = 0.0f;
      is576[line + 1] = 0.0f;
      line += 2;
      continue;
    }
    const HuffLut* lut = lut_for(table);
    if (!lut) return -1;
    // decode one pair via the 2-level LUT
    uint32_t p10 = 0;
    {
      int64_t p = br->pos;
      for (int i = 0; i < 10; ++i) {
        int b = p < br->nbits
                    ? (br->data[p >> 3] >> (7 - (p & 7))) & 1 : 0;
        p10 = (p10 << 1) | (uint32_t)b;
        p++;
      }
    }
    uint32_t cell = lut->primary[p10];
    if (cell & 0x80000000u) {
      uint32_t sub = cell & 0x7FFFFFFFu;
      uint32_t p9 = 0;
      int64_t p = br->pos + 10;
      for (int i = 0; i < 9; ++i) {
        int b = p < br->nbits
                    ? (br->data[p >> 3] >> (7 - (p & 7))) & 1 : 0;
        p9 = (p9 << 1) | (uint32_t)b;
        p++;
      }
      cell = lut->secondary[sub + p9];
    }
    int len = cell & 31;
    if (len == 0) return -1;
    br->pos += len;
    uint32_t sym = cell >> 5;
    int x = lut->sym_xy[sym] >> 8;
    int y = lut->sym_xy[sym] & 255;
    int linbits = mas_table_linbits[table];
    if (x == 15 && linbits) x += (int)br->bits(linbits);
    if (x) x = br->bit() ? -x : x;
    if (y == 15 && linbits) y += (int)br->bits(linbits);
    if (y) y = br->bit() ? -y : y;
    is576[line] = (float)x;
    is576[line + 1] = (float)y;
    line += 2;
    if (br->pos > limit) return -1;
  }

  // count1 region
  const MasC1Entry* c1 = gr.count1table_select ? mas_count1_1 : mas_count1_0;
  int c1n = gr.count1table_select
                ? (int)(sizeof(mas_count1_1) / sizeof(MasC1Entry))
                : (int)(sizeof(mas_count1_0) / sizeof(MasC1Entry));
  while (br->pos < limit && line + 4 <= 576) {
    // bit-serial match against the (tiny) count1 book
    uint32_t code = 0;
    int len = 0;
    int quad = -1;
    while (len < 7) {
      code = (code << 1) | (uint32_t)br->bit();
      len++;
      for (int i = 0; i < c1n; ++i)
        if (c1[i].len == len && c1[i].code == code) { quad = c1[i].v; break; }
      if (quad >= 0) break;
    }
    if (quad < 0) return -1;
    if (br->pos > limit) { line += 0; break; }  // ran past: stop cleanly
    int vals[4] = {(quad >> 3) & 1, (quad >> 2) & 1, (quad >> 1) & 1,
                   quad & 1};
    for (int k = 0; k < 4; ++k) {
      int v = vals[k];
      if (v) v = br->bit() ? -1 : 1;
      is576[line + k] = (float)v;
    }
    line += 4;
  }
  br->pos = limit;  // skip ancillary/stuffing inside part2_3
  return line;
}

// --------------------------------------------------------- requantize
double pow43(int v) {
  // magic static (see LutCache): concurrent decodes must not race the
  // one-time table build
  static const std::vector<double> lut = [] {
    std::vector<double> l(8500);
    for (size_t i = 0; i < l.size(); ++i)
      l[i] = std::pow((double)i, 4.0 / 3.0);
    return l;
  }();
  int a = v < 0 ? -v : v;
  double m = a < (int)lut.size() ? lut[a] : std::pow((double)a, 4.0 / 3.0);
  return v < 0 ? -m : m;
}

void requantize(const Header& h, const Granule& gr, const SfbTable& sfb,
                const float* is576, double* xr) {
  double gain = std::pow(2.0, (gr.global_gain - 210.0) / 4.0);
  double sf_mult = gr.scalefac_scale ? 1.0 : 0.5;
  if (gr.block_type == 2) {
    int line = 0;
    int split = mixed_split(sfb);
    if (gr.mixed) {
      // long bands cover lines below the split (0..35 at most rates,
      // 0..71 at 8 kHz MPEG-2.5)
      int b = 0;
      while (sfb.long_[b] < split && b < 22) {
        double s = gr.scf_l[b] + (gr.preflag ? kPretab[b] : 0);
        double f = gain * std::pow(2.0, -sf_mult * s);
        for (int i = sfb.long_[b]; i < sfb.long_[b + 1] && i < split; ++i)
          xr[i] = pow43((int)is576[i]) * f;
        b++;
      }
      line = split;
    }
    // short region: lines arrive WINDOW-GROUPED per band (before reorder)
    int start_band = gr.mixed ? 3 : 0;
    for (int b = start_band; b < 13 && line < 576; ++b) {
      int width = sfb.short_[b + 1] - sfb.short_[b];
      for (int w = 0; w < 3; ++w) {
        double s = sf_mult * gr.scf_s[b < 13 ? b : 12][w];
        double f = std::pow(2.0, (gr.global_gain - 210.0 -
                                  8.0 * gr.subblock_gain[w]) / 4.0) *
                   std::pow(2.0, -s);
        for (int i = 0; i < width && line < 576; ++i, ++line)
          xr[line] = pow43((int)is576[line]) * f;
      }
    }
    for (; line < 576; ++line) xr[line] = 0.0;
  } else {
    for (int b = 0; b < 22; ++b) {
      double s = gr.scf_l[b] + (gr.preflag ? kPretab[b] : 0);
      double f = gain * std::pow(2.0, -sf_mult * s);
      for (int i = sfb.long_[b]; i < sfb.long_[b + 1]; ++i)
        xr[i] = pow43((int)is576[i]) * f;
    }
  }
}

// ------------------------------------------------------------- stereo
void apply_stereo(const Header& h, const Granule& grL, const Granule& grR,
                  const SfbTable& sfb, double* xl, double* xr_,
                  int lastR) {
  bool ms = h.mode == 1 && (h.mode_ext & 2);
  bool intensity = h.mode == 1 && (h.mode_ext & 1);
  const double inv_sqrt2 = 0.7071067811865476;
  bool shortblk = grR.block_type == 2;
  // Intensity bound (long blocks): the first scalefactor band lying
  // ENTIRELY in the right channel's zero region — lastR+1 rounded UP to
  // the next band boundary (a partially-zero band is not intensity-
  // coded, and MS extends through it; conformance vs libmpg123 caught
  // the unrounded version when the zero region started mid-band).
  // Short blocks determine the zero part PER WINDOW instead (below).
  int bound = 576;
  if (intensity && !shortblk) {
    int z = lastR + 1;
    for (int b = 0; b < 23; ++b)
      if (sfb.long_[b] >= z) { bound = sfb.long_[b]; break; }
  }
  if (ms && !(intensity && shortblk)) {
    int lim = intensity ? bound : 576;
    for (int i = 0; i < lim; ++i) {
      double m = xl[i], s = xr_[i];
      xl[i] = (m + s) * inv_sqrt2;
      xr_[i] = (m - s) * inv_sqrt2;
    }
  }
  if (!intensity) return;
  // Intensity stereo (conformance-tested with hand-crafted joint-stereo
  // frames, tests/test_mp3_native.py — lame never emits intensity).
  //
  // MPEG-1 (11172-3): is_pos 0..6 pans via tan(is_pos*pi/12); 7 means
  // "no intensity" for the band (falls back to MS when MS is also on).
  // LSF (13818-3): the right channel's scalefactors ARE the positions;
  // the per-band all-ones value (2^slen - 1, recorded at read time) is
  // the no-intensity marker, and panning is io^((is_pos+1)/2) on one
  // side with io = 2^-1/2 or 2^-1/4 by scalefac_compress bit 0.
  const bool lsf = h.lsf();
  const double io = (grR.scalefac_compress & 1)
                        ? 0.7071067811865476      // 2^-1/2
                        : 0.8408964152537145;     // 2^-1/4
  auto band_k = [&](int is_pos, int ill, double* kl, double* kr) {
    if (lsf) {
      if (is_pos == ill) return false;
      *kl = 1.0;
      *kr = 1.0;
      if (is_pos & 1)
        *kl = std::pow(io, (is_pos + 1) / 2);
      else if (is_pos)
        *kr = std::pow(io, is_pos / 2);
      return true;
    }
    if (is_pos == 7) return false;
    double ratio = std::tan(is_pos * 3.14159265358979323846 / 12.0);
    *kl = ratio / (1.0 + ratio);
    *kr = 1.0 / (1.0 + ratio);
    return true;
  };
  auto band_fallback = [&](int lo, int hi) {
    if (!ms) return;
    for (int i = lo; i < hi && i < 576; ++i) {
      double m = xl[i], s = xr_[i];
      xl[i] = (m + s) * inv_sqrt2;
      xr_[i] = (m - s) * inv_sqrt2;
    }
  };
  if (shortblk) {
    // Short blocks: the spec determines the zero part PER WINDOW — for
    // each window w, bands above the window's last nonzero right-channel
    // band are intensity; bands at/below it get MS (or plain stereo).
    // All processing happens on the window-grouped (pre-reorder) layout.
    // Band 12 has no transmitted scalefactor — it reuses band 11's
    // is_pos (the spec's trailing-band rule).
    int start_band = grR.mixed ? 3 : 0;
    int region0 = grR.mixed ? mixed_split(sfb) : 0;
    int lastb[3] = {-1, -1, -1};
    for (int b = start_band; b < 13; ++b) {
      int width = sfb.short_[b + 1] - sfb.short_[b];
      int base = region0 + 3 * (sfb.short_[b] - sfb.short_[start_band]);
      for (int w = 0; w < 3; ++w)
        for (int i = 0; i < width; ++i) {
          int idx = base + w * width + i;
          if (idx < 576 && xr_[idx] != 0.0 && b > lastb[w]) lastb[w] = b;
        }
    }
    // mixed-block long region [0, region0): its own single zero part
    if (grR.mixed) {
      int lastl = -1;
      for (int i = 0; i < region0; ++i)
        if (xr_[i] != 0.0) lastl = i;
      int lbound = region0;
      for (int b = 0; b < 23; ++b)
        if (sfb.long_[b] >= lastl + 1) {
          lbound = sfb.long_[b] < region0 ? sfb.long_[b] : region0;
          break;
        }
      band_fallback(0, lbound);                   // MS below the bound
      for (int b = 0; b < 22 && sfb.long_[b] < region0; ++b) {
        if (sfb.long_[b] < lbound) continue;
        int sb = b < 21 ? b : 20;
        double kl, kr;
        if (!band_k(grR.scf_l[sb], lsf ? grR.ill_l[sb] : 7, &kl, &kr)) {
          band_fallback(sfb.long_[b], sfb.long_[b + 1]);
          continue;
        }
        for (int i = sfb.long_[b];
             i < sfb.long_[b + 1] && i < region0; ++i) {
          double v = xl[i];
          xl[i] = v * kl;
          xr_[i] = v * kr;
        }
      }
    }
    for (int b = start_band; b < 13; ++b) {
      int width = sfb.short_[b + 1] - sfb.short_[b];
      int base = region0 + 3 * (sfb.short_[b] - sfb.short_[start_band]);
      int sb = b < 12 ? b : 11;
      for (int w = 0; w < 3; ++w) {
        int lo = base + w * width;
        if (b <= lastb[w]) {                      // window's non-zero part
          band_fallback(lo, lo + width);
          continue;
        }
        int is_pos = grR.scf_s[sb][w];
        int ill = lsf ? grR.ill_s[sb][w] : 7;
        double kl, kr;
        if (!band_k(is_pos, ill, &kl, &kr)) {
          band_fallback(lo, lo + width);
          continue;
        }
        for (int i = 0; i < width; ++i) {
          int idx = lo + i;
          if (idx >= 576) break;
          double v = xl[idx];
          xl[idx] = v * kl;
          xr_[idx] = v * kr;
        }
      }
    }
  } else {
    // band 21 has no transmitted scalefactor — trailing-band rule
    for (int b = 0; b < 22; ++b) {
      if (sfb.long_[b] < bound) continue;
      int sb = b < 21 ? b : 20;
      int is_pos = grR.scf_l[sb];
      int ill = lsf ? grR.ill_l[sb] : 7;
      double kl, kr;
      if (!band_k(is_pos, ill, &kl, &kr)) {
        band_fallback(sfb.long_[b], sfb.long_[b + 1]);
        continue;
      }
      for (int i = sfb.long_[b]; i < sfb.long_[b + 1]; ++i) {
        double v = xl[i];
        xl[i] = v * kl;
        xr_[i] = v * kr;
      }
    }
  }
}

// ------------------------------------------------------------- reorder
void reorder_short(const Granule& gr, const SfbTable& sfb, double* xr) {
  if (gr.block_type != 2) return;
  double tmp[576];
  int start_band = gr.mixed ? 3 : 0;
  int base = gr.mixed ? mixed_split(sfb) : 0;
  for (int i = 0; i < base; ++i) tmp[i] = xr[i];
  int line = base;
  for (int b = start_band; b < 13 && line < 576; ++b) {
    int width = sfb.short_[b + 1] - sfb.short_[b];
    int out0 = base + 3 * (sfb.short_[b] - sfb.short_[start_band]);
    for (int w = 0; w < 3; ++w)
      for (int i = 0; i < width; ++i, ++line) {
        int idx = out0 + i * 3 + w;
        if (idx < 576 && line < 576) tmp[idx] = xr[line];
      }
  }
  for (int i = line; i < 576; ++i) tmp[i] = 0.0;
  // zero anything beyond what the short bands cover
  std::memcpy(xr, tmp, sizeof(tmp));
}

// ---------------------------------------------------------- antialias
struct AaTables {
  double cs[8], ca[8];
  AaTables() {
    const double ci[8] = {-0.6, -0.535, -0.33, -0.185,
                          -0.095, -0.041, -0.0142, -0.0037};
    for (int i = 0; i < 8; ++i) {
      cs[i] = 1.0 / std::sqrt(1.0 + ci[i] * ci[i]);
      ca[i] = ci[i] * cs[i];
    }
  }
};

void antialias(const Granule& gr, double* xr) {
  static const AaTables t;              // magic static (see LutCache)
  const double* cs = t.cs;
  const double* ca = t.ca;
  int sblim = 32;
  if (gr.block_type == 2) sblim = gr.mixed ? 2 : 0;
  for (int sb = 1; sb < sblim; ++sb) {
    for (int i = 0; i < 8; ++i) {
      int a = 18 * sb - 1 - i;
      int b = 18 * sb + i;
      double lo = xr[a], hi = xr[b];
      xr[a] = lo * cs[i] - hi * ca[i];
      xr[b] = hi * cs[i] + lo * ca[i];
    }
  }
}

// ------------------------------------------------------------- IMDCT
struct ImdctTables {
  double win[4][36];
  double cos36[18][36];  // [m][p]
  double cos12[6][12];
  double wshort[12];
  ImdctTables() {
    const double pi = 3.14159265358979323846;
    for (int i = 0; i < 12; ++i)
      wshort[i] = std::sin(pi / 12.0 * (i + 0.5));
    for (int i = 0; i < 36; ++i) {
      win[0][i] = std::sin(pi / 36.0 * (i + 0.5));
      win[1][i] = i < 18 ? std::sin(pi / 36.0 * (i + 0.5))
                  : i < 24 ? 1.0
                  : i < 30 ? std::sin(pi / 12.0 * (i - 18 + 0.5))
                           : 0.0;
      win[3][i] = i < 6 ? 0.0
                  : i < 12 ? std::sin(pi / 12.0 * (i - 6 + 0.5))
                  : i < 18 ? 1.0
                           : std::sin(pi / 36.0 * (i + 0.5));
      win[2][i] = 0.0;  // short handled separately
    }
    for (int m = 0; m < 18; ++m)
      for (int p = 0; p < 36; ++p)
        cos36[m][p] = std::cos(pi / 72.0 * (2 * p + 1 + 18) * (2 * m + 1));
    for (int m = 0; m < 6; ++m)
      for (int p = 0; p < 12; ++p)
        cos12[m][p] = std::cos(pi / 24.0 * (2 * p + 1 + 6) * (2 * m + 1));
  }
};
const ImdctTables& imdct_tables() {
  static ImdctTables t;
  return t;
}

// xr 18 lines of one subband -> 36 windowed time samples
void imdct_block(const double* in, int block_type, double* out36) {
  const ImdctTables& T = imdct_tables();
  if (block_type == 2) {
    const double* wshort = T.wshort;
    for (int i = 0; i < 36; ++i) out36[i] = 0.0;
    for (int w = 0; w < 3; ++w) {
      double z[12];
      for (int p = 0; p < 12; ++p) {
        double acc = 0.0;
        for (int m = 0; m < 6; ++m) acc += in[w + 3 * m] * T.cos12[m][p];
        z[p] = acc * wshort[p];
      }
      int off = 6 + 6 * w;
      for (int p = 0; p < 12; ++p) out36[off + p] += z[p];
    }
  } else {
    for (int p = 0; p < 36; ++p) {
      double acc = 0.0;
      for (int m = 0; m < 18; ++m) acc += in[m] * T.cos36[m][p];
      out36[p] = acc * T.win[block_type][p];
    }
  }
}

// ---------------------------------------------------------- synthesis
struct Synth {
  double V[1024];
  Synth() { std::memset(V, 0, sizeof(V)); }
  struct Matrix {
    double N[64][32];
    Matrix() {
      const double pi = 3.14159265358979323846;
      for (int i = 0; i < 64; ++i)
        for (int k = 0; k < 32; ++k)
          N[i][k] = std::cos((16.0 + i) * (2.0 * k + 1.0) * pi / 64.0);
    }
  };
  void slot(const double* S32, float* pcm32) {
    static const Matrix m;              // magic static (see LutCache)
    const auto& N = m.N;
    std::memmove(V + 64, V, sizeof(double) * 960);
    for (int i = 0; i < 64; ++i) {
      double acc = 0.0;
      for (int k = 0; k < 32; ++k) acc += N[i][k] * S32[k];
      V[i] = acc;
    }
    double U[512];
    for (int i = 0; i < 8; ++i) {
      for (int j = 0; j < 32; ++j) {
        U[i * 64 + j] = V[i * 128 + j];
        U[i * 64 + 32 + j] = V[i * 128 + 96 + j];
      }
    }
    for (int j = 0; j < 32; ++j) {
      double acc = 0.0;
      for (int i = 0; i < 16; ++i)
        acc += mas_synth_window[j + 32 * i] * U[j + 32 * i];
      pcm32[j] = (float)acc;
    }
  }
};

// ------------------------------------------------------------- decoder
struct ChannelState {
  double overlap[32][18] = {{0.0}};
  Synth synth;
};

struct Decoder {
  Header h;
  SideInfo si;
  std::vector<uint8_t> resv;
  ChannelState chs[2];
  std::vector<float> pcm;  // interleaved
  int channels = 0;
  int rate = 0;
  bool configured = false;

  void granule_to_pcm(const Granule& gr, double* xr, ChannelState* cs,
                      float* out, int stride) {
    antialias(gr, xr);
    double frame36[36];
    double sblock[18][32];
    for (int sb = 0; sb < 32; ++sb) {
      int bt = gr.block_type;
      if (gr.block_type == 2 && gr.mixed && sb < 2) bt = 0;
      imdct_block(xr + 18 * sb, bt, frame36);
      for (int i = 0; i < 18; ++i) {
        double v = frame36[i] + cs->overlap[sb][i];
        cs->overlap[sb][i] = frame36[18 + i];
        // frequency inversion: odd subband, odd slot
        if ((sb & 1) && (i & 1)) v = -v;
        sblock[i][sb] = v;
      }
    }
    float pcm32[32];
    for (int i = 0; i < 18; ++i) {
      cs->synth.slot(sblock[i], pcm32);
      for (int j = 0; j < 32; ++j) out[(i * 32 + j) * stride] = pcm32[j];
    }
  }

  // returns false on unrecoverable stream errors (frame skipped)
  bool frame(const uint8_t* fp, int nbytes) {
    BitReader hdr(fp, nbytes);
    hdr.pos = 32;  // header already parsed
    if (h.crc) hdr.pos += 16;
    if (!read_side_info(&hdr, h, &si)) {
      // keep the bit reservoir aligned even when skipping the frame:
      // its payload is still part of the stream's main-data byte
      // sequence, and later frames' main_data_begin counts back
      // through it — dropping it would desync every following frame.
      // The side-info length is fixed per version/channel count.
      int fixed_side = h.lsf() ? (h.channels() == 1 ? 9 : 17)
                               : (h.channels() == 1 ? 17 : 32);
      int off = 4 + (h.crc ? 2 : 0) + fixed_side;
      if (off < nbytes) resv.insert(resv.end(), fp + off, fp + nbytes);
      return false;
    }
    int side_bytes = (int)(hdr.pos / 8);
    int main_bytes = nbytes - side_bytes;
    if (main_bytes < 0) return false;

    int64_t resv_before = (int64_t)resv.size();
    resv.insert(resv.end(), fp + side_bytes, fp + nbytes);
    int64_t start_byte = resv_before - si.main_data_begin;
    bool decodable = start_byte >= 0;

    int ch = h.channels();
    const SfbTable* sfb = sfb_for(h.rate);
    if (!sfb) return false;

    size_t pcm_at = pcm.size();
    pcm.resize(pcm_at + (size_t)h.samples() * ch, 0.0f);

    if (decodable) {
      BitReader br(resv.data(), (int64_t)resv.size());
      br.pos = start_byte * 8;
      for (int g = 0; g < h.granules(); ++g) {
        double xr[2][576];
        float is576[576];
        int last_nz[2] = {-1, -1};
        bool ok[2] = {true, true};
        for (int c = 0; c < ch; ++c) {
          Granule* gr = &si.gr[g][c];
          int64_t part2_start = br.pos;
          if (h.lsf()) {
            bool int_ch = c == 1 && h.mode == 1 && (h.mode_ext & 1);
            read_scalefactors_lsf(&br, h, c, gr, int_ch);
          } else {
            read_scalefactors_v1(&br, si, g, c, gr);
          }
          int n = (int)decode_huffman(&br, h, *gr, sfb->long_, is576,
                                      part2_start);
          if (n < 0) {
            ok[c] = false;
            std::memset(xr[c], 0, sizeof(xr[c]));
            br.pos = part2_start + gr->part2_3_length;
            continue;
          }
          for (int i = 575; i >= 0; --i)
            if (is576[i] != 0.0f) { last_nz[c] = i; break; }
          requantize(h, *gr, *sfb, is576, xr[c]);
        }
        if (ch == 2 && ok[0] && ok[1] && h.mode == 1)
          // one path for MPEG-1 and LSF: MS butterfly below the
          // intensity bound, version-specific intensity panning above
          apply_stereo(h, si.gr[g][0], si.gr[g][1], *sfb, xr[0], xr[1],
                       last_nz[1]);
        for (int c = 0; c < ch; ++c) {
          reorder_short(si.gr[g][c], *sfb, xr[c]);
          granule_to_pcm(si.gr[g][c], xr[c], &chs[c],
                         pcm.data() + pcm_at + (size_t)g * 576 * ch + c,
                         ch);
        }
      }
    }

    // bound the reservoir (spec: main_data_begin <= 511 bytes)
    if (resv.size() > 2048)
      resv.erase(resv.begin(), resv.end() - 1024);
    return true;
  }
};

// Xing/Info/VBRI VBR-header frame: encoder metadata stored as a valid
// (usually silent) frame. mpg123/ffmpeg skip it; decoding it as audio
// would prepend ~one granule of silence and shift every timestamp.
bool is_info_frame(const uint8_t* fp, const Header& h, int64_t nbytes) {
  int side = h.lsf() ? (h.channels() == 1 ? 9 : 17)
                     : (h.channels() == 1 ? 17 : 32);
  int64_t off = 4 + (h.crc ? 2 : 0) + side;
  if (off + 4 <= nbytes && (!std::memcmp(fp + off, "Xing", 4) ||
                            !std::memcmp(fp + off, "Info", 4)))
    return true;
  // VBRI (Fraunhofer) sits at a fixed 32-byte offset past the header
  return nbytes >= 40 && !std::memcmp(fp + 36, "VBRI", 4);
}

}  // namespace

extern "C" {

int mas_mp3_decode(const uint8_t* data, int64_t len, float** out,
                   int64_t* out_frames, int32_t* channels, int32_t* rate) {
  *out = nullptr;
  *out_frames = 0;
  int64_t i = 0;
  // skip ID3v2
  if (len > 10 && data[0] == 'I' && data[1] == 'D' && data[2] == '3') {
    int64_t sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) |
                 ((data[8] & 0x7F) << 7) | (data[9] & 0x7F);
    i = 10 + sz;
  }
  Decoder dec;
  int frames = 0;
  while (i + 4 <= len) {
    Header h;
    if (!parse_header(data + i, &h)) {
      i++;
      continue;
    }
    if (i + h.frame_bytes > len) break;
    if (!dec.configured) {
      // False-sync guard: a byte pair inside leading junk can parse as
      // a valid header; locking the stream format onto it would reject
      // the whole file at the first REAL frame's "format change". When
      // another header fits behind this frame, require it to agree on
      // rate/channels/version before configuring (bitrate/padding may
      // legitimately vary frame to frame in VBR streams).
      if (i + h.frame_bytes + 4 <= len) {
        Header h2;
        if (!parse_header(data + i + h.frame_bytes, &h2) ||
            h2.rate != h.rate || h2.channels() != h.channels() ||
            h2.version != h.version) {
          // Lookahead failed — but a single-frame MP3 with trailing
          // junk (ID3v1 tag, padding) has no next header to agree
          // with. Accept the candidate only when (a) NO parseable
          // header exists anywhere after it (a real stream later
          // means this sync sits inside leading junk) and (b) its
          // own side info parses cleanly (ADVICE r3).
          bool stream_later = false;
          for (int64_t j = i + h.frame_bytes; j + 4 <= len; ++j) {
            Header hj;
            if (parse_header(data + j, &hj)) { stream_later = true; break; }
          }
          BitReader sihdr(data + i, h.frame_bytes);
          sihdr.pos = 32 + (h.crc ? 16 : 0);
          SideInfo si_check;
          if (stream_later || !read_side_info(&sihdr, h, &si_check)) {
            i++;
            continue;
          }
        }
      }
      if (is_info_frame(data + i, h, h.frame_bytes)) {
        i += h.frame_bytes;   // skip the metadata frame, stay unconfigured
        continue;
      }
      dec.h = h;
      dec.channels = h.channels();
      dec.rate = h.rate;
      dec.configured = true;
    } else if (h.rate != dec.rate || h.channels() != dec.channels) {
      break;  // format change mid-stream: stop at the consistent prefix
    }
    dec.h = h;  // bitrate/padding/mode_ext may vary frame to frame
    if (dec.frame(data + i, h.frame_bytes)) frames++;
    i += h.frame_bytes;
  }
  if (!frames || dec.pcm.empty()) return -1;
  float* buf = (float*)malloc(dec.pcm.size() * sizeof(float));
  if (!buf) return -2;
  std::memcpy(buf, dec.pcm.data(), dec.pcm.size() * sizeof(float));
  *out = buf;
  *out_frames = (int64_t)(dec.pcm.size() / dec.channels);
  *channels = dec.channels;
  *rate = dec.rate;
  return 0;
}

void mas_mp3_free(float* p) { free(p); }

}  // extern "C"
