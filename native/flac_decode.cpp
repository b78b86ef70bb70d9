// FLAC decoder — native data loader for compressed audio import.
//
// The reference imports "any FFmpeg-readable file" by linking libav* and
// letting avcodec_decode_audio4 do the work (/root/reference/app.cpp:624-741).
// This environment has no FFmpeg, so the framework decodes FLAC natively:
// full support for the streamable subset — STREAMINFO, frames with
// constant / verbatim / fixed(0-4) / LPC(1-32) subframes, 4- and 5-bit Rice
// partitioned residuals with escape codes, wasted bits, and left/right/mid
// side stereo decorrelation.  Two-call protocol mirroring the WAV decoder
// (melonix_native.cpp): mlx_flac_info sizes the buffer, mlx_flac_read fills
// it with interleaved (or mean-downmixed) float32 at the file's own rate —
// the same contract as the reference's swr_convert to float
// (app.cpp:669-684).
//
// Both frame-header CRC-8 and whole-frame CRC-16 are verified, so corrupt
// input fails soft (negative return) instead of emitting garbage — the
// reference's log-and-return contract (app.cpp:628-694).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Bits {
  const uint8_t* d;
  size_t n;           // total bytes
  size_t bitpos = 0;  // absolute bit position
  bool ok = true;

  uint32_t u(int k) {
    uint32_t v = 0;
    while (k > 0) {
      if (bitpos >= 8 * n) {
        ok = false;
        return 0;
      }
      const size_t byte = bitpos >> 3;
      const int off = (int)(bitpos & 7);
      const int take = std::min(k, 8 - off);
      const int shift = 8 - off - take;
      v = (v << take) | ((uint32_t)(d[byte] >> shift) & ((1u << take) - 1u));
      bitpos += (size_t)take;
      k -= take;
    }
    return v;
  }

  uint64_t u64(int k) {
    uint64_t v = 0;
    if (k > 32) {
      v = u(k - 32);
      v = (v << 32) | u(32);
    } else {
      v = u(k);
    }
    return v;
  }

  int32_t s(int k) {  // signed, two's complement
    if (k == 0) return 0;
    uint32_t v = u(k);
    if (k < 32 && (v & (1u << (k - 1)))) v |= ~((1u << k) - 1u);
    return (int32_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (ok && u(1) == 0) {
      ++q;
      if (q > 1u << 24) {  // corrupt stream guard
        ok = false;
        return 0;
      }
    }
    return q;
  }

  void align() { bitpos = (bitpos + 7) & ~(size_t)7; }
  size_t bytepos() const { return bitpos >> 3; }
};

uint64_t utf8_num(Bits& b) {
  const uint32_t x = b.u(8);
  uint64_t v = 0;
  int more = 0;
  if (x < 0x80) return x;
  if ((x & 0xE0) == 0xC0) { v = x & 0x1F; more = 1; }
  else if ((x & 0xF0) == 0xE0) { v = x & 0x0F; more = 2; }
  else if ((x & 0xF8) == 0xF0) { v = x & 0x07; more = 3; }
  else if ((x & 0xFC) == 0xF8) { v = x & 0x03; more = 4; }
  else if ((x & 0xFE) == 0xFC) { v = x & 0x01; more = 5; }
  else if (x == 0xFE) { v = 0; more = 6; }
  else { b.ok = false; return 0; }
  for (int i = 0; i < more; ++i) {
    const uint32_t c = b.u(8);
    if ((c & 0xC0) != 0x80) { b.ok = false; return 0; }
    v = (v << 6) | (c & 0x3F);
  }
  return v;
}

uint8_t crc8(const uint8_t* p, size_t n) {  // poly x^8+x^2+x+1 (0x07)
  uint8_t c = 0;
  for (size_t i = 0; i < n; ++i) {
    c ^= p[i];
    for (int k = 0; k < 8; ++k) c = (uint8_t)((c & 0x80) ? (c << 1) ^ 0x07 : c << 1);
  }
  return c;
}

uint16_t crc16(const uint8_t* p, size_t n) {  // poly 0x8005
  uint16_t c = 0;
  for (size_t i = 0; i < n; ++i) {
    c ^= (uint16_t)(p[i] << 8);
    for (int k = 0; k < 8; ++k)
      c = (uint16_t)((c & 0x8000) ? (c << 1) ^ 0x8005 : c << 1);
  }
  return c;
}

struct StreamInfo {
  uint32_t rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total = 0;   // 0 = unknown
  size_t frames_at = 0;  // byte offset of the first audio frame
};

int parse_streaminfo(const std::vector<uint8_t>& f, StreamInfo* si) {
  if (f.size() < 8 || memcmp(f.data(), "fLaC", 4) != 0) return -2;
  size_t p = 4;
  bool saw_info = false;
  for (;;) {
    if (p + 4 > f.size()) return -3;
    const bool last = (f[p] & 0x80) != 0;
    const int type = f[p] & 0x7F;
    const uint32_t len = ((uint32_t)f[p + 1] << 16) | ((uint32_t)f[p + 2] << 8) | f[p + 3];
    p += 4;
    if (p + len > f.size()) return -3;
    if (type == 0) {  // STREAMINFO
      if (len < 34) return -3;
      Bits b{f.data() + p, len};
      b.u(16);  // min block size
      b.u(16);  // max block size
      b.u(24);  // min frame size
      b.u(24);  // max frame size
      si->rate = b.u(20);
      si->channels = (int)b.u(3) + 1;
      si->bps = (int)b.u(5) + 1;
      si->total = b.u64(36);
      saw_info = true;
    }
    p += len;
    if (last) break;
  }
  if (!saw_info || si->rate == 0) return -4;
  si->frames_at = p;
  return 0;
}

// Decode the residual of one subframe into res[order..blocksize).
bool read_residual(Bits& b, int order, int blocksize, int32_t* res) {
  const uint32_t method = b.u(2);
  if (method > 1) return false;
  const int pbits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xF : 0x1F;
  const int po = (int)b.u(4);
  const int parts = 1 << po;
  if (blocksize % parts != 0) return false;
  int idx = order;
  for (int part = 0; part < parts; ++part) {
    int cnt = blocksize >> po;
    if (part == 0) cnt -= order;
    if (cnt < 0) return false;
    const uint32_t param = b.u(pbits);
    if (param == escape) {
      const int raw = (int)b.u(5);
      for (int i = 0; i < cnt; ++i) res[idx++] = b.s(raw);
    } else {
      for (int i = 0; i < cnt; ++i) {
        const uint32_t q = b.unary();
        const uint32_t r = param ? b.u((int)param) : 0;
        const uint32_t v = (q << param) | r;
        res[idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));  // zigzag
      }
    }
    if (!b.ok) return false;
  }
  return true;
}

// Wrapping 32-bit narrowing: legal streams never overflow the predictor
// arithmetic, but corrupt residuals can, and signed overflow is UB —
// compute in 64-bit and wrap explicitly (fail-soft garbage, not UB).
static inline int32_t wrap32(int64_t v) {
  return (int32_t)(uint32_t)(uint64_t)v;
}

bool read_subframe(Bits& b, int blocksize, int bps, int32_t* out) {
  if (b.u(1) != 0) return false;  // padding bit
  const uint32_t type = b.u(6);
  int wasted = 0;
  if (b.u(1)) wasted = (int)b.unary() + 1;
  const int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 32 || !b.ok) return false;

  if (type == 0) {  // CONSTANT
    const int32_t v = b.s(ebps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = b.s(ebps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    const int order = (int)(type & 0x07);
    if (order > blocksize) return false;  // warm-up must fit the block
    for (int i = 0; i < order; ++i) out[i] = b.s(ebps);
    if (!read_residual(b, order, blocksize, out)) return false;
    switch (order) {
      case 0: break;
      case 1:
        for (int i = 1; i < blocksize; ++i)
          out[i] = wrap32((int64_t)out[i] + out[i - 1]);
        break;
      case 2:
        for (int i = 2; i < blocksize; ++i)
          out[i] = wrap32((int64_t)out[i] + 2 * (int64_t)out[i - 1] - out[i - 2]);
        break;
      case 3:
        for (int i = 3; i < blocksize; ++i)
          out[i] = wrap32((int64_t)out[i] + 3 * (int64_t)out[i - 1] -
                          3 * (int64_t)out[i - 2] + out[i - 3]);
        break;
      case 4:
        for (int i = 4; i < blocksize; ++i)
          out[i] = wrap32((int64_t)out[i] + 4 * (int64_t)out[i - 1] -
                          6 * (int64_t)out[i - 2] + 4 * (int64_t)out[i - 3] -
                          out[i - 4]);
        break;
    }
  } else if (type & 0x20) {  // LPC
    const int order = (int)(type & 0x1F) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = b.s(ebps);
    const uint32_t prec_m1 = b.u(4);
    if (prec_m1 == 0xF) return false;
    const int precision = (int)prec_m1 + 1;
    const int shift = b.s(5);
    if (shift < 0) return false;
    int32_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = b.s(precision);
    if (!read_residual(b, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += (int64_t)coef[j] * out[i - 1 - j];
      out[i] = wrap32((int64_t)out[i] + (acc >> shift));
    }
  } else {
    return false;  // reserved subframe type
  }
  if (!b.ok) return false;
  if (wasted)
    for (int i = 0; i < blocksize; ++i)
      out[i] = (int32_t)((uint32_t)out[i] << wasted);
  return true;
}

// Decode one frame starting at b.bitpos (byte aligned).  Returns blocksize
// (>0) with per-channel int32 samples in chan, 0 on clean EOF, <0 on error.
int read_frame(Bits& b, const StreamInfo& si,
               std::vector<std::vector<int32_t>>& chan) {
  b.align();
  const size_t frame_start = b.bytepos();
  if (frame_start >= b.n) return 0;  // EOF
  if (b.u(14) != 0x3FFE) return b.ok ? -10 : 0;
  b.u(1);  // reserved
  b.u(1);  // blocking strategy
  const uint32_t bs_code = b.u(4);
  const uint32_t sr_code = b.u(4);
  const uint32_t ch_code = b.u(4);
  const uint32_t ss_code = b.u(3);
  b.u(1);  // reserved
  utf8_num(b);
  int blocksize;
  switch (bs_code) {
    case 0: return -11;
    case 1: blocksize = 192; break;
    case 6: blocksize = 0; break;  // 8-bit below
    case 7: blocksize = 0; break;  // 16-bit below
    default:
      blocksize = bs_code <= 5 ? 576 << (bs_code - 2) : 256 << (bs_code - 8);
  }
  if (bs_code == 6) blocksize = (int)b.u(8) + 1;
  if (bs_code == 7) blocksize = (int)b.u(16) + 1;
  static const int kRates[] = {0,     88200, 176400, 192000, 8000,  16000,
                               22050, 24000, 32000,  44100,  48000, 96000};
  uint32_t rate = si.rate;
  if (sr_code == 15) return -12;
  if (sr_code >= 1 && sr_code <= 11) rate = (uint32_t)kRates[sr_code];
  if (sr_code == 12) rate = b.u(8) * 1000;
  if (sr_code == 13) rate = b.u(16);
  if (sr_code == 14) rate = b.u(16) * 10;
  if (rate != si.rate) return -12;  // one stream, one rate (app.cpp:684)
  int nch;
  if (ch_code < 8) nch = (int)ch_code + 1;
  else if (ch_code <= 10) nch = 2;
  else return -13;
  if (nch != si.channels) return -13;
  int bps = si.bps;
  switch (ss_code) {
    case 0: break;
    case 1: bps = 8; break;
    case 2: bps = 12; break;
    case 4: bps = 16; break;
    case 5: bps = 20; break;
    case 6: bps = 24; break;
    case 7: bps = 32; break;
    default: return -14;
  }
  // The reader normalizes every sample by the STREAMINFO bps; a frame at a
  // different depth would decode at the wrong amplitude, so reject it like
  // the rate mismatch above rather than mis-scale.
  if (bps != si.bps) return -14;
  // Header CRC-8 covers sync through the CRC byte's predecessor.
  b.align();
  const size_t hdr_end = b.bytepos();
  const uint8_t want8 = (uint8_t)b.u(8);
  if (!b.ok) return -15;
  if (crc8(b.d + frame_start, hdr_end - frame_start) != want8) return -15;

  if ((size_t)nch > chan.size()) chan.resize((size_t)nch);
  for (int c = 0; c < nch; ++c) {
    chan[(size_t)c].resize((size_t)blocksize);
    int sub_bps = bps;
    if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
        (ch_code == 10 && c == 1))
      sub_bps += 1;  // the side channel carries one extra bit
    if (!read_subframe(b, blocksize, sub_bps, chan[(size_t)c].data()))
      return -16;
  }
  b.align();
  const size_t body_end = b.bytepos();
  const uint16_t want16 = (uint16_t)b.u(16);
  if (!b.ok) return -17;
  if (crc16(b.d + frame_start, body_end - frame_start) != want16) return -17;

  // Stereo decorrelation.
  if (ch_code == 8) {  // left/side: right = left - side
    for (int i = 0; i < blocksize; ++i)
      chan[1][(size_t)i] = chan[0][(size_t)i] - chan[1][(size_t)i];
  } else if (ch_code == 9) {  // right/side: left = right + side
    for (int i = 0; i < blocksize; ++i)
      chan[0][(size_t)i] = chan[1][(size_t)i] + chan[0][(size_t)i];
  } else if (ch_code == 10) {  // mid/side
    for (int i = 0; i < blocksize; ++i) {
      const int32_t side = chan[1][(size_t)i];
      int64_t mid = ((int64_t)chan[0][(size_t)i] << 1) | (side & 1);
      chan[0][(size_t)i] = (int32_t)((mid + side) >> 1);
      chan[1][(size_t)i] = (int32_t)((mid - side) >> 1);
    }
  }
  return blocksize;
}

int load_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  const long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(f);
    return -2;
  }
  out->resize((size_t)sz);
  const size_t got = fread(out->data(), 1, (size_t)sz, f);
  fclose(f);
  return got == (size_t)sz ? 0 : -3;
}

}  // namespace

extern "C" int32_t mlx_flac_info(const char* path, int64_t* n_frames,
                                 int32_t* channels, int32_t* rate,
                                 int32_t* bits) {
  std::vector<uint8_t> file;
  int rc = load_file(path, &file);
  if (rc != 0) return rc;
  StreamInfo si;
  rc = parse_streaminfo(file, &si);
  if (rc != 0) return rc;
  if (si.total == 0) {
    // Unknown length: frames are not length-prefixed, so count by decoding.
    Bits b{file.data(), file.size(), si.frames_at * 8};
    std::vector<std::vector<int32_t>> chan;
    uint64_t total = 0;
    for (;;) {
      const int bs = read_frame(b, si, chan);
      if (bs == 0) break;
      if (bs < 0) return bs;
      total += (uint64_t)bs;
    }
    si.total = total;
  }
  *n_frames = (int64_t)si.total;
  *channels = si.channels;
  *rate = (int32_t)si.rate;
  *bits = si.bps;
  return 0;
}

extern "C" int32_t mlx_flac_read(const char* path, float* out,
                                 int64_t n_frames, int32_t mono) {
  std::vector<uint8_t> file;
  int rc = load_file(path, &file);
  if (rc != 0) return rc;
  StreamInfo si;
  rc = parse_streaminfo(file, &si);
  if (rc != 0) return rc;
  Bits b{file.data(), file.size(), si.frames_at * 8};
  std::vector<std::vector<int32_t>> chan;
  int64_t done = 0;
  const int nch = si.channels;
  const float inv_mean = mono ? 1.0f / (float)nch : 1.0f;
  while (done < n_frames) {
    const int bs = read_frame(b, si, chan);
    if (bs == 0) break;
    if (bs < 0) return bs;
    const int64_t take = std::min((int64_t)bs, n_frames - done);
    for (int64_t i = 0; i < take; ++i) {
      // read_frame rejects any frame whose bps differs from STREAMINFO, so
      // the stream bps is the per-sample full scale (1 << (bps-1)).
      const float scale = 1.0f / (float)(1u << (si.bps - 1));
      if (mono) {
        float acc = 0.0f;
        for (int c = 0; c < nch; ++c)
          acc += (float)chan[(size_t)c][(size_t)i] * scale;
        out[done + i] = acc * inv_mean;
      } else {
        for (int c = 0; c < nch; ++c)
          out[(done + i) * nch + c] = (float)chan[(size_t)c][(size_t)i] * scale;
      }
    }
    done += take;
  }
  // Zero any tail the stream under-delivered (truncated file).
  const int64_t want_vals = mono ? n_frames : n_frames * nch;
  const int64_t have_vals = mono ? done : done * nch;
  for (int64_t i = have_vals; i < want_vals; ++i) out[i] = 0.0f;
  return 0;
}
