// Native Ogg Vorbis (Vorbis I) decoder for melonix-tpu audio import.
//
// Reference semantics: the upstream editor decodes any FFmpeg-readable
// file to mono float at its native rate (app.cpp:624-741); Ogg Vorbis is
// a staple of that surface.  This is a clean-room Vorbis I implementation
// (spec structure: Ogg page/packet layer -> LSB-first bit reader ->
// setup header with codebooks / floor 1 / residues 0-2 / mappings /
// modes -> per-packet floor curve, residue, inverse coupling, IMDCT,
// lapped overlap-add), float-exact against the independent libvorbisfile
// oracle (tests/test_ogg.py: ~-130 dB across rates 8-96 kHz, mono and
// coupled stereo, transient/short-block content).
//
// Scope (documented constraints, mirroring the MP3 decoder's):
//   * floor type 1 only (floor 0 is spec-legacy; no mainstream encoder
//     emits it) -> fail-soft error, callers fall back / keep state;
//   * single logical stream per file (no chaining / grouped multiplex);
//   * end-of-packet mid-decode is handled per spec (partial frame, not
//     an error); corrupt pages are skipped by CRC.
//
// ABI (two-call protocol, same as WAV/FLAC/MP3):
//   mlx_vorbis_info(path, &n_frames, &channels, &rate, &bits)
//   mlx_vorbis_read(path, out, n_frames, mono)
//
// IMDCT: DCT-IV via an M/2-point iterative radix-2 complex FFT with
// pre/post twiddles (y = extension of DCT-IV by TDAC symmetry), ~1e-10
// vs the O(n^2) definition; per-blocksize plans are cached.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

#include "pcm_cache.h"

namespace vorbis {

// ----------------------------------------------------------- Ogg layer

// Magic-static once-init (thread-safe under concurrent decodes).
static const uint32_t* crc_tab() {
  static const std::vector<uint32_t> table = [] {
    std::vector<uint32_t> t(256);
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i << 24;
      for (int j = 0; j < 8; ++j)
        c = (c & 0x80000000u) ? ((c << 1) ^ 0x04c11db7u) : (c << 1);
      t[i] = c;
    }
    return t;
  }();
  return table.data();
}

static uint32_t ogg_crc(const uint8_t* p, size_t n) {
  const uint32_t* table = crc_tab();
  uint32_t c = 0;
  for (size_t i = 0; i < n; ++i)
    c = (c << 8) ^ table[((c >> 24) & 0xff) ^ p[i]];
  return c;
}

struct Packet {
  std::vector<uint8_t> data;
  int64_t granule = -1;  // page granule if this packet ends a page, else -1
};

// Split the byte stream into Vorbis packets (first logical stream only;
// CRC-failing pages are skipped -- fail-soft resync like the MP3 header
// scan).
static bool ogg_packets(const std::vector<uint8_t>& d,
                        std::vector<Packet>* out) {
  size_t pos = 0;
  std::vector<uint8_t> pending;
  bool have_serial = false;
  uint32_t serial = 0;
  while (pos + 27 <= d.size()) {
    if (memcmp(&d[pos], "OggS", 4) != 0) {
      // resync to the next capture pattern
      size_t nxt = pos + 1;
      while (nxt + 4 <= d.size() && memcmp(&d[nxt], "OggS", 4) != 0) ++nxt;
      if (nxt + 4 > d.size()) break;
      pos = nxt;
      continue;
    }
    const uint8_t ver = d[pos + 4];
    const uint8_t htype = d[pos + 5];
    int64_t granule = 0;
    for (int i = 7; i >= 0; --i) granule = (granule << 8) | d[pos + 6 + i];
    uint32_t pserial = 0;
    for (int i = 3; i >= 0; --i) pserial = (pserial << 8) | d[pos + 14 + i];
    const uint8_t nseg = d[pos + 26];
    if (pos + 27 + nseg > d.size()) break;
    size_t body_len = 0;
    for (int i = 0; i < nseg; ++i) body_len += d[pos + 27 + i];
    const size_t body_start = pos + 27 + nseg;
    if (body_start + body_len > d.size()) break;
    // CRC with the checksum field zeroed
    uint32_t stored = 0;
    for (int i = 3; i >= 0; --i) stored = (stored << 8) | d[pos + 22 + i];
    std::vector<uint8_t> page(d.begin() + (long)pos,
                              d.begin() + (long)(body_start + body_len));
    page[22] = page[23] = page[24] = page[25] = 0;
    if (ogg_crc(page.data(), page.size()) != stored || ver != 0) {
      pos = body_start + body_len;
      continue;
    }
    if (!have_serial && (htype & 2)) {
      serial = pserial;
      have_serial = true;
    }
    if (have_serial && pserial != serial) {  // other logical stream
      pos = body_start + body_len;
      continue;
    }
    if (!(htype & 1)) pending.clear();  // fresh start: drop broken cont.
    size_t bp = body_start;
    std::vector<size_t> ends;  // indices in out of packets from this page
    for (int i = 0; i < nseg; ++i) {
      const uint8_t lace = d[pos + 27 + i];
      pending.insert(pending.end(), d.begin() + (long)bp,
                     d.begin() + (long)(bp + lace));
      bp += lace;
      if (lace < 255) {
        out->push_back({std::move(pending), -1});
        pending.clear();
        ends.push_back(out->size() - 1);
      }
    }
    if (!ends.empty()) (*out)[ends.back()].granule = granule;
    pos = body_start + body_len;
  }
  return !out->empty();
}

// ----------------------------------------------------------- bit reader

struct Reader {
  const uint8_t* d;
  size_t nbits;
  size_t pos = 0;
  bool eop = false;

  explicit Reader(const std::vector<uint8_t>& v)
      : d(v.data()), nbits(8 * v.size()) {}

  // LSB-first read; on overrun sets eop and returns 0 (callers check).
  uint32_t read(int n) {
    if (eop || pos + (size_t)n > nbits) {
      eop = true;
      pos = nbits;
      return 0;
    }
    uint32_t v = 0;
    int got = 0;
    while (got < n) {
      const uint8_t byte = d[(pos + (size_t)got) >> 3];
      const int off = (int)((pos + (size_t)got) & 7);
      const int take = std::min(8 - off, n - got);
      v |= (uint32_t)((byte >> off) & ((1u << take) - 1)) << got;
      got += take;
    }
    pos += (size_t)n;
    return v;
  }
  uint32_t read1() { return read(1); }
};

static int ilog(uint32_t x) {
  int r = 0;
  while (x) {
    ++r;
    x >>= 1;
  }
  return r;
}

static float float32_unpack(uint32_t x) {
  const double mant = (double)(x & 0x1fffffu);
  const double sign = (x & 0x80000000u) ? -1.0 : 1.0;
  const int exp = (int)((x & 0x7fe00000u) >> 21);
  return (float)(sign * mant * std::pow(2.0, exp - 788));
}

// ----------------------------------------------------------- codebooks

struct Codebook {
  int dim = 0;
  int entries = 0;
  // decode tree: nodes of 2 int32 children; >=0 internal node index,
  // <0 leaf (~entry), INT32_MIN unused
  std::vector<int32_t> tree;  // 2*i, 2*i+1
  int single_entry = -1;      // single-used-entry codebook
  int single_len = 0;
  std::vector<float> vq;  // entries*dim (empty when lookup 0)

  static constexpr int32_t UNUSED = INT32_MIN;

  bool parse(Reader& r) {
    if (r.read(24) != 0x564342u) return false;
    dim = (int)r.read(16);
    entries = (int)r.read(24);
    // Bound allocations by what the packet can actually encode: every
    // entry costs >= 1 bit (sparse flag / 5-bit length), so a 24-bit
    // entry count beyond the remaining payload is garbage, not data.
    // (A crafted header otherwise requests multi-GB buffers here.)
    if ((size_t)entries > r.nbits - r.pos) return false;
    std::vector<uint8_t> lengths((size_t)entries, 0);
    if (!r.read1()) {  // not ordered
      const bool sparse = r.read1();
      for (int i = 0; i < entries; ++i) {
        if (sparse) {
          if (r.read1()) lengths[(size_t)i] = (uint8_t)(r.read(5) + 1);
        } else {
          lengths[(size_t)i] = (uint8_t)(r.read(5) + 1);
        }
      }
    } else {
      int cur_len = (int)r.read(5) + 1;
      int cur = 0;
      while (cur < entries) {
        const int num = (int)r.read(ilog((uint32_t)(entries - cur)));
        if (cur + num > entries) return false;
        for (int i = cur; i < cur + num; ++i)
          lengths[(size_t)i] = (uint8_t)cur_len;
        cur += num;
        ++cur_len;
        if (cur_len > 32) return false;
      }
    }
    if (r.eop) return false;
    if (!assign(lengths)) return false;

    const int lookup = (int)r.read(4);
    if (lookup == 0) return !r.eop;
    if (lookup > 2) return false;
    const float minv = float32_unpack(r.read(32));
    const float delta = float32_unpack(r.read(32));
    const int value_bits = (int)r.read(4) + 1;
    const bool seq = r.read1() != 0;
    int lv = 0;
    size_t n_mult;
    if (lookup == 1) {
      if (dim <= 0) return false;
      lv = (int)std::floor(std::pow((double)entries, 1.0 / dim));
      while (std::pow((double)(lv + 1), dim) <= (double)entries) ++lv;
      while (lv > 0 && std::pow((double)lv, dim) > (double)entries) --lv;
      n_mult = (size_t)lv;
    } else {
      n_mult = (size_t)entries * (size_t)dim;
    }
    // Same payload bound for the multiplicand array (value_bits >= 1
    // each), and an absolute cap on the expanded VQ table: real streams
    // are a few thousand entries x dim <= 16; 2^26 floats (256 MB) is
    // far past any legal setup header.
    if (n_mult * (size_t)value_bits > r.nbits - r.pos) return false;
    if ((size_t)entries * (size_t)dim > (1u << 26)) return false;
    std::vector<uint32_t> mults(n_mult);
    for (size_t i = 0; i < n_mult; ++i) mults[i] = r.read(value_bits);
    if (r.eop) return false;
    vq.assign((size_t)entries * (size_t)dim, 0.0f);
    for (int e = 0; e < entries; ++e) {
      float last = 0.0f;
      if (lookup == 1) {
        int idx_div = 1;
        for (int dd = 0; dd < dim; ++dd) {
          const int off = (lv > 0) ? (e / idx_div) % lv : 0;
          const float v = (float)mults[(size_t)off] * delta + minv + last;
          vq[(size_t)e * (size_t)dim + (size_t)dd] = v;
          if (seq) last = v;
          if (lv > 0) idx_div *= lv;
        }
      } else {
        for (int dd = 0; dd < dim; ++dd) {
          const float v =
              (float)mults[(size_t)e * (size_t)dim + (size_t)dd] * delta +
              minv + last;
          vq[(size_t)e * (size_t)dim + (size_t)dd] = v;
          if (seq) last = v;
        }
      }
    }
    return true;
  }

  // Canonical left-first codeword assignment in entry order
  // (Vorbis I 3.2.1), MSB-aligned 32-bit prefix bookkeeping.
  bool assign(const std::vector<uint8_t>& lengths) {
    std::vector<int> used;
    for (int i = 0; i < entries; ++i)
      if (lengths[(size_t)i] > 0) used.push_back(i);
    tree.assign(2, UNUSED);
    single_entry = -1;
    if (used.empty()) return true;  // decode-unusable, config-legal
    if (used.size() == 1) {
      single_entry = used[0];
      single_len = lengths[(size_t)used[0]];
      return true;
    }
    uint32_t available[33] = {0};
    bool first = true;
    for (int i : used) {
      const int l = lengths[(size_t)i];
      uint32_t code;
      if (first) {
        code = 0;
        for (int j = 1; j <= l; ++j) available[j] = 1u << (32 - j);
        first = false;
      } else {
        int z = l;
        while (z > 0 && available[z] == 0) --z;
        if (z == 0) return false;  // overspecified
        const uint32_t res = available[z];
        available[z] = 0;
        code = res >> (32 - l);
        for (int y = l; y > z; --y) available[y] = res + (1u << (32 - y));
      }
      // insert into tree
      int node = 0;
      for (int b = l - 1; b > 0; --b) {
        const int bit = (int)((code >> b) & 1u);
        int32_t nxt = tree[(size_t)(2 * node + bit)];
        if (nxt == UNUSED) {
          nxt = (int32_t)(tree.size() / 2);
          tree.push_back(UNUSED);
          tree.push_back(UNUSED);
          tree[(size_t)(2 * node + bit)] = nxt;
        } else if (nxt < 0) {
          return false;
        }
        node = nxt;
      }
      const int bit = (int)(code & 1u);
      if (tree[(size_t)(2 * node + bit)] != UNUSED) return false;
      tree[(size_t)(2 * node + bit)] = ~i;
    }
    return true;
  }

  int decode_scalar(Reader& r) const {
    if (single_entry >= 0) {
      r.read(single_len);
      return r.eop ? -1 : single_entry;
    }
    int32_t node = 0;
    while (true) {
      const uint32_t bit = r.read1();
      if (r.eop) return -1;
      node = tree[(size_t)(2 * node) + bit];
      if (node == UNUSED) return -1;  // invalid codeword
      if (node < 0) return ~node;
    }
  }

  const float* decode_vq(Reader& r) const {
    const int e = decode_scalar(r);
    if (e < 0 || vq.empty()) return nullptr;
    return &vq[(size_t)e * (size_t)dim];
  }
};

// ----------------------------------------------------------- floor 1

// floor1 amplitude -> linear: 10^(((i-255)*(140/256))/20), i in [0,255].
static float floor1_db(int i) {
  // Magic-static once-init (thread-safe under concurrent decodes).
  static const std::vector<float> table = [] {
    std::vector<float> t(256);
    for (int j = 0; j < 256; ++j)
      t[(size_t)j] =
          (float)std::pow(10.0, ((j - 255) * (140.0 / 256.0)) / 20.0);
    return t;
  }();
  return table[(size_t)(i < 0 ? 0 : (i > 255 ? 255 : i))];
}

static int render_point(int x0, int y0, int x1, int y1, int X) {
  const int dy = y1 - y0;
  const int adx = x1 - x0;
  if (adx <= 0) return y0;  // unreachable after the parse-time X
                            // uniqueness check; belt-and-braces
  const int ady = dy < 0 ? -dy : dy;
  const int err = ady * (X - x0);
  const int off = err / adx;
  return dy < 0 ? y0 - off : y0 + off;
}

static void render_line(int x0, int y0, int x1, int y1, float* v, int n) {
  const int dy = y1 - y0;
  const int adx = x1 - x0;
  if (adx <= 0) {  // see render_point: parse rejects duplicate X
    if (x0 >= 0 && x0 < n) v[x0] = floor1_db(y0);
    return;
  }
  int ady = dy < 0 ? -dy : dy;
  const int base = dy / adx;  // C truncation (required by spec math)
  int y = y0;
  int err = 0;
  const int sy = dy < 0 ? base - 1 : base + 1;
  ady -= (base < 0 ? -base : base) * adx;
  if (x0 < n) v[x0] = floor1_db(y0);
  for (int x = x0 + 1; x < x1 && x < n; ++x) {
    err += ady;
    if (err >= adx) {
      err -= adx;
      y += sy;
    } else {
      y += base;
    }
    v[x] = floor1_db(y);
  }
}

struct Floor1 {
  int partitions = 0;
  std::vector<int> partition_class;
  std::vector<int> class_dim, class_sub, class_master;
  std::vector<std::vector<int>> sub_books;
  int multiplier = 1;
  std::vector<int> X;
  std::vector<int> lo_nb, hi_nb, sort_order;
  int range = 256;

  bool parse(Reader& r, int n_books) {
    partitions = (int)r.read(5);
    partition_class.resize((size_t)partitions);
    int maxc = -1;
    for (int i = 0; i < partitions; ++i) {
      partition_class[(size_t)i] = (int)r.read(4);
      maxc = std::max(maxc, partition_class[(size_t)i]);
    }
    class_dim.resize((size_t)maxc + 1);
    class_sub.resize((size_t)maxc + 1);
    class_master.resize((size_t)maxc + 1);
    sub_books.resize((size_t)maxc + 1);
    for (int c = 0; c <= maxc; ++c) {
      class_dim[(size_t)c] = (int)r.read(3) + 1;
      class_sub[(size_t)c] = (int)r.read(2);
      class_master[(size_t)c] =
          class_sub[(size_t)c] ? (int)r.read(8) : -1;
      if (class_master[(size_t)c] >= n_books) return false;
      const int nb = 1 << class_sub[(size_t)c];
      sub_books[(size_t)c].resize((size_t)nb);
      for (int k = 0; k < nb; ++k) {
        const int b = (int)r.read(8) - 1;
        if (b >= n_books) return false;
        sub_books[(size_t)c][(size_t)k] = b;
      }
    }
    multiplier = (int)r.read(2) + 1;
    const int rangebits = (int)r.read(4);
    X.clear();
    X.push_back(0);
    X.push_back(1 << rangebits);
    for (int p = 0; p < partitions; ++p) {
      const int c = partition_class[(size_t)p];
      for (int k = 0; k < class_dim[(size_t)c]; ++k)
        X.push_back((int)r.read(rangebits));
    }
    if (r.eop) return false;
    const int nv = (int)X.size();
    if (nv > 65) return false;  // spec cap (31 ranges * 2 + 2 loose bound)
    // Spec 7.2.2: floor1_x_list element values must be unique; duplicate
    // X coordinates would make the render_point/render_line divisors
    // zero (SIGFPE on a crafted stream), so reject the setup here.
    for (int i = 0; i < nv; ++i)
      for (int j = i + 1; j < nv; ++j)
        if (X[(size_t)i] == X[(size_t)j]) return false;
    lo_nb.assign((size_t)nv, 0);
    hi_nb.assign((size_t)nv, 1);
    for (int i = 2; i < nv; ++i) {
      int lo = 0, hi = 1;
      for (int j = 0; j < i; ++j) {
        if (X[(size_t)j] < X[(size_t)i] && X[(size_t)j] >= X[(size_t)lo])
          lo = j;
        if (X[(size_t)j] > X[(size_t)i] && X[(size_t)j] <= X[(size_t)hi])
          hi = j;
      }
      lo_nb[(size_t)i] = lo;
      hi_nb[(size_t)i] = hi;
    }
    sort_order.resize((size_t)nv);
    for (int i = 0; i < nv; ++i) sort_order[(size_t)i] = i;
    for (int i = 1; i < nv; ++i) {  // stable insertion sort by X
      const int o = sort_order[(size_t)i];
      int j = i - 1;
      while (j >= 0 && X[(size_t)sort_order[(size_t)j]] > X[(size_t)o]) {
        sort_order[(size_t)(j + 1)] = sort_order[(size_t)j];
        --j;
      }
      sort_order[(size_t)(j + 1)] = o;
    }
    static const int ranges[4] = {256, 128, 86, 64};
    range = ranges[multiplier - 1];
    return true;
  }

  // Decode Y values; returns false => unvoiced (or EOP => unvoiced).
  bool decode(Reader& r, const std::vector<Codebook>& books,
              std::vector<int>* Y) const {
    if (!r.read1() || r.eop) return false;
    const int ybits = ilog((uint32_t)(range - 1));
    Y->clear();
    Y->push_back((int)r.read(ybits));
    Y->push_back((int)r.read(ybits));
    for (int p = 0; p < partitions; ++p) {
      const int c = partition_class[(size_t)p];
      const int cdim = class_dim[(size_t)c];
      const int cbits = class_sub[(size_t)c];
      const int csub = (1 << cbits) - 1;
      int cval = 0;
      if (cbits) {
        cval = books[(size_t)class_master[(size_t)c]].decode_scalar(r);
        if (cval < 0) return false;
      }
      for (int k = 0; k < cdim; ++k) {
        const int book = sub_books[(size_t)c][(size_t)(cval & csub)];
        cval >>= cbits;
        if (book >= 0) {
          const int v = books[(size_t)book].decode_scalar(r);
          if (v < 0) return false;  // EOP mid-floor: unvoiced
          Y->push_back(v);
        } else {
          Y->push_back(0);
        }
      }
    }
    return !r.eop;
  }

  void curve(const std::vector<int>& Y, int n2, float* out) const {
    const int nv = (int)X.size();
    std::vector<int> finalY((size_t)nv);
    std::vector<uint8_t> step2((size_t)nv, 0);
    finalY[0] = Y[0];
    finalY[1] = Y[1];
    step2[0] = step2[1] = 1;
    for (int i = 2; i < nv; ++i) {
      const int lo = lo_nb[(size_t)i], hi = hi_nb[(size_t)i];
      const int pred = render_point(X[(size_t)lo], finalY[(size_t)lo],
                                    X[(size_t)hi], finalY[(size_t)hi],
                                    X[(size_t)i]);
      const int val = Y[(size_t)i];
      const int highroom = range - pred;
      const int lowroom = pred;
      const int room = 2 * std::min(highroom, lowroom);
      if (val) {
        step2[(size_t)lo] = step2[(size_t)hi] = step2[(size_t)i] = 1;
        if (val >= room) {
          finalY[(size_t)i] = highroom > lowroom
                                  ? val - lowroom + pred
                                  : pred - (val - highroom) - 1;
        } else {
          finalY[(size_t)i] =
              (val & 1) ? pred - ((val + 1) >> 1) : pred + (val >> 1);
        }
      } else {
        step2[(size_t)i] = 0;
        finalY[(size_t)i] = pred;
      }
    }
    auto clampy = [&](int y) {
      y = y < 0 ? 0 : (y >= range ? range - 1 : y);
      return y * multiplier;
    };
    int lx = 0;
    int ly = clampy(finalY[(size_t)sort_order[0]]);
    int hx = 0;
    for (int s = 1; s < nv; ++s) {
      const int i = sort_order[(size_t)s];
      if (!step2[(size_t)i]) continue;
      const int hy = clampy(finalY[(size_t)i]);
      hx = X[(size_t)i];
      render_line(lx, ly, hx, hy, out, n2);
      lx = hx;
      ly = hy;
    }
    if (hx < n2) {
      const float fill = floor1_db(ly);
      for (int x = hx; x < n2; ++x) out[x] = fill;
    }
  }
};

// ----------------------------------------------------------- residue

struct Residue {
  int type = 0;
  int begin = 0, end = 0, psize = 1, classifications = 1, classbook = 0;
  std::vector<uint32_t> cascade;
  std::vector<std::vector<int>> books;  // [class][pass] (-1 unused)

  bool parse(Reader& r, int rtype, int n_books,
             const std::vector<Codebook>& cb) {
    type = rtype;
    begin = (int)r.read(24);
    end = (int)r.read(24);
    psize = (int)r.read(24) + 1;
    classifications = (int)r.read(6) + 1;
    classbook = (int)r.read(8);
    if (classbook >= n_books) return false;
    cascade.resize((size_t)classifications);
    for (int c = 0; c < classifications; ++c) {
      const uint32_t low = r.read(3);
      const uint32_t high = r.read1() ? r.read(5) : 0;
      cascade[(size_t)c] = (high << 3) | low;
    }
    books.resize((size_t)classifications);
    for (int c = 0; c < classifications; ++c) {
      books[(size_t)c].assign(8, -1);
      for (int p = 0; p < 8; ++p) {
        if ((cascade[(size_t)c] >> p) & 1u) {
          const int b = (int)r.read(8);
          if (b >= n_books || cb[(size_t)b].vq.empty()) return false;
          books[(size_t)c][(size_t)p] = b;
        }
      }
    }
    return !r.eop;
  }

  // Decode into vecs (nch pointers to length-n buffers).  do_decode per
  // channel.  Type 2 interleaves all channels into one vector.
  void decode(Reader& r, const std::vector<Codebook>& cb,
              std::vector<float*>& vecs, const std::vector<uint8_t>& dd,
              int n, std::vector<float>* scratch) const {
    const int nch = (int)vecs.size();
    if (type == 2) {
      bool any = false;
      for (int j = 0; j < nch; ++j) any = any || dd[(size_t)j];
      if (!any) return;
      scratch->assign((size_t)n * (size_t)nch, 0.0f);
      float* flat = scratch->data();
      std::vector<float*> one = {flat};
      std::vector<uint8_t> one_dd = {1};
      core(r, cb, one, one_dd, n * nch);
      for (int j = 0; j < nch; ++j)
        for (int i = 0; i < n; ++i)
          vecs[(size_t)j][i] = flat[(size_t)i * (size_t)nch + (size_t)j];
    } else {
      core(r, cb, vecs, dd, n);
    }
  }

  void core(Reader& r, const std::vector<Codebook>& cb,
            std::vector<float*>& vecs, const std::vector<uint8_t>& dd,
            int n) const {
    const int b0 = std::min(begin, n);
    const int e0 = std::min(end, n);
    if (e0 <= b0) return;
    const Codebook& cbook = cb[(size_t)classbook];
    const int cw = cbook.dim;
    if (cw <= 0) return;
    const int n_parts = (e0 - b0) / psize;
    if (n_parts <= 0) return;
    const int nch = (int)vecs.size();
    std::vector<std::vector<int>> cls((size_t)nch);
    for (auto& v : cls) v.assign((size_t)(n_parts + cw), 0);
    for (int pass = 0; pass < 8; ++pass) {
      int pcount = 0;
      while (pcount < n_parts) {
        if (pass == 0) {
          for (int j = 0; j < nch; ++j) {
            if (!dd[(size_t)j]) continue;
            int temp = cbook.decode_scalar(r);
            if (temp < 0) return;  // EOP: partial frame per spec
            for (int i = cw - 1; i >= 0; --i) {
              cls[(size_t)j][(size_t)(pcount + i)] = temp % classifications;
              temp /= classifications;
            }
          }
        }
        for (int i = 0; i < cw && pcount < n_parts; ++i, ++pcount) {
          const int offset = b0 + pcount * psize;
          for (int j = 0; j < nch; ++j) {
            if (!dd[(size_t)j]) continue;
            const int c = cls[(size_t)j][(size_t)pcount];
            const int bk = books[(size_t)c][(size_t)pass];
            if (bk < 0) continue;
            const Codebook& book = cb[(size_t)bk];
            float* v = vecs[(size_t)j];
            if (type == 0) {
              const int step = psize / book.dim;
              for (int k = 0; k < step; ++k) {
                const float* t = book.decode_vq(r);
                if (!t) return;
                for (int dd2 = 0; dd2 < book.dim; ++dd2)
                  v[offset + k + dd2 * step] += t[dd2];
              }
            } else {
              int k = 0;
              while (k < psize) {
                const float* t = book.decode_vq(r);
                if (!t) return;
                for (int dd2 = 0; dd2 < book.dim && k < psize; ++dd2, ++k)
                  v[offset + k] += t[dd2];
              }
            }
          }
        }
      }
    }
  }
};

// ----------------------------------------------------------- mapping/mode

struct Mapping {
  int submaps = 1;
  std::vector<std::pair<int, int>> coupling;
  std::vector<int> mux, floor_idx, residue_idx;

  bool parse(Reader& r, int ch, int n_floors, int n_residues) {
    if (r.read(16) != 0) return false;
    submaps = r.read1() ? (int)r.read(4) + 1 : 1;
    if (r.read1()) {
      const int steps = (int)r.read(8) + 1;
      const int bits = ilog((uint32_t)(ch - 1));
      for (int s = 0; s < steps; ++s) {
        const int m = (int)r.read(bits);
        const int a = (int)r.read(bits);
        if (m == a || m >= ch || a >= ch) return false;
        coupling.emplace_back(m, a);
      }
    }
    if (r.read(2) != 0) return false;
    mux.assign((size_t)ch, 0);
    if (submaps > 1) {
      for (int c = 0; c < ch; ++c) {
        mux[(size_t)c] = (int)r.read(4);
        if (mux[(size_t)c] >= submaps) return false;
      }
    }
    floor_idx.resize((size_t)submaps);
    residue_idx.resize((size_t)submaps);
    for (int s = 0; s < submaps; ++s) {
      r.read(8);  // unused time configuration
      floor_idx[(size_t)s] = (int)r.read(8);
      residue_idx[(size_t)s] = (int)r.read(8);
      if (floor_idx[(size_t)s] >= n_floors ||
          residue_idx[(size_t)s] >= n_residues)
        return false;
    }
    return !r.eop;
  }
};

// ----------------------------------------------------------- transform

// DCT-IV via M/2-point complex FFT; IMDCT by TDAC extension (mapping
// verified numerically against the O(n^2) definition, ~1e-10).
struct ImdctPlan {
  int N;  // blocksize
  std::vector<double> tw_re, tw_im;      // FFT twiddles, bit-stage packed
  std::vector<int> rev;                  // bit reversal for H = N/4
  std::vector<double> pre_re, pre_im;    // e^{-i pi n / M}, M = N/2
  std::vector<double> post_re, post_im;  // e^{-i pi (4m+1)/(4M)}

  explicit ImdctPlan(int n) : N(n) {
    const int M = N / 2, H = N / 4;
    rev.resize((size_t)H);
    int lg = 0;
    while ((1 << lg) < H) ++lg;
    for (int i = 0; i < H; ++i) {
      int v = 0;
      for (int b = 0; b < lg; ++b)
        if ((i >> b) & 1) v |= 1 << (lg - 1 - b);
      rev[(size_t)i] = v;
    }
    tw_re.resize((size_t)H);
    tw_im.resize((size_t)H);
    for (int len = 2, base = 0; len <= H; len <<= 1) {
      for (int j = 0; j < len / 2; ++j) {
        const double a = -2.0 * M_PI * j / len;
        tw_re[(size_t)(base + j)] = std::cos(a);
        tw_im[(size_t)(base + j)] = std::sin(a);
      }
      base += len / 2;
    }
    pre_re.resize((size_t)H);
    pre_im.resize((size_t)H);
    post_re.resize((size_t)H);
    post_im.resize((size_t)H);
    for (int i = 0; i < H; ++i) {
      const double a = -M_PI * i / M;
      pre_re[(size_t)i] = std::cos(a);
      pre_im[(size_t)i] = std::sin(a);
      const double b = -M_PI * (4.0 * i + 1.0) / (4.0 * M);
      post_re[(size_t)i] = std::cos(b);
      post_im[(size_t)i] = std::sin(b);
    }
  }

  // X: M = N/2 spectral coefficients (float), y: N time samples (double)
  void run(const float* X, double* y, double* wre, double* wim) const {
    const int M = N / 2, H = N / 4;
    // v[n] = (X[2n] + i X[M-1-2n]) * pre[n], bit-reversed into w
    for (int n = 0; n < H; ++n) {
      const double a = X[2 * n];
      const double b = X[M - 1 - 2 * n];
      const int j = rev[(size_t)n];
      wre[j] = a * pre_re[(size_t)n] - b * pre_im[(size_t)n];
      wim[j] = a * pre_im[(size_t)n] + b * pre_re[(size_t)n];
    }
    // iterative radix-2 FFT
    for (int len = 2, base = 0; len <= H; len <<= 1) {
      const int half = len / 2;
      for (int s = 0; s < H; s += len) {
        for (int j = 0; j < half; ++j) {
          const double tre = tw_re[(size_t)(base + j)];
          const double tim = tw_im[(size_t)(base + j)];
          const int a = s + j, b = s + j + half;
          const double xr = wre[b] * tre - wim[b] * tim;
          const double xi = wre[b] * tim + wim[b] * tre;
          wre[b] = wre[a] - xr;
          wim[b] = wim[a] - xi;
          wre[a] += xr;
          wim[a] += xi;
        }
      }
      base += half;
    }
    // post-twiddle -> c[2m] = Re T, c[M-1-2m] = -Im T; then TDAC extend:
    // y[j]=c[N4+j] (j<N4), y[j]=-c[3N4-1-j] (N4<=j<3N4), y[j]=-c[j-3N4].
    const int N4 = H;
    for (int m = 0; m < H; ++m) {
      const double tre =
          wre[m] * post_re[(size_t)m] - wim[m] * post_im[(size_t)m];
      const double tim =
          wre[m] * post_im[(size_t)m] + wim[m] * post_re[(size_t)m];
      const int i_even = 2 * m;          // c[i_even] = tre
      const int i_odd = M - 1 - 2 * m;   // c[i_odd]  = -tim
      // scatter both c values through the TDAC extension
      const int idx[2] = {i_even, i_odd};
      const double val[2] = {tre, -tim};
      for (int t = 0; t < 2; ++t) {
        const int ci = idx[t];
        const double cv = val[t];
        if (ci >= N4) {
          y[ci - N4] = cv;           // y[j] = c[N4+j], j in [0, N4)
          y[3 * N4 - 1 - ci] = -cv;  // y[j] = -c[3N4-1-j], j in [N4, 2N4)
        } else {
          y[3 * N4 - 1 - ci] = -cv;  // y[j] = -c[3N4-1-j], j in [2N4, 3N4)
          y[3 * N4 + ci] = -cv;      // y[j] = -c[j-3N4],   j in [3N4, N)
        }
      }
    }
  }
};

// ----------------------------------------------------------- decoder

struct Setup {
  int channels = 0;
  long rate = 0;
  int bs[2] = {0, 0};
  std::vector<Codebook> books;
  std::vector<Floor1> floors;
  std::vector<Residue> residues;
  std::vector<Mapping> mappings;
  std::vector<std::pair<int, int>> modes;  // (blockflag, mapping)
};

static bool parse_headers(const std::vector<Packet>& pkts, Setup* s) {
  if (pkts.size() < 3) return false;
  {  // identification
    const auto& p = pkts[0].data;
    if (p.size() < 30 || p[0] != 1 || memcmp(&p[1], "vorbis", 6) != 0)
      return false;
    Reader r(p);
    r.pos = 7 * 8;
    if (r.read(32) != 0) return false;  // vorbis version
    s->channels = (int)r.read(8);
    s->rate = (long)r.read(32);
    r.read(32);
    r.read(32);
    r.read(32);
    s->bs[0] = 1 << r.read(4);
    s->bs[1] = 1 << r.read(4);
    if (r.read1() != 1 || r.eop) return false;
    if (s->channels <= 0 || s->channels > 32 || s->rate <= 0 ||
        s->bs[0] > s->bs[1] || s->bs[0] < 64 || s->bs[1] > 8192)
      return false;
  }
  {  // comment header: check type only
    const auto& p = pkts[1].data;
    if (p.size() < 7 || p[0] != 3 || memcmp(&p[1], "vorbis", 6) != 0)
      return false;
  }
  const auto& p = pkts[2].data;
  if (p.size() < 7 || p[0] != 5 || memcmp(&p[1], "vorbis", 6) != 0)
    return false;
  Reader r(p);
  r.pos = 7 * 8;
  const int n_books = (int)r.read(8) + 1;
  s->books.resize((size_t)n_books);
  for (int i = 0; i < n_books; ++i)
    if (!s->books[(size_t)i].parse(r)) return false;
  const int n_times = (int)r.read(6) + 1;
  for (int i = 0; i < n_times; ++i)
    if (r.read(16) != 0) return false;
  const int n_floors = (int)r.read(6) + 1;
  s->floors.resize((size_t)n_floors);
  for (int i = 0; i < n_floors; ++i) {
    const int ftype = (int)r.read(16);
    if (ftype != 1) return false;  // floor 0: out of scope (see header)
    if (!s->floors[(size_t)i].parse(r, n_books)) return false;
  }
  const int n_res = (int)r.read(6) + 1;
  s->residues.resize((size_t)n_res);
  for (int i = 0; i < n_res; ++i) {
    const int rtype = (int)r.read(16);
    if (rtype > 2) return false;
    if (!s->residues[(size_t)i].parse(r, rtype, n_books, s->books))
      return false;
  }
  const int n_maps = (int)r.read(6) + 1;
  s->mappings.resize((size_t)n_maps);
  for (int i = 0; i < n_maps; ++i)
    if (!s->mappings[(size_t)i].parse(r, s->channels, n_floors, n_res))
      return false;
  const int n_modes = (int)r.read(6) + 1;
  for (int i = 0; i < n_modes; ++i) {
    const int blockflag = (int)r.read1();
    if (r.read(16) != 0 || r.read(16) != 0) return false;
    const int mapping = (int)r.read(8);
    if (mapping >= n_maps) return false;
    s->modes.emplace_back(blockflag, mapping);
  }
  if (r.read1() != 1 || r.eop) return false;
  return true;
}

// vorbis window slope of length n: sin(pi/2 * sin^2((i+0.5)/n * pi/2))
static void slope(int n, double* out) {
  for (int i = 0; i < n; ++i) {
    const double t = std::sin((i + 0.5) / n * 0.5 * M_PI);
    out[i] = std::sin(0.5 * M_PI * t * t);
  }
}

// Decode all audio packets to planar float channels.  Error codes mirror
// the MP3 decoder's convention (negative int per failure class).
static int decode_file(const char* path,
                       std::vector<std::vector<float>>* chans,
                       int* rate_out, int* nch_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  const long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0 || sz > (1l << 31)) {
    fclose(f);
    return -2;
  }
  std::vector<uint8_t> data((size_t)sz);
  if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -2;
  }
  fclose(f);

  std::vector<Packet> pkts;
  if (!ogg_packets(data, &pkts) || pkts.size() < 3) return -3;
  Setup s;
  if (!parse_headers(pkts, &s)) return -4;
  const int ch = s.channels;
  const int bs0 = s.bs[0], bs1 = s.bs[1];
  const int mode_bits = ilog((uint32_t)(s.modes.size() - 1));

  std::map<int, std::unique_ptr<ImdctPlan>> plans;
  std::map<int, std::vector<double>> slopes;  // slope length -> values
  auto get_slope = [&](int n) -> const double* {
    auto it = slopes.find(n);
    if (it == slopes.end()) {
      std::vector<double> v((size_t)n);
      slope(n, v.data());
      it = slopes.emplace(n, std::move(v)).first;
    }
    return it->second.data();
  };
  auto get_plan = [&](int n) -> const ImdctPlan* {
    auto it = plans.find(n);
    if (it == plans.end())
      it = plans.emplace(n, std::make_unique<ImdctPlan>(n)).first;
    return it->second.get();
  };

  // Overlap-add state: previous block's windowed output + geometry.
  std::vector<std::vector<double>> prev;  // per-channel, prev_n samples
  int prev_n = 0, prev_rws = 0, prev_lws = 0;
  (void)prev_lws;
  int64_t emitted = 0;        // PCM samples appended to chans
  int64_t pcm_skip = -1;      // abs position of PCM sample 0 (center blk0)
  int64_t abs_pos = 0;        // absolute position of current block start
  int64_t last_granule = -1;
  chans->assign((size_t)ch, {});

  std::vector<float> spec((size_t)ch * (size_t)(bs1 / 2));
  std::vector<float> fcurve((size_t)(bs1 / 2));
  std::vector<double> tdom((size_t)(bs1));
  std::vector<double> wre((size_t)(bs1 / 4)), wim((size_t)(bs1 / 4));
  std::vector<float> scratch;
  std::vector<std::vector<int>> Ys((size_t)ch);
  std::vector<uint8_t> voiced((size_t)ch);
  std::vector<std::vector<double>> cur((size_t)ch);

  for (size_t pi = 3; pi < pkts.size(); ++pi) {
    const auto& pk = pkts[pi];
    if (pk.data.empty()) continue;
    Reader r(pk.data);
    if (r.read1() != 0) continue;  // not an audio packet
    const int mode_idx = (int)r.read(mode_bits);
    if (mode_idx >= (int)s.modes.size() || r.eop) continue;
    const int blockflag = s.modes[(size_t)mode_idx].first;
    const Mapping& mp = s.mappings[(size_t)s.modes[(size_t)mode_idx].second];
    const int n = blockflag ? bs1 : bs0;
    int prev_flag = 1, next_flag = 1;
    if (blockflag) {
      prev_flag = (int)r.read1();
      next_flag = (int)r.read1();
    }
    if (r.eop) continue;
    const int n2 = n / 2;

    // ---- floor decode (EOP => this and remaining channels unvoiced)
    for (int c = 0; c < ch; ++c) {
      const Floor1& fl =
          s.floors[(size_t)mp.floor_idx[(size_t)mp.mux[(size_t)c]]];
      voiced[(size_t)c] = fl.decode(r, s.books, &Ys[(size_t)c]) ? 1 : 0;
    }
    // nonzero propagate across coupling
    std::vector<uint8_t> do_dec = voiced;
    for (const auto& [m, a] : mp.coupling) {
      if (do_dec[(size_t)m] || do_dec[(size_t)a])
        do_dec[(size_t)m] = do_dec[(size_t)a] = 1;
    }
    // ---- residue decode per submap
    std::fill(spec.begin(), spec.begin() + (size_t)ch * (size_t)n2, 0.0f);
    for (int sm = 0; sm < mp.submaps; ++sm) {
      std::vector<float*> vecs;
      std::vector<uint8_t> dd;
      for (int c = 0; c < ch; ++c) {
        if (mp.mux[(size_t)c] == sm) {
          vecs.push_back(&spec[(size_t)c * (size_t)n2]);
          dd.push_back(do_dec[(size_t)c]);
        }
      }
      s.residues[(size_t)mp.residue_idx[(size_t)sm]].decode(
          r, s.books, vecs, dd, n2, &scratch);
    }
    // ---- inverse coupling (reverse order, spec 4.3.6)
    for (auto it = mp.coupling.rbegin(); it != mp.coupling.rend(); ++it) {
      float* M = &spec[(size_t)it->first * (size_t)n2];
      float* A = &spec[(size_t)it->second * (size_t)n2];
      for (int i = 0; i < n2; ++i) {
        const float m = M[i], a = A[i];
        float nm, na;
        if (m > 0) {
          if (a > 0) {
            nm = m;
            na = m - a;
          } else {
            na = m;
            nm = m + a;
          }
        } else {
          if (a > 0) {
            nm = m;
            na = m + a;
          } else {
            na = m;
            nm = m - a;
          }
        }
        M[i] = nm;
        A[i] = na;
      }
    }
    // ---- window geometry
    int lws, lwe, ln, rws, rwe, rn;
    if (blockflag) {
      if (!prev_flag) {
        lws = n / 4 - bs0 / 4;
        lwe = n / 4 + bs0 / 4;
        ln = bs0 / 2;
      } else {
        lws = 0;
        lwe = n2;
        ln = n2;
      }
      if (!next_flag) {
        rws = 3 * n / 4 - bs0 / 4;
        rwe = 3 * n / 4 + bs0 / 4;
        rn = bs0 / 2;
      } else {
        rws = n2;
        rwe = n;
        rn = n2;
      }
    } else {
      lws = 0;
      lwe = n2;
      ln = n2;
      rws = n2;
      rwe = n;
      rn = n2;
    }
    const double* lsl = get_slope(ln);
    const double* rsl = get_slope(rn);
    const ImdctPlan* plan = get_plan(n);

    // ---- per channel: floor curve * residue -> IMDCT -> window
    for (int c = 0; c < ch; ++c) {
      auto& cb = cur[(size_t)c];
      cb.assign((size_t)n, 0.0);
      if (!voiced[(size_t)c]) continue;
      const Floor1& fl =
          s.floors[(size_t)mp.floor_idx[(size_t)mp.mux[(size_t)c]]];
      fl.curve(Ys[(size_t)c], n2, fcurve.data());
      float* sp = &spec[(size_t)c * (size_t)n2];
      for (int i = 0; i < n2; ++i) sp[i] *= fcurve[(size_t)i];
      plan->run(sp, tdom.data(), wre.data(), wim.data());
      for (int i = 0; i < lws; ++i) cb[(size_t)i] = 0.0;
      for (int i = lws; i < lwe; ++i)
        cb[(size_t)i] = tdom[(size_t)i] * lsl[i - lws];
      for (int i = lwe; i < rws; ++i) cb[(size_t)i] = tdom[(size_t)i];
      for (int i = rws; i < rwe; ++i)
        cb[(size_t)i] = tdom[(size_t)i] * rsl[rwe - 1 - i];
      for (int i = rwe; i < n; ++i) cb[(size_t)i] = 0.0;
    }

    // ---- lapped OLA: prev right slope aligns with current left slope
    if (prev_n == 0) {
      abs_pos = 0;
      pcm_skip = n2;  // PCM sample 0 = center of the first block
    } else {
      const int64_t new_abs = abs_pos + prev_rws - lws;
      // overlap region in current-block coordinates: [lws, lws + ov)
      // where ov = prev_rwe - prev_rws == lwe - lws (lapping invariant);
      // add previous block's tail samples that fall inside it.
      for (int c = 0; c < ch; ++c) {
        auto& cb = cur[(size_t)c];
        const auto& pb = prev[(size_t)c];
        const int64_t shift = abs_pos - new_abs;  // prev start rel to cur
        const int lo = (int)std::max<int64_t>(0, shift);
        const int hi =
            (int)std::min<int64_t>((int64_t)n, shift + (int64_t)prev_n);
        for (int i = lo; i < hi; ++i) cb[(size_t)i] += pb[(size_t)(i - shift)];
      }
      // emit fully-summed samples: [prev emitted abs, new_abs + lws ...)
      // everything before current rws is final once this block merged --
      // but later blocks start at new_abs + rws, so final = new_abs + rws
      // AFTER merging; emit now the region covered below.
      abs_pos = new_abs;
    }
    // After merging prev into cur, samples [abs_pos, abs_pos + rws) are
    // final (the next block begins at abs_pos + rws).
    const int64_t final_hi = abs_pos + rws;
    int64_t emit_from_abs = pcm_skip + emitted;
    const int start_i = (int)std::max<int64_t>(emit_from_abs - abs_pos, 0);
    for (int i = start_i; i < (int)(final_hi - abs_pos); ++i) {
      for (int c = 0; c < ch; ++c)
        (*chans)[(size_t)c].push_back((float)cur[(size_t)c][(size_t)i]);
      ++emitted;
    }
    // save current block tail [rws, n) for the next overlap
    prev.assign((size_t)ch, {});
    for (int c = 0; c < ch; ++c) {
      prev[(size_t)c].assign(cur[(size_t)c].begin() + rws,
                             cur[(size_t)c].end());
    }
    prev_n = n - rws;
    prev_rws = rws;
    prev_lws = lws;
    // abs bookkeeping: prev buffer starts at abs_pos + rws; fold into the
    // convention used above by treating the saved tail as "the previous
    // block" starting at abs_pos + rws with rws' = 0.
    abs_pos += rws;
    prev_rws = 0;

    if (pk.granule >= 0) last_granule = pk.granule;
  }

  if ((*chans)[0].empty()) return -5;
  if (last_granule >= 0 && (int64_t)(*chans)[0].size() > last_granule) {
    for (auto& c : *chans) c.resize((size_t)last_granule);
  }
  if ((*chans)[0].empty()) return -5;
  *rate_out = (int)s.rate;
  *nch_out = ch;
  return 0;
}

}  // namespace vorbis

// Exception barrier: decode_file allocates from header-derived sizes
// (bounded above, but std::bad_alloc stays possible under memory
// pressure) and C++ exceptions must never cross the C ABI into ctypes.
static int32_t decode_file_noexcept(const char* path,
                                    std::vector<std::vector<float>>* chans,
                                    int* rate, int* nch) {
  try {
    return vorbis::decode_file(path, chans, rate, nch);
  } catch (...) {
    return -9;
  }
}

// info must decode everything to learn the length; park the result so
// the immediately-following read doesn't decode the file a second time.
static melonix::PcmCache g_vorbis_cache;

extern "C" int32_t mlx_vorbis_info(const char* path, int64_t* n_frames,
                                   int32_t* channels, int32_t* rate,
                                   int32_t* bits) {
  std::vector<std::vector<float>> chans;
  int r = 0, nch = 0;
  const int rc = decode_file_noexcept(path, &chans, &r, &nch);
  if (rc != 0) return rc;
  *n_frames = (int64_t)chans[0].size();
  *channels = nch;
  *rate = r;
  *bits = 16;  // nominal (lossy float source)
  g_vorbis_cache.put(path, {std::move(chans), r});
  return 0;
}

extern "C" int32_t mlx_vorbis_read(const char* path, float* out,
                                   int64_t n_frames, int32_t mono) {
  std::vector<std::vector<float>> chans;
  int r = 0, nch = 0;
  melonix::CachedPcm cached;
  if (g_vorbis_cache.take(path, &cached)) {
    chans = std::move(cached.chans);
    r = cached.rate;
    nch = (int)chans.size();
  } else {
    const int rc = decode_file_noexcept(path, &chans, &r, &nch);
    if (rc != 0) return rc;
  }
  const int64_t have = (int64_t)chans[0].size();
  const float inv = mono ? 1.0f / (float)nch : 1.0f;
  for (int64_t i = 0; i < n_frames; ++i) {
    if (i < have) {
      if (mono) {
        float acc = 0.0f;
        for (int c = 0; c < nch; ++c) acc += chans[(size_t)c][(size_t)i];
        out[i] = acc * inv;
      } else {
        for (int c = 0; c < nch; ++c)
          out[i * nch + c] = chans[(size_t)c][(size_t)i];
      }
    } else {
      if (mono)
        out[i] = 0.0f;
      else
        for (int c = 0; c < nch; ++c) out[i * nch + c] = 0.0f;
    }
  }
  return 0;
}
