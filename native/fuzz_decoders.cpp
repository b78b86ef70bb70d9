// Deterministic mutation fuzz of the native audio decoders (WAV, FLAC,
// MP3, Ogg Vorbis) under ASan+UBSan (`make -C native fuzz-check`).
//
// Every decoder parses untrusted bytes through the two-call info/read
// ABI; the fail-soft contract (SURVEY.md §5: failure detection) is that
// ANY input either decodes or returns a negative code — never crashes,
// reads out of bounds, or trips UB.  Mutations: byte flips, truncation,
// region zeroing, random splices, and length-field-heavy nibble edits,
// seeded so a failure reproduces from the printed (seed, iter).
//
// usage: fuzz_decoders <iters> <seed> <corpus file> [...]

#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
int32_t mlx_wav_info(const char*, int64_t*, int32_t*, int32_t*);
int32_t mlx_wav_read(const char*, float*, int64_t, int32_t);
int32_t mlx_flac_info(const char*, int64_t*, int32_t*, int32_t*, int32_t*);
int32_t mlx_flac_read(const char*, float*, int64_t, int32_t);
int32_t mlx_mp3_info(const char*, int64_t*, int32_t*, int32_t*, int32_t*);
int32_t mlx_mp3_read(const char*, float*, int64_t, int32_t);
int32_t mlx_vorbis_info(const char*, int64_t*, int32_t*, int32_t*, int32_t*);
int32_t mlx_vorbis_read(const char*, float*, int64_t, int32_t);
}

namespace {

// mlx_wav_info has no bits out-param (WAV reports none); adapt it to the
// uniform 5-pointer shape the harness drives.
int32_t wav_info_shim(const char* p, int64_t* n, int32_t* ch, int32_t* rate,
                      int32_t* bits) {
  *bits = 0;
  return mlx_wav_info(p, n, ch, rate);
}

struct Codec {
  const char* ext;
  int32_t (*info)(const char*, int64_t*, int32_t*, int32_t*, int32_t*);
  int32_t (*read)(const char*, float*, int64_t, int32_t);
};

const Codec kCodecs[] = {
    {".wav", wav_info_shim, mlx_wav_read},
    {".flac", mlx_flac_info, mlx_flac_read},
    {".mp3", mlx_mp3_info, mlx_mp3_read},
    {".ogg", mlx_vorbis_info, mlx_vorbis_read},
};

const Codec* codec_for(const std::string& path) {
  for (const auto& c : kCodecs) {
    const size_t n = strlen(c.ext);
    if (path.size() >= n && path.compare(path.size() - n, n, c.ext) == 0)
      return &c;
  }
  return nullptr;
}

std::vector<uint8_t> mutate(const std::vector<uint8_t>& src,
                            std::mt19937_64* rng) {
  std::vector<uint8_t> d = src;
  if (d.empty()) return d;
  auto u = [&](uint64_t n) { return (*rng)() % n; };
  const int kind = (int)u(6);
  switch (kind) {
    case 0: {  // sparse byte flips
      const int n = 1 + (int)u(24);
      for (int i = 0; i < n; ++i) d[u(d.size())] ^= (uint8_t)(1 + u(255));
      break;
    }
    case 1:  // truncate anywhere
      d.resize(1 + u(d.size()));
      break;
    case 2: {  // zero a region (mimics sector loss)
      const size_t a = u(d.size());
      const size_t len = 1 + u(512);
      for (size_t i = a; i < d.size() && i < a + len; ++i) d[i] = 0;
      break;
    }
    case 3: {  // splice: copy one region over another (confuses lengths)
      const size_t a = u(d.size()), b = u(d.size());
      const size_t len = 1 + u(256);
      for (size_t i = 0; i < len && a + i < d.size() && b + i < d.size(); ++i)
        d[a + i] = src[b + i];
      break;
    }
    case 4: {  // burst corruption
      const size_t a = u(d.size());
      const size_t len = 1 + u(64);
      for (size_t i = a; i < d.size() && i < a + len; ++i)
        d[i] = (uint8_t)(*rng)();
      break;
    }
    default: {  // header-focused nibble edits (length/count fields live
                // early in every container)
      const size_t window = d.size() < 512 ? d.size() : 512;
      const int n = 1 + (int)u(12);
      for (int i = 0; i < n; ++i) d[u(window)] ^= (uint8_t)(0xF << (4 * u(2)));
      break;
    }
  }
  return d;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s <iters> <seed> <corpus file> [...]\n", argv[0]);
    return 2;
  }
  const long iters = atol(argv[1]);
  const uint64_t seed = (uint64_t)atoll(argv[2]);

  struct Item {
    std::vector<uint8_t> bytes;
    const Codec* codec;
    std::string tmp;
  };
  std::vector<Item> corpus;
  for (int a = 3; a < argc; ++a) {
    const Codec* c = codec_for(argv[a]);
    if (!c) {
      fprintf(stderr, "no codec for %s\n", argv[a]);
      return 2;
    }
    FILE* f = fopen(argv[a], "rb");
    if (!f) {
      fprintf(stderr, "cannot open %s\n", argv[a]);
      return 2;
    }
    fseek(f, 0, SEEK_END);
    const long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> b((size_t)sz);
    if (fread(b.data(), 1, b.size(), f) != b.size()) {
      fclose(f);
      return 2;
    }
    fclose(f);
    char tmp[256];
    snprintf(tmp, sizeof(tmp), "/tmp/mlx_fuzz_%d_%d%s", (int)getpid(), a,
             c->ext);
    corpus.push_back({std::move(b), c, tmp});
  }

  constexpr int64_t kMaxFrames = 1 << 24;  // bound harness memory
  std::vector<float> out;
  long decoded_ok = 0;
  for (long it = 0; it < iters; ++it) {
    std::mt19937_64 rng(seed * 1000003 + (uint64_t)it);
    const Item& item = corpus[(size_t)(rng() % corpus.size())];
    const std::vector<uint8_t> m = mutate(item.bytes, &rng);
    FILE* f = fopen(item.tmp.c_str(), "wb");
    if (!f) return 2;
    fwrite(m.data(), 1, m.size(), f);
    fclose(f);

    int64_t frames = 0;
    int32_t ch = 0, rate = 0, bits = 0;
    const int32_t rc =
        item.codec->info(item.tmp.c_str(), &frames, &ch, &rate, &bits);
    if (rc == 0) {
      if (frames < 0 || ch <= 0 || ch > 1024 || rate <= 0) {
        fprintf(stderr, "BOGUS info accepted: iter=%ld %s frames=%lld ch=%d rate=%d\n",
                it, item.tmp.c_str(), (long long)frames, ch, rate);
        return 1;
      }
      const int64_t take = frames < kMaxFrames ? frames : kMaxFrames;
      out.assign((size_t)(take * ch), 0.0f);
      const int mono = (int)(rng() % 2);
      item.codec->read(item.tmp.c_str(), out.data(), take, mono);
      ++decoded_ok;
    }
    if ((it + 1) % 1000 == 0)
      fprintf(stderr, "  %ld/%ld (%ld decoded)\n", it + 1, iters, decoded_ok);
  }
  for (const auto& item : corpus) remove(item.tmp.c_str());
  printf("fuzz ok: %ld iters, %ld mutated inputs still decoded\n", iters,
         decoded_ok);
  return 0;
}
