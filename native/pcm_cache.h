// One-shot decoded-PCM handoff between the two-call info/read ABI.
//
// The compressed decoders (MP3, Vorbis) have no frame count in their
// headers, so mlx_*_info must decode the whole file to size the caller's
// buffer — and mlx_*_read, called immediately after, would decode it all
// again.  This cache lets info park its result and read claim it: one
// decode per import instead of two.  `take` POPS the entry (the cache
// never outlives one info->read round trip, so peak memory stays at one
// decoded track), and a stat (size+mtime) revalidation means a file
// rewritten between the calls is simply re-decoded, never served stale.
// Mutex-guarded: concurrent imports (web-shell requests) stay correct —
// worst case a miss re-decodes.

#ifndef MELONIX_NATIVE_PCM_CACHE_H_
#define MELONIX_NATIVE_PCM_CACHE_H_

#include <sys/stat.h>

#include <cstdint>
#include <mutex>
#include <string>
#include <utility>
#include <vector>

namespace melonix {

struct CachedPcm {
  std::vector<std::vector<float>> chans;
  int rate = 0;
};

class PcmCache {
 public:
  void put(const char* path, CachedPcm&& pcm) {
    int64_t size, mtime;
    if (!stat_file(path, &size, &mtime)) return;  // unstatable: no cache
    std::lock_guard<std::mutex> lock(mu_);
    path_ = path;
    size_ = size;
    mtime_ = mtime;
    pcm_ = std::move(pcm);
    valid_ = true;
  }

  // On hit, moves the entry into *out and invalidates it.
  bool take(const char* path, CachedPcm* out) {
    int64_t size, mtime;
    if (!stat_file(path, &size, &mtime)) return false;
    std::lock_guard<std::mutex> lock(mu_);
    if (!valid_ || path_ != path || size_ != size || mtime_ != mtime)
      return false;
    *out = std::move(pcm_);
    valid_ = false;
    return true;
  }

 private:
  static bool stat_file(const char* path, int64_t* size, int64_t* mtime) {
    struct stat st;
    if (stat(path, &st) != 0) return false;
    *size = (int64_t)st.st_size;
    // Nanosecond mtime where available: catches same-second rewrites.
    *mtime = (int64_t)st.st_mtim.tv_sec * 1000000000 + st.st_mtim.tv_nsec;
    return true;
  }

  std::mutex mu_;
  std::string path_;
  int64_t size_ = -1, mtime_ = -1;
  CachedPcm pcm_;
  bool valid_ = false;
};

}  // namespace melonix

#endif  // MELONIX_NATIVE_PCM_CACHE_H_
