// Two-thread TSan stress for the lock-free playback ring
// (melonix_native.cpp: mlx_ring_*).  Models the product's threading:
// one producer (the render/control side, which also issues epoch
// flushes on live edits) and one consumer (the audio pull thread).
// Run under -fsanitize=thread: any data race in the SPSC protocol or
// the consumer-applied flush epoch fails the run.
//
// Reference semantics being guarded: the SDL_LockAudioDevice bracketing
// of marker edits vs the audio callback (app.cpp:935-941, 254-292) —
// here replaced by the epoch-flush contract (ADVICE r1 medium finding).
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {
void* mlx_ring_new(int64_t capacity);
void mlx_ring_free(void* h);
int64_t mlx_ring_avail(void* h);
int64_t mlx_ring_write(void* h, const float* data, int64_t count);
int64_t mlx_ring_read(void* h, float* out, int64_t count);
void mlx_ring_clear(void* h);
}

int main() {
  void* ring = mlx_ring_new(1 << 14);
  std::atomic<bool> stop{false};
  std::atomic<int64_t> consumed{0};

  std::thread producer([&] {
    std::vector<float> buf(1024);
    int64_t seq = 0;
    for (int iter = 0; iter < 20000; ++iter) {
      for (auto& v : buf) v = float(seq++);
      int64_t done = 0;
      while (done < (int64_t)buf.size() && !stop.load()) {
        done += mlx_ring_write(ring, buf.data() + done, buf.size() - done);
      }
      if (iter % 577 == 0) mlx_ring_clear(ring);  // live-edit backlog flush
    }
    stop.store(true);
  });

  std::thread consumer([&] {
    std::vector<float> out(512);
    while (!stop.load() || mlx_ring_avail(ring) > 0) {
      int64_t got = mlx_ring_read(ring, out.data(), out.size());
      consumed.fetch_add(got);
      if (got == 0) std::this_thread::yield();
    }
  });

  producer.join();
  consumer.join();
  std::printf("tsan ring stress ok: consumed %lld samples\n",
              (long long)consumed.load());
  mlx_ring_free(ring);
  return 0;
}
