// Native host-runtime components for lsd_slam_tpu.
//
// The reference's runtime around the math is C++ (boost queues, Dijkstra
// over the keyframe graph, point-cloud export); these are their equivalents
// for the TPU build's host side, exposed as a C ABI consumed via ctypes
// (lsd_slam_tpu/utils/native.py). The device compute path stays JAX/XLA.
//
//  * lsd_bfs_hops        — hop-count graph distances
//                          (== KeyFrameGraph::calculateGraphDistancesToFrame,
//                          KeyFrameGraph.cpp:340-374; unit edge weights)
//  * lsd_queue_*         — bounded drop-on-full frame queue with blocking pop
//                          (== NotifyBuffer<TimestampedMat>, NotifyBuffer.h)
//  * lsd_write_ply       — buffered binary-PLY point-cloud writer
//                          (== the viewer's PLY export,
//                          KeyFrameGraphDisplay.cpp:60-94)
//  * lsd_remap_bilinear  — CPU undistortion remap for the input pipeline
//                          (== UndistorterPTAM::undistort,
//                          Undistorter.cpp:355-411)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- graph

// Hop-count shortest paths from `start` over an undirected edge list.
// dist_out must hold n_nodes ints; unreachable nodes get -1.
void lsd_bfs_hops(int n_nodes, int n_edges, const int* efrom, const int* eto,
                  int start, int* dist_out) {
  std::vector<std::vector<int>> adj(n_nodes);
  for (int i = 0; i < n_edges; i++) {
    int a = efrom[i], b = eto[i];
    if (a < 0 || b < 0 || a >= n_nodes || b >= n_nodes) continue;
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  for (int i = 0; i < n_nodes; i++) dist_out[i] = -1;
  if (start < 0 || start >= n_nodes) return;
  std::deque<int> q;
  dist_out[start] = 0;
  q.push_back(start);
  while (!q.empty()) {
    int v = q.front();
    q.pop_front();
    for (int n : adj[v]) {
      if (dist_out[n] < 0) {
        dist_out[n] = dist_out[v] + 1;
        q.push_back(n);
      }
    }
  }
}

// ---------------------------------------------------------------- queue

struct LsdQueue {
  std::mutex m;
  std::condition_variable cv;
  std::deque<uint64_t> items;
  size_t capacity;
  std::atomic<uint64_t> dropped{0};
};

void* lsd_queue_create(int capacity) {
  auto* q = new LsdQueue();
  q->capacity = capacity > 0 ? (size_t)capacity : 8;
  return q;
}

void lsd_queue_destroy(void* h) { delete static_cast<LsdQueue*>(h); }

// Returns 1 if pushed, 0 if dropped (full) — NotifyBuffer.h:94-110 drops
// the incoming item when the buffer is full.
int lsd_queue_push(void* h, uint64_t item) {
  auto* q = static_cast<LsdQueue*>(h);
  {
    std::lock_guard<std::mutex> lk(q->m);
    if (q->items.size() >= q->capacity) {
      q->dropped++;
      return 0;
    }
    q->items.push_back(item);
  }
  q->cv.notify_one();
  return 1;
}

// Blocking pop with timeout (ms). Returns 1 and writes *out on success,
// 0 on timeout.
int lsd_queue_pop(void* h, int timeout_ms, uint64_t* out) {
  auto* q = static_cast<LsdQueue*>(h);
  std::unique_lock<std::mutex> lk(q->m);
  if (!q->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                      [&] { return !q->items.empty(); }))
    return 0;
  *out = q->items.front();
  q->items.pop_front();
  return 1;
}

int lsd_queue_size(void* h) {
  auto* q = static_cast<LsdQueue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  return (int)q->items.size();
}

uint64_t lsd_queue_dropped(void* h) {
  return static_cast<LsdQueue*>(h)->dropped.load();
}

// ---------------------------------------------------------------- ply

// Binary little-endian PLY: positions f32 (n,3), colors u8 (n,3).
// Returns 0 on success.
int lsd_write_ply(const char* path, int64_t n, const float* xyz,
                  const uint8_t* rgb) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "end_header\n",
          (long long)n);
  // interleave in chunks to keep writes large and sequential
  constexpr int64_t kChunk = 1 << 16;
  std::vector<uint8_t> buf(kChunk * 15);
  for (int64_t i = 0; i < n; i += kChunk) {
    int64_t m = std::min(kChunk, n - i);
    uint8_t* p = buf.data();
    for (int64_t j = 0; j < m; j++) {
      memcpy(p, xyz + 3 * (i + j), 12);
      p += 12;
      memcpy(p, rgb + 3 * (i + j), 3);
      p += 3;
    }
    if (fwrite(buf.data(), 1, (size_t)(m * 15), f) != (size_t)(m * 15)) {
      fclose(f);
      return -2;
    }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------- remap

// Bilinear remap: out[y,x] = in(rx[y,x], ry[y,x]); negative coords -> 0.
void lsd_remap_bilinear(const float* in, int in_h, int in_w, const float* rx,
                        const float* ry, float* out, int out_h, int out_w) {
  for (int y = 0; y < out_h; y++) {
    const float* rxr = rx + (int64_t)y * out_w;
    const float* ryr = ry + (int64_t)y * out_w;
    float* orow = out + (int64_t)y * out_w;
    for (int x = 0; x < out_w; x++) {
      float fx = rxr[x], fy = ryr[x];
      if (fx < 0.f || fy < 0.f) {
        orow[x] = 0.f;
        continue;
      }
      int x0 = (int)fx, y0 = (int)fy;
      if (x0 >= in_w - 1) x0 = in_w - 2;
      if (y0 >= in_h - 1) y0 = in_h - 2;
      float wx = fx - x0, wy = fy - y0;
      const float* r0 = in + (int64_t)y0 * in_w + x0;
      const float* r1 = r0 + in_w;
      orow[x] = r0[0] * (1 - wx) * (1 - wy) + r0[1] * wx * (1 - wy) +
                r1[0] * (1 - wx) * wy + r1[1] * wx * wy;
    }
  }
}

}  // extern "C"
