// Native host-side geometry processing for gatling_tpu.
//
// Plays the role of the reference's native CPU mesh pipeline
// (reference: src/gi/impl/MeshProcessing.cpp — meshoptimizer vertex
// remap/dedup — and the device BLAS builds in CgpuVk.cpp:2695): Morton
// ordering, threaded-BVH construction and vertex deduplication for scenes
// where the NumPy builder becomes the bottleneck (millions of triangles).
//
// Exposed as a plain C ABI consumed through ctypes
// (gatling_tpu/native.py); the output contract matches
// gatling_tpu/ops/bvh.py::build_bvh exactly so the two builders are
// interchangeable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgatling_native.so gatling_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>

#include <zlib.h>
#include <vector>

namespace {

inline uint64_t spread_bits(uint64_t v) {
  v = (v | (v << 16)) & 0x030000FFull;
  v = (v | (v << 8)) & 0x0300F00Full;
  v = (v | (v << 4)) & 0x030C30C3ull;
  v = (v | (v << 2)) & 0x09249249ull;
  return v;
}

inline uint64_t morton3(float x, float y, float z) {
  auto q = [](float f) -> uint64_t {
    float c = f * 1024.0f;
    if (c < 0.0f) c = 0.0f;
    if (c > 1023.0f) c = 1023.0f;
    return (uint64_t)c;
  };
  return (spread_bits(q(x)) << 2) | (spread_bits(q(y)) << 1) | spread_bits(q(z));
}

struct BuildFrame {
  int64_t start;
  int64_t count;
  int64_t patch_slot;  // parent's right_child entry to fill, -1 = none
};

}  // namespace

extern "C" {

// Morton-order triangle centroids. order[T] receives the sort permutation.
void gatling_morton_order(const float* tri_min, const float* tri_max,
                          int64_t t, int32_t* order) {
  std::vector<std::pair<uint64_t, int32_t>> keys(t);
  float lo[3] = {1e38f, 1e38f, 1e38f};
  float hi[3] = {-1e38f, -1e38f, -1e38f};
  std::vector<float> cx(t), cy(t), cz(t);
  for (int64_t i = 0; i < t; ++i) {
    cx[i] = 0.5f * (tri_min[i * 3 + 0] + tri_max[i * 3 + 0]);
    cy[i] = 0.5f * (tri_min[i * 3 + 1] + tri_max[i * 3 + 1]);
    cz[i] = 0.5f * (tri_min[i * 3 + 2] + tri_max[i * 3 + 2]);
    lo[0] = std::min(lo[0], cx[i]); hi[0] = std::max(hi[0], cx[i]);
    lo[1] = std::min(lo[1], cy[i]); hi[1] = std::max(hi[1], cy[i]);
    lo[2] = std::min(lo[2], cz[i]); hi[2] = std::max(hi[2], cz[i]);
  }
  float ext[3];
  for (int k = 0; k < 3; ++k) ext[k] = std::max(hi[k] - lo[k], 1e-12f);
  for (int64_t i = 0; i < t; ++i) {
    keys[i] = {morton3((cx[i] - lo[0]) / ext[0], (cy[i] - lo[1]) / ext[1],
                       (cz[i] - lo[2]) / ext[2]),
               (int32_t)i};
  }
  std::stable_sort(keys.begin(), keys.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  for (int64_t i = 0; i < t; ++i) order[i] = keys[i].second;
}

// Threaded-BVH build over Morton-sorted triangle bounds. Outputs are sized
// for at most 2*ceil(T/1)... the caller allocates max_nodes = 2*T entries.
// Returns the node count, or -1 if max_nodes was insufficient.
int64_t gatling_build_bvh(const float* tri_min_in, const float* tri_max_in,
                          int64_t t, int32_t leaf_size,
                          float* bbox_min, float* bbox_max, int32_t* skip,
                          int32_t* leaf_start, int32_t* leaf_count,
                          int32_t* order, int64_t max_nodes) {
  if (t <= 0) return 0;
  gatling_morton_order(tri_min_in, tri_max_in, t, order);

  std::vector<float> tmin(t * 3), tmax(t * 3);
  for (int64_t i = 0; i < t; ++i) {
    const int64_t s = order[i];
    std::memcpy(&tmin[i * 3], &tri_min_in[s * 3], 3 * sizeof(float));
    std::memcpy(&tmax[i * 3], &tri_max_in[s * 3], 3 * sizeof(float));
  }

  std::vector<int32_t> right_child;
  right_child.reserve(2 * t);
  int64_t n = 0;

  std::vector<BuildFrame> stack;
  stack.push_back({0, t, -1});
  while (!stack.empty()) {
    BuildFrame f = stack.back();
    stack.pop_back();
    const int64_t idx = n;
    if (idx >= max_nodes) return -1;
    if (f.patch_slot >= 0) right_child[f.patch_slot] = (int32_t)idx;
    float bmin[3] = {1e38f, 1e38f, 1e38f};
    float bmax[3] = {-1e38f, -1e38f, -1e38f};
    for (int64_t i = f.start; i < f.start + f.count; ++i) {
      for (int k = 0; k < 3; ++k) {
        bmin[k] = std::min(bmin[k], tmin[i * 3 + k]);
        bmax[k] = std::max(bmax[k], tmax[i * 3 + k]);
      }
    }
    std::memcpy(&bbox_min[idx * 3], bmin, sizeof(bmin));
    std::memcpy(&bbox_max[idx * 3], bmax, sizeof(bmax));
    if (f.count <= leaf_size) {
      leaf_start[idx] = (int32_t)f.start;
      leaf_count[idx] = (int32_t)f.count;
      right_child.push_back(-1);
    } else {
      leaf_start[idx] = 0;
      leaf_count[idx] = 0;
      right_child.push_back(0);
      const int64_t half = f.count / 2;
      stack.push_back({f.start + half, f.count - half, idx});
      stack.push_back({f.start, half, -1});
    }
    ++n;
  }

  // skip links: preorder threading (matches ops/bvh.py pass 2)
  std::vector<std::pair<int64_t, int64_t>> frames;
  frames.push_back({0, n});
  while (!frames.empty()) {
    auto [i, s] = frames.back();
    frames.pop_back();
    skip[i] = (int32_t)s;
    if (leaf_count[i] == 0) {
      const int64_t rc = right_child[i];
      frames.push_back({i + 1, rc});
      frames.push_back({rc, s});
    }
  }
  return n;
}

// Vertex deduplication: hash rows of `stride` floats; remap[i] = index of the
// first identical row (bitwise). Returns the unique count.
// (meshoptimizer generateVertexRemap analog, MeshProcessing.cpp:159-192)
int64_t gatling_dedup(const float* data, int64_t n, int64_t stride,
                      int32_t* remap) {
  struct RowHash {
    const float* data;
    int64_t stride;
    size_t operator()(int64_t i) const {
      const uint32_t* p = reinterpret_cast<const uint32_t*>(data + i * stride);
      uint64_t h = 1469598103934665603ull;
      for (int64_t k = 0; k < stride; ++k) {
        h ^= p[k];
        h *= 1099511628211ull;
      }
      return (size_t)h;
    }
  };
  struct RowEq {
    const float* data;
    int64_t stride;
    bool operator()(int64_t a, int64_t b) const {
      return std::memcmp(data + a * stride, data + b * stride,
                         stride * sizeof(float)) == 0;
    }
  };
  std::unordered_map<int64_t, int32_t, RowHash, RowEq> seen(
      16, RowHash{data, stride}, RowEq{data, stride});
  seen.reserve((size_t)n);
  int64_t unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto [it, inserted] = seen.emplace(i, (int32_t)unique);
    if (inserted) {
      remap[i] = (int32_t)unique;
      ++unique;
    } else {
      remap[i] = it->second;
    }
  }
  return unique;
}

// Mesh-buffer compression: byteshuffle (split byte planes, the blosc
// SHUFFLE filter) + zlib deflate level 3 — the giProcessMeshData analog
// (reference: MeshProcessing.cpp:56-78 blosc level 3 BITSHUFFLE per buffer
// >= 1 KiB). Returns the compressed size, or -1 when dst_cap is too small
// (callers fall back to storing raw).
int64_t gatling_compress(const uint8_t* src, int64_t n, int64_t elem_size,
                         uint8_t* dst, int64_t dst_cap) {
  if (n <= 0 || elem_size <= 0 || n % elem_size != 0) return -1;
  const int64_t count = n / elem_size;
  std::vector<uint8_t> shuffled((size_t)n);
  for (int64_t b = 0; b < elem_size; ++b) {
    uint8_t* plane = shuffled.data() + b * count;
    for (int64_t i = 0; i < count; ++i) plane[i] = src[i * elem_size + b];
  }
  uLongf out_len = (uLongf)dst_cap;
  if (compress2(dst, &out_len, shuffled.data(), (uLong)n, 3) != Z_OK)
    return -1;
  return (int64_t)out_len;
}

// Inverse of gatling_compress. Returns n on success, -1 on corrupt input.
int64_t gatling_decompress(const uint8_t* src, int64_t csize,
                           int64_t elem_size, uint8_t* dst, int64_t n) {
  if (n <= 0 || elem_size <= 0 || n % elem_size != 0) return -1;
  const int64_t count = n / elem_size;
  std::vector<uint8_t> shuffled((size_t)n);
  uLongf out_len = (uLongf)n;
  if (uncompress(shuffled.data(), &out_len, src, (uLong)csize) != Z_OK ||
      (int64_t)out_len != n)
    return -1;
  for (int64_t b = 0; b < elem_size; ++b) {
    const uint8_t* plane = shuffled.data() + b * count;
    for (int64_t i = 0; i < count; ++i) dst[i * elem_size + b] = plane[i];
  }
  return n;
}

// LZ4 block decode (lz4 block format spec) for the binary-USD (crate)
// reader: pxr compresses every token/field/path/spec table and most value
// arrays with LZ4 (crateFile.cpp TfFastCompression); multi-MB sections
// through the pure-python decoder would dominate stage-open time.
// Returns bytes written, or -1 on malformed input / overrun.
int64_t gatling_lz4_decompress(const uint8_t* src, int64_t n,
                               uint8_t* dst, int64_t cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    const uint8_t token = src[i++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n || o + lit > cap) return -1;
    std::memcpy(dst + o, src + i, (size_t)lit);
    i += lit;
    o += lit;
    if (i >= n) break;  // last sequence: literals only
    if (i + 2 > n) return -1;
    const int64_t off = (int64_t)src[i] | ((int64_t)src[i + 1] << 8);
    i += 2;
    int64_t mlen = (token & 0xF) + 4;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    int64_t start = o - off;
    if (start < 0 || o + mlen > cap) return -1;
    if (off >= mlen) {
      std::memcpy(dst + o, dst + start, (size_t)mlen);
    } else {  // overlapping match: byte-serial semantics
      for (int64_t k = 0; k < mlen; ++k) dst[o + k] = dst[start + k];
    }
    o += mlen;
  }
  return o;
}

}  // extern "C"
