// Native host-side kernels for uivr_tpu (C++17, no external deps).
//
// The reference delegates its host-side heavy lifting (image codecs, volume
// IO, sampling-table construction) to native Mitsuba/OpenEXR code; these are
// the TPU build's equivalents, exposed via a plain C ABI for ctypes.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Walker/Vose alias-table construction, O(N).  Replaces the Python loop in
// scene/emitters.make_envmap, which is prohibitively slow for multi-megatexel
// HDR environment maps (2k envmap = 2M texels).
// ---------------------------------------------------------------------------
void build_alias_table(const double* pmf, int64_t n, int32_t* alias,
                       float* prob) {
  std::vector<double> scaled(n);
  for (int64_t i = 0; i < n; ++i) scaled[i] = pmf[i] * (double)n;
  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    alias[i] = (int32_t)i;
    prob[i] = 1.0f;
    (scaled[i] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back();
    small.pop_back();
    int64_t l = large.back();
    large.pop_back();
    prob[s] = (float)scaled[s];
    alias[s] = (int32_t)l;
    scaled[l] -= (1.0 - scaled[s]);
    (scaled[l] < 1.0 ? small : large).push_back(l);
  }
  // leftovers are numerically ~1
  for (int64_t i : small) prob[i] = 1.0f;
  for (int64_t i : large) prob[i] = 1.0f;
}

// ---------------------------------------------------------------------------
// OpenEXR ZIP pre/post filters: interleave-split + byte delta coding.
// (core/exr_io.py hot path for large reference image sets.)
// ---------------------------------------------------------------------------
void exr_zip_predict(const uint8_t* src, int64_t n, uint8_t* dst) {
  int64_t half = (n + 1) / 2;
  // reorder: even bytes then odd bytes
  for (int64_t i = 0, j = 0; i < n; i += 2, ++j) dst[j] = src[i];
  for (int64_t i = 1, j = half; i < n; i += 2, ++j) dst[j] = src[i];
  // delta encode in place
  uint8_t prev = dst[0];
  for (int64_t i = 1; i < n; ++i) {
    uint8_t cur = dst[i];
    dst[i] = (uint8_t)((int)cur - (int)prev + 128 + 256);
    prev = cur;
  }
}

void exr_zip_unpredict(const uint8_t* src, int64_t n, uint8_t* dst) {
  std::vector<uint8_t> rec(n);
  rec[0] = src[0];
  for (int64_t i = 1; i < n; ++i)
    rec[i] = (uint8_t)((int)rec[i - 1] + (int)src[i] - 128);
  int64_t half = (n + 1) / 2;
  for (int64_t i = 0, j = 0; j < half; i += 2, ++j) dst[i] = rec[j];
  for (int64_t i = 1, j = half; j < n; i += 2, ++j) dst[i] = rec[j];
}

// ---------------------------------------------------------------------------
// Radiance RGBE (.hdr) scanline decode (core/hdr_io.py hot path: the
// paper's 2k-4k envmaps are ~8M pixels; the per-byte RLE loop belongs in
// native code like Mitsuba's Bitmap).  Decodes ALL scanlines (new-style
// per-component RLE or flat/old-style runs) into H*W*4 RGBE bytes.
// Returns 0 on success, -1 on malformed input (caller falls back to the
// Python reader for a precise error).
// ---------------------------------------------------------------------------
int hdr_decode_scanlines(const uint8_t* src, int64_t n, int64_t W, int64_t H,
                         uint8_t* out /* H*W*4 */) {
  int64_t i = 0;
  for (int64_t y = 0; y < H; ++y) {
    uint8_t* row = out + y * W * 4;
    if (W >= 8 && W < 32768 && i + 4 <= n && src[i] == 2 && src[i + 1] == 2 &&
        ((int64_t)src[i + 2] << 8 | src[i + 3]) == W) {
      i += 4;  // new-style RLE: 4 component planes
      for (int c = 0; c < 4; ++c) {
        int64_t x = 0;
        while (x < W) {
          if (i >= n) return -1;
          int64_t cnt = src[i];
          if (cnt > 128) {  // run
            cnt -= 128;
            if (i + 1 >= n || x + cnt > W) return -1;
            uint8_t v = src[i + 1];
            for (int64_t k = 0; k < cnt; ++k) row[(x + k) * 4 + c] = v;
            i += 2;
          } else {  // literal
            if (i + 1 + cnt > n || x + cnt > W) return -1;
            for (int64_t k = 0; k < cnt; ++k)
              row[(x + k) * 4 + c] = src[i + 1 + k];
            i += 1 + cnt;
          }
          x += cnt;
        }
      }
    } else {  // flat pixels with old-style (1,1,1,n) run markers
      int64_t x = 0;
      int rshift = 0;  // consecutive markers shift the count 8 bits each
      while (x < W) {
        if (i + 4 > n) return -1;
        if (src[i] == 1 && src[i + 1] == 1 && src[i + 2] == 1 && x > 0) {
          if (rshift > 24) return -1;  // corrupt: shift would overflow
          int64_t cnt = (int64_t)src[i + 3] << rshift;
          if (x + cnt > W) return -1;
          for (int64_t k = 0; k < cnt; ++k)
            std::memcpy(row + (x + k) * 4, row + (x - 1) * 4, 4);
          x += cnt;
          rshift += 8;
        } else {
          std::memcpy(row + x * 4, src + i, 4);
          x += 1;
          rshift = 0;
        }
        i += 4;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Mitsuba .vol payload transpose helpers (x-fastest <-> channel packing) and
// a fused min/max scan used when validating imported grids.
// ---------------------------------------------------------------------------
void grid_minmax(const float* data, int64_t n, float* out_min,
                 float* out_max) {
  float lo = data[0], hi = data[0];
  for (int64_t i = 1; i < n; ++i) {
    lo = std::min(lo, data[i]);
    hi = std::max(hi, data[i]);
  }
  *out_min = lo;
  *out_max = hi;
}

}  // extern "C"
