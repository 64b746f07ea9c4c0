// volxel_native — host-side ingest kernels (C++17, no external deps).
//
// Native counterpart of the reference's Rust/WASM preprocessor
// (dicom_preprocessor/src/{lib,brick}.rs), redesigned:
//   * one-pass u16 scan: histogram + min/max (lib.rs:87-102 role)
//   * brick-grid construction (brick.rs:76-205 role): dilated per-brick
//     min/max, constant-brick elision, bump-allocated atlas, range mips —
//     multithreaded over brick slabs (the reference serialized this and
//     left "TODO: this was multithreaded" comments, brick.rs:90,125)
//
// Exposed as a C ABI for ctypes. All 3D buffers are z-major (Z, Y, X),
// matching Buf3D (buf3d.rs:26-28) and the Python side.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int BRICK = 8;
constexpr int DILATE = 2;

// float32 -> IEEE float16 bits (round-to-nearest-even), then back.
// Mirrors the f16 round-trip the reference's encode_range performs
// (brick.rs:19-28 via the `half` crate).
uint16_t f32_to_f16_bits(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFFu;
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;  // underflow -> signed zero
    mant |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint32_t half = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t mid = 1u << (shift - 1);
    if (rem > mid || (rem == mid && (half & 1))) half++;
    return (uint16_t)(sign | half);
  }
  if (exp >= 31) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
  uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
  return (uint16_t)(sign | half);
}

float f16_bits_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FFu;
  uint32_t x;
  if (exp == 0) {
    if (mant == 0) {
      x = sign;
    } else {
      exp = 127 - 15 + 1;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3FFu;
      x = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    x = sign | 0x7F800000u | (mant << 13);
  } else {
    x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &x, 4);
  return f;
}

float f16_round(float f) { return f16_bits_to_f32(f32_to_f16_bits(f)); }

inline int num_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? (int)n : 1;
}

template <typename F>
void parallel_for(int64_t begin, int64_t end, F&& fn) {
  int threads = std::min<int64_t>(num_threads(), end - begin);
  if (threads <= 1) {
    for (int64_t i = begin; i < end; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(begin);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= end) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// One-pass u16 pixel scan: accumulate histogram (bins entries) and min/max.
void volxel_scan_u16(const uint16_t* data, int64_t n, uint32_t* histogram,
                     int64_t bins, uint16_t* out_min, uint16_t* out_max) {
  uint16_t lo = 0xFFFF, hi = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint16_t v = data[i];
    if (v < bins) histogram[v]++;
    lo = std::min(lo, v);
    hi = std::max(hi, v);
  }
  *out_min = lo;
  *out_max = hi;
}

// Brick-grid construction from a dense z-major (ez, ey, ex) float volume.
//
// Outputs (caller-allocated):
//   range_lo / range_hi : (bz*by*bx) float, f16-rounded
//   indirection         : (bz*by*bx * 3) int32 (x, y, z), zeros if constant
//   occupied            : (bz*by*bx) uint8 mask
// Returns the occupied-brick count. Atlas fill is a second pass
// (volxel_fill_atlas) once the caller has sized the pruned atlas.
int64_t volxel_brick_ranges(const float* data, int64_t ex, int64_t ey,
                            int64_t ez, int64_t bx, int64_t by, int64_t bz,
                            float* range_lo, float* range_hi,
                            int32_t* indirection, uint8_t* occupied) {
  auto lookup = [&](int64_t x, int64_t y, int64_t z) -> float {
    if (x < 0 || y < 0 || z < 0 || x >= ex || y >= ey || z >= ez) return 0.0f;
    return data[(z * ey + y) * ex + x];
  };

  parallel_for(0, bz, [&](int64_t cz) {
    for (int64_t cy = 0; cy < by; ++cy) {
      for (int64_t cx = 0; cx < bx; ++cx) {
        float lo = 3.4e38f, hi = -3.4e38f;
        // dilated window [-2, BRICK+2)^3 (brick.rs:99-112)
        for (int64_t dz = -DILATE; dz < BRICK + DILATE; ++dz) {
          int64_t z = cz * BRICK + dz;
          for (int64_t dy = -DILATE; dy < BRICK + DILATE; ++dy) {
            int64_t y = cy * BRICK + dy;
            if (z < 0 || z >= ez || y < 0 || y >= ey) {
              // whole x-run may still touch in-bounds x; zeros dominate
              lo = std::min(lo, 0.0f);
              hi = std::max(hi, 0.0f);
              continue;
            }
            for (int64_t dx = -DILATE; dx < BRICK + DILATE; ++dx) {
              float v = lookup(cx * BRICK + dx, y, z);
              lo = std::min(lo, v);
              hi = std::max(hi, v);
            }
          }
        }
        int64_t idx = (cz * by + cy) * bx + cx;
        occupied[idx] = (lo != hi) ? 1 : 0;
        range_lo[idx] = f16_round(lo);
        range_hi[idx] = f16_round(hi);
      }
    }
  });

  // bump allocation in z-major scan order (brick.rs:131-134) — sequential
  // prefix pass (cheap relative to the window scan)
  int64_t counter = 0;
  for (int64_t i = 0; i < bz * by * bx; ++i) {
    if (occupied[i]) {
      int64_t slot = counter++;
      indirection[i * 3 + 0] = (int32_t)(slot % bx);
      indirection[i * 3 + 1] = (int32_t)((slot / bx) % by);
      indirection[i * 3 + 2] = (int32_t)(slot / (bx * by));
    } else {
      indirection[i * 3 + 0] = indirection[i * 3 + 1] = indirection[i * 3 + 2] = 0;
    }
  }
  return counter;
}

// Fill the pruned atlas (az, by*8, bx*8) with u8-encoded voxels
// (brick.rs:137-145): quantized against the decoded f16 ranges.
void volxel_fill_atlas(const float* data, int64_t ex, int64_t ey, int64_t ez,
                       int64_t bx, int64_t by, int64_t bz,
                       const float* range_lo, const float* range_hi,
                       const int32_t* indirection, const uint8_t* occupied,
                       uint8_t* atlas, int64_t az) {
  const int64_t ax = bx * BRICK, ay = by * BRICK;
  (void)az;
  auto lookup = [&](int64_t x, int64_t y, int64_t z) -> float {
    if (x < 0 || y < 0 || z < 0 || x >= ex || y >= ey || z >= ez) return 0.0f;
    return data[(z * ey + y) * ex + x];
  };

  parallel_for(0, bz, [&](int64_t cz) {
    for (int64_t cy = 0; cy < by; ++cy) {
      for (int64_t cx = 0; cx < bx; ++cx) {
        int64_t idx = (cz * by + cy) * bx + cx;
        if (!occupied[idx]) continue;
        float lo = range_lo[idx], hi = range_hi[idx];
        float width = hi - lo;
        int64_t px = (int64_t)indirection[idx * 3 + 0] * BRICK;
        int64_t py = (int64_t)indirection[idx * 3 + 1] * BRICK;
        int64_t pz = (int64_t)indirection[idx * 3 + 2] * BRICK;
        for (int64_t dz = 0; dz < BRICK; ++dz) {
          for (int64_t dy = 0; dy < BRICK; ++dy) {
            for (int64_t dx = 0; dx < BRICK; ++dx) {
              float v = lookup(cx * BRICK + dx, cy * BRICK + dy, cz * BRICK + dz);
              // true f32 division + floor(x+0.5), matching the numpy
              // builder op-for-op (encoding.py encode_voxel) — a
              // reciprocal-multiply or lround can differ by one step on
              // exact .5 boundaries
              float norm = width > 0 ? (v - lo) / width : 0.0f;
              norm = std::min(1.0f, std::max(0.0f, norm));
              if (width <= 0) norm = 0.0f;
              atlas[((pz + dz) * ay + (py + dy)) * ax + (px + dx)] =
                  (uint8_t)std::floor(255.0f * norm + 0.5f);
            }
          }
        }
      }
    }
  });
}

// JPEG lossless (process 14) scan decode: Huffman diffs + prediction.
// Bit-exact counterpart of ingest/jpeg.py::_decode_lossless's inner loop —
// the hot path of compressed CT ingest (the reference decodes via the
// dicom-pixeldata jpeg feature, Cargo.toml:25). `lut` is the Python-built
// 64K peek table: (code length << 16) | symbol for every 16-bit prefix.
// Decodes n_samples starting at flat index start_idx of a (h, w) image.
// Returns samples decoded, or -1 on an invalid Huffman code.
int64_t volxel_jpeg_lossless_chunk(
    const uint8_t* data, int64_t nbytes, const uint32_t* lut, int32_t* out,
    int64_t w, int64_t h, int64_t start_idx, int64_t n_samples,
    int32_t predictor, int32_t default_pred) {
  (void)h;
  int64_t bitpos = 0;
  const int64_t nbits = nbytes * 8;
  bool first_of_interval = true;
  for (int64_t i = 0; i < n_samples; ++i) {
    if (bitpos + 16 > nbits + 64) return -1;  // padded reads past data => bad
    int64_t byte = bitpos >> 3;
    int sh = (int)(bitpos & 7);
    uint32_t win = ((uint32_t)data[byte] << 16) |
                   ((uint32_t)data[byte + 1] << 8) | (uint32_t)data[byte + 2];
    uint32_t peek = (win >> (8 - sh)) & 0xFFFF;
    uint32_t v = lut[peek];
    int len = (int)(v >> 16);
    if (len == 0) return -1;
    int s = (int)(v & 0xFFFF);
    bitpos += len;
    int32_t diff;
    if (s == 16) {
      diff = 32768;
    } else if (s == 0) {
      diff = 0;
    } else {
      byte = bitpos >> 3;
      sh = (int)(bitpos & 7);
      uint64_t win4 = ((uint64_t)data[byte] << 24) |
                      ((uint64_t)data[byte + 1] << 16) |
                      ((uint64_t)data[byte + 2] << 8) |
                      (uint64_t)data[byte + 3];
      uint32_t bits = (uint32_t)((win4 >> (32 - sh - s)) & ((1u << s) - 1));
      bitpos += s;
      // T.81 F.2.2.1 sign extension
      diff = (bits < (1u << (s - 1))) ? (int32_t)bits - (1 << s) + 1
                                      : (int32_t)bits;
    }
    int64_t j = start_idx + i;
    int64_t y = j / w, x = j - y * w;
    int32_t px;
    if (first_of_interval || (y == 0 && x == 0)) {
      px = default_pred;
      first_of_interval = false;
    } else if (y == 0) {
      px = out[j - 1];
    } else if (x == 0) {
      px = out[j - w];
    } else {
      int32_t ra = out[j - 1], rb = out[j - w], rc = out[j - w - 1];
      switch (predictor) {
        case 1: px = ra; break;
        case 2: px = rb; break;
        case 3: px = rc; break;
        case 4: px = ra + rb - rc; break;
        case 5: px = ra + ((rb - rc) >> 1); break;
        case 6: px = rb + ((ra - rc) >> 1); break;
        default: px = (ra + rb) >> 1; break;
      }
    }
    out[j] = (px + diff) & 0xFFFF;
  }
  return n_samples;
}

}  // extern "C"
