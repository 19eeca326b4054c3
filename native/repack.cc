// Native repack runtime: GGML block formats -> universal TPU QTensor planes.
//
// The TPU-native counterpart of the reference's native data path (its model
// loaders parse + place tensors in C++, models/llms/*.cc and llama.cpp's
// llama_model_loader). Here the hot host-side work at model-load time —
// per-block bit unpacking, the (out,in)->(in,out) transpose, and 4-bit
// nibble re-packing — runs multithreaded in C++ instead of vectorized
// numpy, cutting multi-GB model load times. Exposed as a tiny C ABI
// consumed via ctypes (ctransformers_tpu/formats/native.py); the numpy
// implementation (formats/quants.py:decompose) remains the reference and
// the fallback.
//
// Decompose contract (must stay bit-exact with quants.py):
//   x[i] = q[i] * s[i / group] + m[i / group]
// with blocks laid out per ggml.c:888-933 and k_quants.h:34-126.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef int8_t i8;

// fp16 -> fp32 (IEEE half, round-trip exact)
static float f16_to_f32(u16 h) {
  u32 sign = (u32)(h & 0x8000) << 16;
  u32 exp = (h >> 10) & 0x1F;
  u32 man = h & 0x3FF;
  u32 bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) {
        man <<= 1;
        exp--;
      }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000 | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

static inline u16 rd16(const u8* p) {
  u16 v;
  std::memcpy(&v, p, 2);
  return v;
}
static inline u32 rd32(const u8* p) {
  u32 v;
  std::memcpy(&v, p, 4);
  return v;
}
static inline float rdf32(const u8* p) {
  float v;
  std::memcpy(&v, p, 4);
  return v;
}

// Per-type block decompose into contiguous q[bs], s[bs/g], m[bs/g].
// Returns group size; m filled only when has_min.

struct TypeInfo {
  int block_size;
  int type_size;
  int group;
  bool has_min;
};

// type ids match enum ggml_type (ggml.h:288-310)
enum {
  T_Q4_0 = 2,
  T_Q4_1 = 3,
  T_Q5_0 = 6,
  T_Q5_1 = 7,
  T_Q8_0 = 8,
  T_Q8_1 = 9,
  T_Q2_K = 10,
  T_Q3_K = 11,
  T_Q4_K = 12,
  T_Q5_K = 13,
  T_Q6_K = 14,
  T_Q8_K = 15,
};

static bool type_info(int t, TypeInfo* out) {
  switch (t) {
    case T_Q4_0: *out = {32, 18, 32, false}; return true;
    case T_Q4_1: *out = {32, 20, 32, true}; return true;
    case T_Q5_0: *out = {32, 22, 32, false}; return true;
    case T_Q5_1: *out = {32, 24, 32, true}; return true;
    case T_Q8_0: *out = {32, 34, 32, false}; return true;
    case T_Q8_1: *out = {32, 40, 32, false}; return true;
    case T_Q2_K: *out = {256, 84, 16, true}; return true;
    case T_Q3_K: *out = {256, 110, 16, false}; return true;
    case T_Q4_K: *out = {256, 144, 32, true}; return true;
    case T_Q5_K: *out = {256, 176, 32, true}; return true;
    case T_Q6_K: *out = {256, 210, 16, false}; return true;
    case T_Q8_K: *out = {256, 292, 32, false}; return true;
    default: return false;
  }
}

// q4_K / q5_K 6-bit packed scales/mins (get_scale_min_k4, k_quants.c:306)
static void scale_min_k4(const u8* sc, int j, u8* d, u8* m) {
  if (j < 4) {
    *d = sc[j] & 63;
    *m = sc[j + 4] & 63;
  } else {
    *d = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4);
    *m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4);
  }
}

static void dc_block(int t, const u8* b, i8* q, float* s, float* m) {
  switch (t) {
    case T_Q4_0: {
      float d = f16_to_f32(rd16(b));
      for (int i = 0; i < 16; i++) {
        q[i] = (i8)(b[2 + i] & 0xF) - 8;
        q[16 + i] = (i8)(b[2 + i] >> 4) - 8;
      }
      s[0] = d;
      break;
    }
    case T_Q4_1: {
      float d = f16_to_f32(rd16(b));
      float mn = f16_to_f32(rd16(b + 2));
      for (int i = 0; i < 16; i++) {
        q[i] = (i8)(b[4 + i] & 0xF);
        q[16 + i] = (i8)(b[4 + i] >> 4);
      }
      s[0] = d;
      m[0] = mn;
      break;
    }
    case T_Q5_0: {
      float d = f16_to_f32(rd16(b));
      u32 qh = rd32(b + 2);
      for (int i = 0; i < 16; i++) {
        int xh0 = ((qh >> i) << 4) & 0x10;
        int xh1 = (qh >> (i + 12)) & 0x10;
        q[i] = (i8)(((b[6 + i] & 0xF) | xh0) - 16);
        q[16 + i] = (i8)(((b[6 + i] >> 4) | xh1) - 16);
      }
      s[0] = d;
      break;
    }
    case T_Q5_1: {
      float d = f16_to_f32(rd16(b));
      float mn = f16_to_f32(rd16(b + 2));
      u32 qh = rd32(b + 4);
      for (int i = 0; i < 16; i++) {
        int xh0 = ((qh >> i) << 4) & 0x10;
        int xh1 = (qh >> (i + 12)) & 0x10;
        q[i] = (i8)((b[8 + i] & 0xF) | xh0);
        q[16 + i] = (i8)((b[8 + i] >> 4) | xh1);
      }
      s[0] = d;
      m[0] = mn;
      break;
    }
    case T_Q8_0: {
      float d = f16_to_f32(rd16(b));
      std::memcpy(q, b + 2, 32);
      s[0] = d;
      break;
    }
    case T_Q8_1: {
      float d = rdf32(b);
      std::memcpy(q, b + 8, 32);
      s[0] = d;
      break;
    }
    case T_Q2_K: {
      // dequantize_row_q2_K (k_quants.c:396)
      const u8* scales = b;
      const u8* qs = b + 16;
      float d = f16_to_f32(rd16(b + 80));
      float dmin = f16_to_f32(rd16(b + 82));
      for (int half = 0; half < 2; half++) {
        for (int j = 0; j < 4; j++) {
          for (int grp16 = 0; grp16 < 2; grp16++) {
            int sidx16 = 8 * half + 2 * j + grp16;
            u8 sc = scales[sidx16];
            s[sidx16] = d * (float)(sc & 0xF);
            m[sidx16] = -(dmin * (float)(sc >> 4));
            for (int p = 0; p < 16; p++) {
              int pos = grp16 * 16 + p;
              int l = 128 * half + 32 * j + pos;
              q[l] = (i8)((qs[32 * half + pos] >> (2 * j)) & 3);
            }
          }
        }
      }
      break;
    }
    case T_Q3_K: {
      // dequantize_row_q3_K (k_quants.c:575); 12-byte 6-bit scales
      const u8* hm = b;
      const u8* qs = b + 32;
      const u8* a = b + 96;
      float d = f16_to_f32(rd16(b + 108));
      int scs[16];
      for (int i = 0; i < 8; i++) {
        scs[i] = a[i] & 0xF;
        scs[i + 8] = a[i] >> 4;
      }
      for (int i = 0; i < 4; i++) {
        int hi = a[8 + i];
        scs[i] |= ((hi >> 0) & 3) << 4;
        scs[i + 4] |= ((hi >> 2) & 3) << 4;
        scs[i + 8] |= ((hi >> 4) & 3) << 4;
        scs[i + 12] |= ((hi >> 6) & 3) << 4;
      }
      for (int half = 0; half < 2; half++) {
        for (int j = 0; j < 4; j++) {
          for (int grp16 = 0; grp16 < 2; grp16++) {
            int sidx = 8 * half + 2 * j + grp16;
            s[sidx] = d * (float)(scs[sidx] - 32);
            for (int p = 0; p < 16; p++) {
              int pos = grp16 * 16 + p;
              int l = 128 * half + 32 * j + pos;
              int v = (qs[32 * half + pos] >> (2 * j)) & 3;
              int hbit = (hm[pos] >> (4 * half + j)) & 1;
              q[l] = (i8)(v - (hbit ? 0 : 4));
            }
          }
        }
      }
      break;
    }
    case T_Q4_K: {
      float d = f16_to_f32(rd16(b));
      float dmin = f16_to_f32(rd16(b + 2));
      const u8* sc = b + 4;
      const u8* qs = b + 16;
      for (int chunk = 0; chunk < 4; chunk++) {
        for (int hi = 0; hi < 2; hi++) {
          int sidx = 2 * chunk + hi;
          u8 dd, mm;
          scale_min_k4(sc, sidx, &dd, &mm);
          s[sidx] = d * (float)dd;
          m[sidx] = -(dmin * (float)mm);
          for (int p = 0; p < 32; p++) {
            int l = 64 * chunk + 32 * hi + p;
            q[l] = (i8)((qs[32 * chunk + p] >> (4 * hi)) & 0xF);
          }
        }
      }
      break;
    }
    case T_Q5_K: {
      float d = f16_to_f32(rd16(b));
      float dmin = f16_to_f32(rd16(b + 2));
      const u8* sc = b + 4;
      const u8* qh = b + 16;
      const u8* qs = b + 48;
      for (int chunk = 0; chunk < 4; chunk++) {
        for (int hi = 0; hi < 2; hi++) {
          int sidx = 2 * chunk + hi;
          u8 dd, mm;
          scale_min_k4(sc, sidx, &dd, &mm);
          s[sidx] = d * (float)dd;
          m[sidx] = -(dmin * (float)mm);
          for (int p = 0; p < 32; p++) {
            int l = 64 * chunk + 32 * hi + p;
            int v = (qs[32 * chunk + p] >> (4 * hi)) & 0xF;
            int hb = (qh[p] >> (2 * chunk + hi)) & 1;
            q[l] = (i8)(v + (hb ? 16 : 0));
          }
        }
      }
      break;
    }
    case T_Q6_K: {
      const u8* ql = b;
      const u8* qh = b + 128;
      const i8* scales = (const i8*)(b + 192);
      float d = f16_to_f32(rd16(b + 208));
      for (int half = 0; half < 2; half++) {
        for (int grp = 0; grp < 4; grp++) {
          for (int p = 0; p < 32; p++) {
            int l = 128 * half + 32 * grp + p;
            int lo = (ql[64 * half + 32 * (grp % 2) + p] >> (4 * (grp / 2))) & 0xF;
            int hi = (qh[32 * half + p] >> (2 * grp)) & 3;
            q[l] = (i8)((lo | (hi << 4)) - 32);
            int sidx = 8 * half + (p / 16) + 2 * grp;
            s[sidx] = d * (float)scales[sidx];
          }
        }
      }
      break;
    }
    case T_Q8_K: {
      float d = rdf32(b);
      std::memcpy(q, b + 4, 256);
      for (int j = 0; j < 8; j++) s[j] = d;
      break;
    }
  }
}

}  // namespace

extern "C" {

// Info query: returns 0 on success.
int ct_type_info(int t, int* block_size, int* type_size, int* group,
                 int* has_min) {
  TypeInfo info;
  if (!type_info(t, &info)) return -1;
  *block_size = info.block_size;
  *type_size = info.type_size;
  *group = info.group;
  *has_min = info.has_min ? 1 : 0;
  return 0;
}

// Decompose + transpose: file tensor (rows x cols, blocks along cols) ->
//   q_out   (cols x rows) int8      [x @ W layout]
//   s_out   (cols/group x rows) f32
//   m_out   (cols/group x rows) f32 (only when the format has mins)
// Multithreaded over rows. Returns 0 on success.
int ct_repack(const u8* data, int t, int64_t rows, int64_t cols, i8* q_out,
              float* s_out, float* m_out, int n_threads) {
  TypeInfo info;
  if (!type_info(t, &info)) return -1;
  if (cols % info.block_size) return -2;
  const int bs = info.block_size;
  const int ts = info.type_size;
  const int g = info.group;
  const int64_t blocks_per_row = cols / bs;
  const int64_t row_bytes = blocks_per_row * ts;

  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }

  auto work = [&](int64_t r0, int64_t r1) {
    std::vector<i8> q(bs);
    std::vector<float> s(bs / g);
    std::vector<float> m(bs / g);
    for (int64_t r = r0; r < r1; r++) {
      const u8* rowp = data + r * row_bytes;
      for (int64_t blk = 0; blk < blocks_per_row; blk++) {
        dc_block(t, rowp + blk * ts, q.data(), s.data(), m.data());
        const int64_t k0 = blk * bs;
        for (int i = 0; i < bs; i++) q_out[(k0 + i) * rows + r] = q[i];
        const int64_t g0 = k0 / g;
        for (int j = 0; j < bs / g; j++) {
          s_out[(g0 + j) * rows + r] = s[j];
          if (info.has_min && m_out) m_out[(g0 + j) * rows + r] = m[j];
        }
      }
    }
  };

  std::vector<std::thread> pool;
  int64_t chunk = (rows + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; i++) {
    int64_t r0 = i * chunk;
    int64_t r1 = r0 + chunk < rows ? r0 + chunk : rows;
    if (r0 >= r1) break;
    pool.emplace_back(work, r0, r1);
  }
  for (auto& th : pool) th.join();
  return 0;
}

// 4-bit nibble packing for the Pallas packed kernel: q (kp x n) int8 ->
// out (kp/2 x n) uint8 with byte (k, c) = (q[k,c]+zp) | (q[k+kp/2,c]+zp)<<4.
int ct_pack4(const i8* q, int64_t kp, int64_t n, int zp, u8* out,
             int n_threads) {
  if (kp % 2) return -1;
  const int64_t half = kp / 2;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  auto work = [&](int64_t k0, int64_t k1) {
    for (int64_t k = k0; k < k1; k++) {
      const i8* lo = q + k * n;
      const i8* hi = q + (k + half) * n;
      u8* o = out + k * n;
      for (int64_t c = 0; c < n; c++) {
        o[c] = (u8)((u8)(lo[c] + zp) | ((u8)(hi[c] + zp) << 4));
      }
    }
  };
  std::vector<std::thread> pool;
  int64_t chunk = (half + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; i++) {
    int64_t k0 = i * chunk;
    int64_t k1 = k0 + chunk < half ? k0 + chunk : half;
    if (k0 >= k1) break;
    pool.emplace_back(work, k0, k1);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
