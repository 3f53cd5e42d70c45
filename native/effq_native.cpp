// Native host-side runtime kernels for effq-tpu.
//
// The reference pipeline keeps all host work in Python/NumPy; these C++
// routines accelerate the data-loader hot paths that sit between disk and
// device (profiled as the host-side bottlenecks of balance-cropped patch
// training, src/dataloader/transforms.py:429-470 and :539-628):
//
//  - sample_value_voxel: O(n)/O(1) reservoir sampling of a voxel equal to a
//    given label (replaces argwhere + choice which materializes an index
//    matrix per crop)
//  - count_value: fused count of mask==value
//  - zoom3d_linear / zoom3d_nearest: trilinear / nearest 3-D resampling for
//    the random-scale augmentation (coordinate mapping i_in = i_out / zoom,
//    clamped — ndimage.zoom order<=1 semantics)
//
// Exposed with a plain C ABI and loaded via ctypes (no pybind11 in the
// image); every entry point has a NumPy fallback in
// efficientq_tpu/data/native.py.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// xorshift64* PRNG — deterministic given seed, no libc rand state.
static inline uint64_t next_rand(uint64_t* s) {
    uint64_t x = *s;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

// Reservoir-sample one index i with mask[i] == value. Returns the number of
// matching voxels (0 => *out_index untouched).
int64_t sample_value_voxel(const uint8_t* mask, int64_t n, uint8_t value,
                           uint64_t seed, int64_t* out_index) {
    uint64_t rng = seed | 1;
    int64_t count = 0;
    int64_t chosen = -1;
    for (int64_t i = 0; i < n; ++i) {
        if (mask[i] == value) {
            ++count;
            // keep with probability 1/count
            if ((next_rand(&rng) % (uint64_t)count) == 0) chosen = i;
        }
    }
    if (count > 0) *out_index = chosen;
    return count;
}

// Same, but sampling a voxel with mask[i] != value (the negative branch of
// BalanceCrop).
int64_t sample_not_value_voxel(const uint8_t* mask, int64_t n, uint8_t value,
                               uint64_t seed, int64_t* out_index) {
    uint64_t rng = seed | 1;
    int64_t count = 0;
    int64_t chosen = -1;
    for (int64_t i = 0; i < n; ++i) {
        if (mask[i] != value) {
            ++count;
            if ((next_rand(&rng) % (uint64_t)count) == 0) chosen = i;
        }
    }
    if (count > 0) *out_index = chosen;
    return count;
}

int64_t count_value(const uint8_t* mask, int64_t n, uint8_t value) {
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) count += (mask[i] == value);
    return count;
}

static inline float sample_clamped(const float* src, int64_t d, int64_t h,
                                   int64_t w, int64_t sd, int64_t sh,
                                   int64_t sw) {
    d = std::min(std::max(d, (int64_t)0), sd - 1);
    h = std::min(std::max(h, (int64_t)0), sh - 1);
    w = std::min(std::max(w, (int64_t)0), sw - 1);
    return src[(d * sh + h) * sw + w];
}

// Trilinear resample: dst[i] = src[i / zoom], zoom = dst_dim / src_dim.
void zoom3d_linear(const float* src, int64_t sd, int64_t sh, int64_t sw,
                   float* dst, int64_t dd, int64_t dh, int64_t dw) {
    const double zd = (double)dd / sd, zh = (double)dh / sh,
                 zw = (double)dw / sw;
    for (int64_t i = 0; i < dd; ++i) {
        double fi = i / zd;
        int64_t i0 = (int64_t)fi;
        double ti = fi - i0;
        for (int64_t j = 0; j < dh; ++j) {
            double fj = j / zh;
            int64_t j0 = (int64_t)fj;
            double tj = fj - j0;
            for (int64_t k = 0; k < dw; ++k) {
                double fk = k / zw;
                int64_t k0 = (int64_t)fk;
                double tk = fk - k0;
                double acc = 0.0;
                for (int di = 0; di < 2; ++di)
                    for (int dj = 0; dj < 2; ++dj)
                        for (int dk = 0; dk < 2; ++dk) {
                            double wgt = (di ? ti : 1 - ti) *
                                         (dj ? tj : 1 - tj) *
                                         (dk ? tk : 1 - tk);
                            if (wgt == 0.0) continue;
                            acc += wgt * sample_clamped(src, i0 + di, j0 + dj,
                                                        k0 + dk, sd, sh, sw);
                        }
                dst[(i * dh + j) * dw + k] = (float)acc;
            }
        }
    }
}

// Nearest-neighbour resample (labels): dst[i] = src[round(i / zoom)].
void zoom3d_nearest_u8(const uint8_t* src, int64_t sd, int64_t sh, int64_t sw,
                       uint8_t* dst, int64_t dd, int64_t dh, int64_t dw) {
    const double zd = (double)dd / sd, zh = (double)dh / sh,
                 zw = (double)dw / sw;
    for (int64_t i = 0; i < dd; ++i) {
        int64_t si = std::min((int64_t)(i / zd + 0.5), sd - 1);
        for (int64_t j = 0; j < dh; ++j) {
            int64_t sj = std::min((int64_t)(j / zh + 0.5), sh - 1);
            for (int64_t k = 0; k < dw; ++k) {
                int64_t sk = std::min((int64_t)(k / zw + 0.5), sw - 1);
                dst[(i * dh + j) * dw + k] = src[(si * sh + sj) * sw + sk];
            }
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Space-to-depth serving transforms (the host side of the fused s2d stem,
// efficientq_tpu/pallas/stem.py).  On device the pad->reshape->transpose
// costs 14.9 ms per BraTS volume and regresses the serving graph's layout
// assignment (docs/kernels.md); on the host it is a cheap threaded memory
// shuffle that overlaps the previous volume's device compute in the
// pipelined eval loop.
//
//   dst[n][t][i][j][((pz*2+py)*2+px)*C + c] = src[n][2t+pz][2i+py][2j+px][c]
//
// src: (N, D, H, W, C) float32, dst: (N, out_planes, H/2, W/2, 8C) bf16
// (uint16 storage), zero-filled where 2t+pz >= D.  bf16 conversion is
// round-to-nearest-even — bit-identical to jnp.astype(bfloat16).

#include <thread>
#include <vector>
#ifdef __AVX2__
#include <immintrin.h>
#endif

#ifdef __AVX2__
// RTNE f32 -> bf16 of 8 lanes (NaN quieted — see bf16_row), low 128 bits.
static inline __m128i bf16x8(const float* p) {
    __m256i x = _mm256_loadu_si256((const __m256i*)p);
    __m256i ax = _mm256_and_si256(x, _mm256_set1_epi32(0x7FFFFFFF));
    __m256i is_nan = _mm256_cmpgt_epi32(ax, _mm256_set1_epi32(0x7F800000));
    __m256i bit16 = _mm256_and_si256(_mm256_srli_epi32(x, 16),
                                     _mm256_set1_epi32(1));
    __m256i r = _mm256_srli_epi32(
        _mm256_add_epi32(x, _mm256_add_epi32(bit16,
                                             _mm256_set1_epi32(0x7FFF))),
        16);
    __m256i qn = _mm256_or_si256(_mm256_srli_epi32(x, 16),
                                 _mm256_set1_epi32(0x40));
    r = _mm256_blendv_epi8(r, qn, is_nan);
    // values <= 0xFFFF, so unsigned 32->16 pack never saturates
    __m256i pk = _mm256_packus_epi32(r, r);       // per-lane packed
    pk = _mm256_permute4x64_epi64(pk, 0xD8);      // gather the lanes
    return _mm256_castsi256_si128(pk);
}
#endif


static inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    if ((x & 0x7FFFFFFFu) > 0x7F800000u)  // NaN: the RTNE add would carry
        return (uint16_t)((x >> 16) | 0x0040u);  // into the exponent
    x += 0x7FFFu + ((x >> 16) & 1u);  // RTNE (inf is exact: bit16 = 0)
    return (uint16_t)(x >> 16);
}

// Convert a contiguous f32 run to bf16 (RTNE).  Treating the input as
// uint32 words keeps the loop integer-only, which GCC auto-vectorizes to
// packed AVX shifts/adds (the scalar memcpy form defeated the vectorizer
// and made the whole transform conversion-bound: 135 -> ~30 ms/volume
// single-core on the BraTS serving shape).
static inline void bf16_row(const float* src, uint16_t* dst, int64_t nelem) {
    const uint32_t* s;
    std::memcpy(&s, &src, sizeof(s));  // type-pun the pointer, not each value
    for (int64_t i = 0; i < nelem; ++i) {
        uint32_t x = s[i];
        // NaN guard: the RTNE add would carry into the exponent and turn
        // NaN into inf/-0; quieting matches jnp.astype(bfloat16)
        uint32_t r = ((x & 0x7FFFFFFFu) > 0x7F800000u)
                         ? ((x >> 16) | 0x0040u)
                         : ((x + 0x7FFFu + ((x >> 16) & 1u)) >> 16);
        dst[i] = (uint16_t)r;
    }
}

extern "C" void s2d_bf16(const float* src, int64_t n, int64_t d, int64_t h,
                         int64_t w, int64_t c, uint16_t* dst,
                         int64_t out_planes) {
    const int64_t ho = h / 2, wo = w / 2, c8 = 8 * c, c2 = 2 * c;
    const int64_t dst_plane = ho * wo * c8;
    const int64_t src_plane = h * w * c;
    int64_t total = n * out_planes;
    unsigned nt = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                        (unsigned)total));
    auto work = [&](int64_t lo, int64_t hi) {
        // Output-centric row pass: each 64-byte dst cache line (c8 = 32
        // elements at C=4) is assembled from the 4 phase rows (pz, py) and
        // written exactly ONCE.  (The original phase-major order revisited
        // every dst line 4x: 135 ms/volume single-core; output-centric
        // staging 64 ms; the fused AVX2 form below ~45 ms — at the
        // measured ~6 GB/s single-core bandwidth the 214 MB of traffic
        // bounds this at ~40 ms, i.e. the kernel is bandwidth-bound.)
        std::vector<uint16_t> tmp(4 * w * c, 0);
        std::vector<float> zrow(w * c, 0.0f);
        uint16_t* rows[4] = {tmp.data(), tmp.data() + w * c,
                             tmp.data() + 2 * w * c, tmp.data() + 3 * w * c};
        for (int64_t job = lo; job < hi; ++job) {
            const int64_t ni = job / out_planes, t = job % out_planes;
            uint16_t* out = dst + job * dst_plane;
            for (int64_t i = 0; i < ho; ++i) {
                const float* srow[4];
                for (int64_t pz = 0; pz < 2; ++pz) {
                    const int64_t zi = 2 * t + pz;
                    for (int64_t py = 0; py < 2; ++py)
                        srow[pz * 2 + py] =
                            (zi >= d) ? zrow.data()
                                      : src + (ni * d + zi) * src_plane
                                            + (2 * i + py) * (w * c);
                }
                uint16_t* orow = out + i * (wo * c8);
#ifdef __AVX2__
                if (c2 == 8) {
                    // C=4 (BraTS): fully fused — 8 f32 from each phase row,
                    // converted in-register, two 32-byte stores per line
                    for (int64_t j = 0; j < wo; ++j) {
                        __m128i a0 = bf16x8(srow[0] + j * 8);
                        __m128i a1 = bf16x8(srow[1] + j * 8);
                        __m128i a2 = bf16x8(srow[2] + j * 8);
                        __m128i a3 = bf16x8(srow[3] + j * 8);
                        _mm256_storeu_si256((__m256i*)(orow + j * 32),
                                            _mm256_set_m128i(a1, a0));
                        _mm256_storeu_si256((__m256i*)(orow + j * 32 + 16),
                                            _mm256_set_m128i(a3, a2));
                    }
                    continue;
                }
#endif
                for (int64_t p = 0; p < 4; ++p)
                    bf16_row(srow[p], rows[p], w * c);
                for (int64_t j = 0; j < wo; ++j)
                    for (int64_t p = 0; p < 4; ++p)
                        std::memcpy(orow + j * c8 + p * c2,
                                    rows[p] + j * c2,
                                    sizeof(uint16_t) * c2);
            }
        }
    };
    if (nt <= 1) {
        work(0, total);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (total + nt - 1) / nt;
    for (unsigned ti = 0; ti < nt; ++ti) {
        int64_t lo = ti * chunk, hi = std::min<int64_t>(total, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

// Fused s2d + patch-grid extraction: write the stem kernel's input stack
// directly — (P*N, pd/2+1, ph/2, pw/2, 8C) bf16, P-major — so the device
// runs NO extraction at all.  The on-device stack build cost ~2.1 ms/volume
// in layout traffic (XLA assembled it plane-minor and copied it back for
// the Pallas operand; profiled copy.56 + DUS fusions + copy.64).
//
// Plane t of patch p (start i, j, k), mirroring pallas/stem.py::_slice_s2d:
//   even i: t == 0 -> physical zero plane (the conv's patch-local pad);
//           t >= 1 -> s2d plane u = i/2 + t - 1
//   odd i:  s2d plane u = (i-1)/2 + t
// where s2d plane u holds src z planes {2u, 2u+1} (zero past D), rows
// [j + 2r + py], cols from k — the same fused row conversion as s2d_bf16.
extern "C" void s2d_patches_bf16(const float* src, int64_t n, int64_t d,
                                 int64_t h, int64_t w, int64_t c,
                                 const int64_t* starts, int64_t p,
                                 int64_t pd, int64_t ph, int64_t pw,
                                 uint16_t* dst) {
    const int64_t ho = ph / 2, wo = pw / 2, c8 = 8 * c, c2 = 2 * c;
    const int64_t planes = pd / 2 + 1;
    const int64_t dst_plane = ho * wo * c8;
    const int64_t src_plane = h * w * c;
    const int64_t total = p * n * planes;
    unsigned nt = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                        (unsigned)total));
    auto work = [&](int64_t lo, int64_t hi) {
        std::vector<uint16_t> tmp(4 * pw * c, 0);
        std::vector<float> zrow(pw * c, 0.0f);
        uint16_t* rows[4] = {tmp.data(), tmp.data() + pw * c,
                             tmp.data() + 2 * pw * c,
                             tmp.data() + 3 * pw * c};
        for (int64_t job = lo; job < hi; ++job) {
            const int64_t pi = job / (n * planes);
            const int64_t ni = (job / planes) % n;
            const int64_t t = job % planes;
            const int64_t i0 = starts[pi * 3], j0 = starts[pi * 3 + 1],
                          k0 = starts[pi * 3 + 2];
            uint16_t* out = dst + job * dst_plane;
            int64_t u;
            if (i0 % 2 == 0) {
                if (t == 0) {  // the conv's patch-local zero pad plane
                    std::memset(out, 0, sizeof(uint16_t) * dst_plane);
                    continue;
                }
                u = i0 / 2 + t - 1;
            } else {
                u = (i0 - 1) / 2 + t;
            }
            for (int64_t i = 0; i < ho; ++i) {
                const float* srow[4];
                for (int64_t pz = 0; pz < 2; ++pz) {
                    const int64_t zi = 2 * u + pz;
                    for (int64_t py = 0; py < 2; ++py)
                        srow[pz * 2 + py] =
                            (zi >= d) ? zrow.data()
                                      : src + (ni * d + zi) * src_plane
                                            + (j0 + 2 * i + py) * (w * c)
                                            + k0 * c;
                }
                uint16_t* orow = out + i * (wo * c8);
#ifdef __AVX2__
                if (c2 == 8) {
                    for (int64_t j = 0; j < wo; ++j) {
                        __m128i a0 = bf16x8(srow[0] + j * 8);
                        __m128i a1 = bf16x8(srow[1] + j * 8);
                        __m128i a2 = bf16x8(srow[2] + j * 8);
                        __m128i a3 = bf16x8(srow[3] + j * 8);
                        _mm256_storeu_si256((__m256i*)(orow + j * 32),
                                            _mm256_set_m128i(a1, a0));
                        _mm256_storeu_si256((__m256i*)(orow + j * 32 + 16),
                                            _mm256_set_m128i(a3, a2));
                    }
                    continue;
                }
#endif
                for (int64_t q = 0; q < 4; ++q)
                    bf16_row(srow[q], rows[q], pw * c);
                for (int64_t j = 0; j < wo; ++j)
                    for (int64_t q = 0; q < 4; ++q)
                        std::memcpy(orow + j * c8 + q * c2,
                                    rows[q] + j * c2,
                                    sizeof(uint16_t) * c2);
            }
        }
    };
    if (nt <= 1) {
        work(0, total);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (total + nt - 1) / nt;
    for (unsigned ti = 0; ti < nt; ++ti) {
        int64_t lo = ti * chunk, hi = std::min<int64_t>(total, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}
