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
// Space-to-depth serving transform (the host side of the fused s2d stem,
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

static inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    x += 0x7FFFu + ((x >> 16) & 1u);  // RTNE
    return (uint16_t)(x >> 16);
}

extern "C" void s2d_bf16(const float* src, int64_t n, int64_t d, int64_t h,
                         int64_t w, int64_t c, uint16_t* dst,
                         int64_t out_planes) {
    const int64_t ho = h / 2, wo = w / 2, c8 = 8 * c;
    const int64_t dst_plane = ho * wo * c8;
    const int64_t src_plane = h * w * c;
    int64_t total = n * out_planes;
    unsigned nt = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                        (unsigned)total));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t job = lo; job < hi; ++job) {
            const int64_t ni = job / out_planes, t = job % out_planes;
            uint16_t* out = dst + job * dst_plane;
            for (int64_t pz = 0; pz < 2; ++pz) {
                const int64_t zi = 2 * t + pz;
                if (zi >= d) {
                    // zero-fill this phase's channel block across the plane
                    for (int64_t ij = 0; ij < ho * wo; ++ij)
                        std::memset(out + ij * c8 + pz * 4 * c, 0,
                                    sizeof(uint16_t) * 4 * c);
                    continue;
                }
                const float* sp = src + (ni * d + zi) * src_plane;
                for (int64_t i = 0; i < ho; ++i) {
                    for (int64_t py = 0; py < 2; ++py) {
                        const float* row = sp + (2 * i + py) * (w * c);
                        uint16_t* orow = out + i * (wo * c8)
                                       + (pz * 2 + py) * 2 * c;
                        for (int64_t j = 0; j < wo; ++j) {
                            const float* s0 = row + 2 * j * c;
                            uint16_t* o0 = orow + j * c8;
                            for (int64_t px = 0; px < 2; ++px)
                                for (int64_t cc = 0; cc < c; ++cc)
                                    o0[px * c + cc] =
                                        f32_to_bf16(s0[px * c + cc]);
                        }
                    }
                }
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
