// Native host-side patch extraction: batched affine bilinear warp.
//
// TPU-native division of labor: the accelerator's gather units make
// image-space resampling latency-bound (~75 ms per 32-image batch on a
// v5e), while a host core does the same warp in well under 1 ms per
// image. This library is the framework's "CPU worker" equivalent of the
// reference's cv2.warpAffine path (data/dataset.py:generate_patch_image):
// the input pipeline warps here, overlapped with device compute via
// prefetch, and the device runs only the cheap fused elementwise tail
// (color jitter + normalization). The pure-JAX on-device warp
// (ihpr_tpu/data/warp.py) remains for single-dispatch serving.
//
// Semantics match cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) with
// float (not 5-bit fixed-point) interpolation weights, and the optional
// pre-flip mirrors the source exactly like the reference's img[:, ::-1]
// before the warp.
//
// Performance structure (measured on this host, 640px sources -> 256^2):
//   - Border checks are hoisted out of the pixel loop: each output row's
//     fully-interior x-interval is computed once (the source point moves
//     linearly along an output row), so the hot loop has no branches.
//   - The interior RGB path is AVX2: 8 output pixels per iteration, the
//     2x2 neighborhoods fetched with 4 dword gathers and blended with
//     the same fp32 weight expressions as the scalar path (agreement is
//     within one uint8 step, from fp contraction differences only).
//   - The fused JPEG path decodes ONLY the source-row window the warp
//     can sample (jpeg_skip_scanlines for the top, early abort for the
//     bottom) — bit-exact for the sampled rows (an 8-row margin keeps
//     fancy-upsampling context away from the skip boundary); rows the
//     warp never touches were pure waste.
//
// Build: ./build.sh  (g++ -O3 -march=native -fopenmp -shared -fPIC)
// ABI: plain C, consumed via ctypes (ihpr_tpu/data/native.py).

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

#if defined(__AVX2__)
#include <immintrin.h>
#endif

#if defined(IHPR_HAVE_JPEG)
#include <jpeglib.h>
// jpeg_skip_scanlines / jpeg_crop_scanline are libjpeg-turbo (>= 1.5)
// extensions; classic IJG libjpeg builds fall back to decode-and-discard
// (still correct, just no ROI speedup) so the library keeps building —
// and the AVX2 warp path keeps working — on non-turbo hosts.
// -DIHPR_FORCE_NO_JPEG_ROI exercises the IJG fallback on turbo hosts
// (tests/test_native.py compiles a probe .so with it).
#if defined(IHPR_FORCE_NO_JPEG_ROI)
#define IHPR_JPEG_ROI 0
#elif defined(LIBJPEG_TURBO_VERSION_NUMBER) && LIBJPEG_TURBO_VERSION_NUMBER >= 1005000
#define IHPR_JPEG_ROI 1
#else
#define IHPR_JPEG_ROI 0
#endif
#endif

namespace {

// Decoded source window: src holds rows [y_off, y_off+*) and columns
// [x_off, x_off + stride) of the full (sh, sw) image (y_off=x_off=0,
// stride=sw for a whole image). The caller guarantees every pixel the
// mapping can SAMPLE lies inside the window; border logic still tests
// against the full (sh, sw).
struct SrcWin {
  const uint8_t* src;
  int y_off, x_off, stride;
};

// One output pixel with full border handling (BORDER_CONSTANT=0).
inline void sample_border(const SrcWin& w, int sh, int sw, int ch,
                          float sx, float sy, uint8_t* out) {
  const float fx0 = std::floor(sx);
  const float fy0 = std::floor(sy);
  const int x0 = (int)fx0;
  const int y0 = (int)fy0;
  const float ax = sx - fx0;
  const float ay = sy - fy0;
  const float w00 = (1 - ax) * (1 - ay);
  const float w01 = ax * (1 - ay);
  const float w10 = (1 - ax) * ay;
  const float w11 = ax * ay;
  const bool vx0 = (unsigned)x0 < (unsigned)sw;
  const bool vx1 = (unsigned)(x0 + 1) < (unsigned)sw;
  const bool vy0 = (unsigned)y0 < (unsigned)sh;
  const bool vy1 = (unsigned)(y0 + 1) < (unsigned)sh;
  const int xw = x0 - w.x_off;
  const uint8_t* r0 = w.src + (size_t)(y0 - w.y_off) * w.stride * ch;
  const uint8_t* r1 = r0 + (size_t)w.stride * ch;
  for (int k = 0; k < ch; ++k) {
    float acc = 0.f;
    if (vy0 && vx0) acc += w00 * r0[xw * ch + k];
    if (vy0 && vx1) acc += w01 * r0[(xw + 1) * ch + k];
    if (vy1 && vx0) acc += w10 * r1[xw * ch + k];
    if (vy1 && vx1) acc += w11 * r1[(xw + 1) * ch + k];
    out[k] = (uint8_t)(acc + 0.5f);
  }
}

// One interior output pixel (2x2 window known in-bounds), any ch.
inline void sample_interior(const SrcWin& w, int ch, float sx, float sy,
                            uint8_t* out) {
  const float fx0 = std::floor(sx);
  const float fy0 = std::floor(sy);
  const int x0 = (int)fx0;
  const int y0 = (int)fy0;
  const float ax = sx - fx0;
  const float ay = sy - fy0;
  const float w00 = (1 - ax) * (1 - ay);
  const float w01 = ax * (1 - ay);
  const float w10 = (1 - ax) * ay;
  const float w11 = ax * ay;
  const uint8_t* p00 =
      w.src + ((size_t)(y0 - w.y_off) * w.stride + (x0 - w.x_off)) * ch;
  const uint8_t* p10 = p00 + (size_t)w.stride * ch;
  for (int k = 0; k < ch; ++k) {
    out[k] = (uint8_t)(w00 * p00[k] + w01 * p00[ch + k] + w10 * p10[k] +
                       w11 * p10[ch + k] + 0.5f);
  }
}

inline bool is_interior(float sx, float sy, int sh, int sw) {
  // x0=floor(sx) in [0, sw-2] and y0 in [0, sh-2]: whole 2x2 in-bounds.
  return sx >= 0.f && sx < (float)(sw - 1) && sy >= 0.f &&
         sy < (float)(sh - 1);
}

#if defined(__AVX2__)
// 8 interior RGB output pixels per iteration. Weights/accumulation use
// the same fp32 expressions as sample_interior; the only tolerated
// divergence is fp contraction order (<= 1 uint8 step on rounding ties).
inline void warp_row_rgb_avx2(const SrcWin& win, float sx0, float sy0,
                              float step_x, float step_y, uint8_t* drow,
                              int xa, int xb) {
  const uint8_t* src = win.src;
  const int stride = win.stride * 3;
  const __m256 lane = _mm256_setr_ps(0, 1, 2, 3, 4, 5, 6, 7);
  const __m256 vstepx = _mm256_set1_ps(step_x);
  const __m256 vstepy = _mm256_set1_ps(step_y);
  const __m256 one = _mm256_set1_ps(1.0f);
  const __m256 half = _mm256_set1_ps(0.5f);
  const __m256i bytemask = _mm256_set1_epi32(0xFF);
  const __m256i vstride = _mm256_set1_epi32(stride);
  const __m256i three = _mm256_set1_epi32(3);
  alignas(32) int32_t tmp[3][8];
  int x = xa;
  for (; x + 8 <= xb; x += 8) {
    const __m256 xi = _mm256_add_ps(_mm256_set1_ps((float)x), lane);
    const __m256 sx =
        _mm256_add_ps(_mm256_set1_ps(sx0), _mm256_mul_ps(vstepx, xi));
    const __m256 sy =
        _mm256_add_ps(_mm256_set1_ps(sy0), _mm256_mul_ps(vstepy, xi));
    const __m256 fx0 = _mm256_floor_ps(sx);
    const __m256 fy0 = _mm256_floor_ps(sy);
    const __m256 ax = _mm256_sub_ps(sx, fx0);
    const __m256 ay = _mm256_sub_ps(sy, fy0);
    const __m256 bx = _mm256_sub_ps(one, ax);
    const __m256 by = _mm256_sub_ps(one, ay);
    const __m256 w00 = _mm256_mul_ps(bx, by);
    const __m256 w01 = _mm256_mul_ps(ax, by);
    const __m256 w10 = _mm256_mul_ps(bx, ay);
    const __m256 w11 = _mm256_mul_ps(ax, ay);
    const __m256i x0 = _mm256_sub_epi32(_mm256_cvttps_epi32(fx0),
                                        _mm256_set1_epi32(win.x_off));
    const __m256i y0 = _mm256_sub_epi32(_mm256_cvttps_epi32(fy0),
                                        _mm256_set1_epi32(win.y_off));
    // byte offset of p00; p01 = +3, row1 = +stride
    const __m256i off0 = _mm256_add_epi32(_mm256_mullo_epi32(y0, vstride),
                                          _mm256_mullo_epi32(x0, three));
    const __m256i off1 = _mm256_add_epi32(off0, vstride);
    // g*a bytes: [r0 g0 b0 r1]; g*b bytes at +2: [b0 r1 g1 b1]
    const int* base = reinterpret_cast<const int*>(src);
    const __m256i g0a = _mm256_i32gather_epi32(base, off0, 1);
    const __m256i g0b = _mm256_i32gather_epi32(
        base, _mm256_add_epi32(off0, _mm256_set1_epi32(2)), 1);
    const __m256i g1a = _mm256_i32gather_epi32(base, off1, 1);
    const __m256i g1b = _mm256_i32gather_epi32(
        base, _mm256_add_epi32(off1, _mm256_set1_epi32(2)), 1);
#define U8F(v, shift) \
  _mm256_cvtepi32_ps(_mm256_and_si256(_mm256_srli_epi32(v, shift), bytemask))
    for (int k = 0; k < 3; ++k) {
      __m256 p00, p01, p10, p11;
      if (k == 0) {
        p00 = U8F(g0a, 0);  p01 = U8F(g0a, 24);
        p10 = U8F(g1a, 0);  p11 = U8F(g1a, 24);
      } else if (k == 1) {
        p00 = U8F(g0a, 8);  p01 = U8F(g0b, 16);
        p10 = U8F(g1a, 8);  p11 = U8F(g1b, 16);
      } else {
        p00 = U8F(g0a, 16); p01 = U8F(g0b, 24);
        p10 = U8F(g1a, 16); p11 = U8F(g1b, 24);
      }
      __m256 acc = _mm256_mul_ps(w00, p00);
      acc = _mm256_fmadd_ps(w01, p01, acc);
      acc = _mm256_fmadd_ps(w10, p10, acc);
      acc = _mm256_fmadd_ps(w11, p11, acc);
      _mm256_store_si256(
          reinterpret_cast<__m256i*>(tmp[k]),
          _mm256_cvttps_epi32(_mm256_add_ps(acc, half)));
    }
#undef U8F
    uint8_t* d = drow + (size_t)x * 3;
    for (int k = 0; k < 8; ++k) {
      d[3 * k + 0] = (uint8_t)tmp[0][k];
      d[3 * k + 1] = (uint8_t)tmp[1][k];
      d[3 * k + 2] = (uint8_t)tmp[2][k];
    }
  }
  for (; x < xb; ++x) {
    sample_interior(win, 3, sx0 + step_x * x, sy0 + step_y * x,
                    drow + (size_t)x * 3);
  }
}
#endif  // __AVX2__

// Warp into dst from a SrcWin of an (sh, sw, ch) image (see SrcWin).
void warp_window_u8(const SrcWin& win, int sh, int sw, int ch,
                    const float* inv, int flip, uint8_t* dst, int oh,
                    int ow) {
  const float step_x = flip ? -inv[0] : inv[0];
  const float step_y = inv[3];
  for (int y = 0; y < oh; ++y) {
    float sx0 = inv[1] * y + inv[2];
    if (flip) sx0 = (float)(sw - 1) - sx0;
    const float sy0 = inv[4] * y + inv[5];
    uint8_t* drow = dst + (size_t)y * ow * ch;

    // Interior x-interval [xa, xb): both linear source coordinates stay
    // inside the 2x2-safe box. Solved in double, then verified with the
    // exact float predicate (shrink on any edge disagreement).
    double lo = 0.0, hi = (double)ow;
    const double sx0d = sx0, syd = sy0, dxd = step_x, dyd = step_y;
    auto clip = [&](double f0, double df, double vmax) {
      // constraint: 0 <= f0 + df*x < vmax
      if (df > 1e-12 || df < -1e-12) {
        const double a = (0.0 - f0) / df;
        const double b = (vmax - f0) / df;
        lo = std::max(lo, std::ceil(std::min(a, b)));
        hi = std::min(hi, std::floor(std::max(a, b)));
      } else if (f0 < 0.0 || f0 >= vmax) {
        lo = 1.0;
        hi = 0.0;
      }
    };
    clip(sx0d, dxd, (double)(sw - 1));
    clip(syd, dyd, (double)(sh - 1));
    int xa = (int)std::max(0.0, std::min((double)ow, lo));
    int xb = (int)std::max(0.0, std::min((double)ow, hi + 1.0));
    while (xa < xb &&
           !is_interior(sx0 + step_x * xa, sy0 + step_y * xa, sh, sw))
      ++xa;
    while (xb > xa && !is_interior(sx0 + step_x * (xb - 1),
                                   sy0 + step_y * (xb - 1), sh, sw))
      --xb;

    for (int x = 0; x < xa; ++x)
      sample_border(win, sh, sw, ch, sx0 + step_x * x, sy0 + step_y * x,
                    drow + (size_t)x * ch);
#if defined(__AVX2__)
    if (ch == 3) {
      warp_row_rgb_avx2(win, sx0, sy0, step_x, step_y, drow, xa, xb);
    } else
#endif
    {
      for (int x = xa; x < xb; ++x)
        sample_interior(win, ch, sx0 + step_x * x, sy0 + step_y * x,
                        drow + (size_t)x * ch);
    }
    for (int x = xb; x < ow; ++x)
      sample_border(win, sh, sw, ch, sx0 + step_x * x, sy0 + step_y * x,
                    drow + (size_t)x * ch);
  }
}

}  // namespace

extern "C" {

// Invert a 2x3 affine (dst = M src + t form -> src = Mi dst + ti).
void invert_affine(const float* m, float* out) {
  const float a = m[0], b = m[1], tx = m[2];
  const float c = m[3], d = m[4], ty = m[5];
  const float det = a * d - b * c;
  const float id = 1.0f / det;
  out[0] = d * id;
  out[1] = -b * id;
  out[3] = -c * id;
  out[4] = a * id;
  out[2] = -(out[0] * tx + out[1] * ty);
  out[5] = -(out[3] * tx + out[4] * ty);
}

// Warp ONE uint8 HWC image into a uint8 patch.
//   src: (sh, sw, ch) row-major; dst: (oh, ow, ch)
//   inv: 2x3 dst->src affine (row-major [a, b, tx, c, d, ty])
//   flip: mirror source x before sampling (reference flip-aug semantics)
void warp_affine_u8(const uint8_t* src, int sh, int sw, int ch,
                    const float* inv, int flip, uint8_t* dst, int oh,
                    int ow) {
  warp_window_u8(SrcWin{src, 0, 0, sw}, sh, sw, ch, inv, flip, dst, oh, ow);
}

// Batched warp over images of VARYING sizes (pointers + per-image dims),
// parallelized across the batch with OpenMP.
//   srcs:  array of B pointers to (sh_i, sw_i, ch) images
//   dims:  (B, 2) int32 [sh_i, sw_i]
//   invs:  (B, 6) float  dst->src affines
//   flips: (B,) int32
//   dst:   (B, oh, ow, ch) uint8 output
void warp_batch_u8(const uint8_t* const* srcs, const int32_t* dims, int ch,
                   const float* invs, const int32_t* flips, uint8_t* dst,
                   int batch, int oh, int ow) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < batch; ++b) {
    warp_affine_u8(srcs[b], dims[2 * b], dims[2 * b + 1], ch,
                   invs + 6 * b, flips[b], dst + (size_t)b * oh * ow * ch,
                   oh, ow);
  }
}

int omp_max_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

#if defined(IHPR_HAVE_JPEG)
namespace {
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};
void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

// Decode only the sampled window of an RGB JPEG into out. The caller
// passes the warp's wanted row range [wy0, wy1] and column range
// [wx0, wx1] (inclusive, unclamped; whole image when wy1 < 0), plus
// flip: flipped mappings sample the x-mirror of the column range. Rows
// above the window are skipped without IDCT/upsampling
// (jpeg_skip_scanlines), columns outside it are dropped per-iMCU
// (jpeg_crop_scanline), and decoding aborts right after the last wanted
// row — the reference decodes full frames only to have most pixels never
// sampled by the crop warp. An 8-pixel margin keeps the wanted pixels
// bit-exact against fancy-upsampling context at the window edges.
// On success fills the window geometry (win->src remains unset) and
// returns 1; 0 on failure.
int decode_jpeg_rgb_window(const uint8_t* data, size_t len,
                           std::vector<uint8_t>& out, int* h, int* w,
                           int wy0, int wy1, int wx0, int wx1, int flip,
                           int* y_off, int* x_off, int* stride,
                           int* nrows) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = (int)cinfo.output_height;
  *w = (int)cinfo.output_width;
  int r0 = 0, r1 = *h - 1;
  *x_off = 0;
  *stride = *w;
  if (wy1 >= 0) {
    r0 = std::max(0, std::min(wy0, *h - 1));
    r1 = std::max(r0, std::min(wy1, *h - 1));
    if (flip) {
      // sampled sx = (sw-1) - computed sx: mirror the column range
      const int m0 = *w - 1 - wx1, m1 = *w - 1 - wx0;
      wx0 = m0;
      wx1 = m1;
    }
    int c0 = std::max(0, std::min(wx0 - 8, *w - 1));
    int c1 = std::max(c0, std::min(wx1 + 8, *w - 1));
#if IHPR_JPEG_ROI
    JDIMENSION xoff = (JDIMENSION)c0;
    JDIMENSION xw = (JDIMENSION)(c1 - c0 + 1);
    if ((int)xw < *w) {
      jpeg_crop_scanline(&cinfo, &xoff, &xw);  // widens to iMCU bounds
      *x_off = (int)xoff;
      *stride = (int)cinfo.output_width;
    }
#else
    (void)c0;
    (void)c1;
#endif
  }
  int skipped = 0;
  const int skip_target = std::max(0, r0 - 8);
#if IHPR_JPEG_ROI
  if (skip_target > 0)
    skipped = (int)jpeg_skip_scanlines(&cinfo, (JDIMENSION)skip_target);
#else
  if (skip_target > 0) {
    // IJG fallback: decode-and-discard the rows above the window.
    std::vector<uint8_t> junk((size_t)(*stride) * 3);
    while ((int)cinfo.output_scanline < skip_target) {
      JSAMPROW row = junk.data();
      if (jpeg_read_scanlines(&cinfo, &row, 1) != 1) break;
    }
    skipped = (int)cinfo.output_scanline;
  }
#endif
  out.resize((size_t)(r1 + 1 - skipped) * (*stride) * 3);
  while ((int)cinfo.output_scanline <= r1) {
    JSAMPROW row =
        out.data() +
        (size_t)((int)cinfo.output_scanline - skipped) * (*stride) * 3;
    if (jpeg_read_scanlines(&cinfo, &row, 1) != 1) break;
  }
  *y_off = skipped;
  *nrows = (int)cinfo.output_scanline - skipped;
  if (cinfo.output_scanline < cinfo.output_height) {
    jpeg_abort_decompress(&cinfo);
  } else {
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  return *nrows > 0;
}
}  // namespace

// Fused JPEG decode + affine warp for a whole batch: the complete native
// replacement for the reference's cv2.imread + cv2.warpAffine worker loop.
// Each OpenMP task decodes one image's sampled-row window into
// thread-local scratch and warps it straight into the output patch; the
// full-resolution image never crosses back into Python, and rows outside
// the warp's source window are never even inverse-DCTed.
// ok[b] = 0 flags corrupt JPEGs (caller falls back).
void decode_and_warp_batch(const uint8_t* const* jpegs, const int64_t* lens,
                           const float* invs, const int32_t* flips,
                           uint8_t* dst, int32_t* ok, int batch, int oh,
                           int ow) {
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    std::vector<uint8_t> scratch;
#if defined(_OPENMP)
#pragma omp for schedule(dynamic)
#endif
    for (int b = 0; b < batch; ++b) {
      // Wanted source ranges need (h, w) only for clamping/mirroring,
      // which the decoder applies itself — compute the unclamped
      // pre-mirror extremes over the output-rectangle corners up front.
      const float* inv = invs + 6 * b;
      float ymn = 1e30f, ymx = -1e30f, xmn = 1e30f, xmx = -1e30f;
      for (int cy = 0; cy < 2; ++cy)
        for (int cx = 0; cx < 2; ++cx) {
          const float fx = (float)(cx ? ow - 1 : 0);
          const float fy = (float)(cy ? oh - 1 : 0);
          const float sy = inv[3] * fx + inv[4] * fy + inv[5];
          const float sx = inv[0] * fx + inv[1] * fy + inv[2];
          ymn = std::min(ymn, sy);
          ymx = std::max(ymx, sy);
          xmn = std::min(xmn, sx);
          xmx = std::max(xmx, sx);
        }
      const int wy0 = (int)std::floor(ymn) - 2;
      const int wy1 = (int)std::floor(ymx) + 3;
      const int wx0 = (int)std::floor(xmn) - 2;
      const int wx1 = (int)std::floor(xmx) + 3;
      int h = 0, w = 0, y_off = 0, x_off = 0, stride = 0, nrows = 0;
      uint8_t* d = dst + (size_t)b * oh * ow * 3;
      if (wy1 < 0 ||
          !decode_jpeg_rgb_window(jpegs[b], (size_t)lens[b], scratch, &h,
                                  &w, wy0, wy1, wx0, wx1, flips[b], &y_off,
                                  &x_off, &stride, &nrows)) {
        // fully out-of-frame mapping (all-border patch) or corrupt file
        memset(d, 0, (size_t)oh * ow * 3);
        ok[b] = wy1 < 0 ? 1 : 0;
        continue;
      }
      warp_window_u8(SrcWin{scratch.data(), y_off, x_off, stride}, h, w, 3,
                     inv, flips[b], d, oh, ow);
      ok[b] = 1;
    }
  }
}

int has_jpeg() { return 1; }
#else
int has_jpeg() { return 0; }
#endif

}  // extern "C"
