// Native host-side patch extraction: batched affine bilinear warp.
//
// TPU-native division of labor: the accelerator's gather units make
// image-space resampling latency-bound (~75 ms per 32-image batch on a
// v5e), while a host core does the same warp in ~1 ms per image. This
// library is the framework's "CPU worker" equivalent of the reference's
// cv2.warpAffine path (data/dataset.py:generate_patch_image): the input
// pipeline warps here, overlapped with device compute via prefetch, and
// the device runs only the cheap fused elementwise tail (color jitter +
// normalization). The pure-JAX on-device warp (ihpr_tpu/data/warp.py)
// remains for single-dispatch serving.
//
// Semantics match cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) with
// float (not 5-bit fixed-point) interpolation weights, and the optional
// pre-flip mirrors the source exactly like the reference's img[:, ::-1]
// before the warp.
//
// Build: ./build.sh  (g++ -O3 -march=native -fopenmp -shared -fPIC)
// ABI: plain C, consumed via ctypes (ihpr_tpu/data/native.py).

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

#if defined(IHPR_HAVE_JPEG)
#include <jpeglib.h>
#endif

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
  // Source coordinates advance linearly along an output row; flip folds
  // into the x stepping (sx' = (sw-1) - sx).
  const float step_x = flip ? -inv[0] : inv[0];
  const float step_y = inv[3];
  for (int y = 0; y < oh; ++y) {
    float sx = inv[1] * y + inv[2];
    if (flip) sx = (float)(sw - 1) - sx;
    float sy = inv[4] * y + inv[5];
    uint8_t* drow = dst + (size_t)y * ow * ch;
    for (int x = 0; x < ow; ++x, sx += step_x, sy += step_y) {
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
      const uint8_t* r0 = src + (size_t)y0 * sw * ch;
      const uint8_t* r1 = r0 + (size_t)sw * ch;
      if ((unsigned)x0 < (unsigned)(sw - 1) && (unsigned)y0 < (unsigned)(sh - 1)) {
        // interior fast path: whole 2x2 window in-bounds, channels unrolled
        const uint8_t* p00 = r0 + (size_t)x0 * ch;
        const uint8_t* p10 = r1 + (size_t)x0 * ch;
        if (ch == 3) {
          drow[x * 3 + 0] = (uint8_t)(w00 * p00[0] + w01 * p00[3] +
                                      w10 * p10[0] + w11 * p10[3] + 0.5f);
          drow[x * 3 + 1] = (uint8_t)(w00 * p00[1] + w01 * p00[4] +
                                      w10 * p10[1] + w11 * p10[4] + 0.5f);
          drow[x * 3 + 2] = (uint8_t)(w00 * p00[2] + w01 * p00[5] +
                                      w10 * p10[2] + w11 * p10[5] + 0.5f);
        } else {
          for (int k = 0; k < ch; ++k) {
            drow[x * ch + k] = (uint8_t)(w00 * p00[k] + w01 * p00[ch + k] +
                                         w10 * p10[k] + w11 * p10[ch + k] +
                                         0.5f);
          }
        }
      } else {
        const bool vx0 = (unsigned)x0 < (unsigned)sw;
        const bool vx1 = (unsigned)(x0 + 1) < (unsigned)sw;
        const bool vy0 = (unsigned)y0 < (unsigned)sh;
        const bool vy1 = (unsigned)(y0 + 1) < (unsigned)sh;
        for (int k = 0; k < ch; ++k) {
          float acc = 0.f;
          if (vy0 && vx0) acc += w00 * r0[x0 * ch + k];
          if (vy0 && vx1) acc += w01 * r0[(x0 + 1) * ch + k];
          if (vy1 && vx0) acc += w10 * r1[x0 * ch + k];
          if (vy1 && vx1) acc += w11 * r1[(x0 + 1) * ch + k];
          drow[x * ch + k] = (uint8_t)(acc + 0.5f);
        }
      }
    }
  }
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
// Decode an RGB JPEG into out (resized vector); returns 0 on failure.
int decode_jpeg_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>& out,
                    int* h, int* w) {
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
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out.resize((size_t)(*h) * (*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 1;
}
}  // namespace

// Fused JPEG decode + affine warp for a whole batch: the complete native
// replacement for the reference's cv2.imread + cv2.warpAffine worker loop.
// Each OpenMP task decodes one image into thread-local scratch and warps it
// straight into the output patch; the full-resolution image never crosses
// back into Python. ok[b] = 0 flags corrupt JPEGs (caller falls back).
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
      int h = 0, w = 0;
      if (decode_jpeg_rgb(jpegs[b], (size_t)lens[b], scratch, &h, &w)) {
        warp_affine_u8(scratch.data(), h, w, 3, invs + 6 * b, flips[b],
                       dst + (size_t)b * oh * ow * 3, oh, ow);
        ok[b] = 1;
      } else {
        memset(dst + (size_t)b * oh * ow * 3, 0, (size_t)oh * ow * 3);
        ok[b] = 0;
      }
    }
  }
}

int has_jpeg() { return 1; }
#else
int has_jpeg() { return 0; }
#endif

}  // extern "C"
