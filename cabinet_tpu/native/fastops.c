/* fastops: native host-pipeline kernels for cabinet_tpu.
 *
 * The TPU compute path is jax/XLA/Pallas; these C kernels cover the HOST
 * side of the pipeline where numpy's generality costs real wall time on
 * 4K aerial frames (SURVEY §3.3: CPU-side preprocessing is the known
 * bottleneck class; NOTES: the f32->bf16 host cast sits on the eval
 * transfer path for ~100 MB images):
 *
 *   - fused uint8 -> normalized float32 (one pass, no numpy temporaries),
 *   - float32 -> bfloat16 with round-to-nearest-even (matches ml_dtypes),
 *   - fused uint8 -> normalized bfloat16 (eval transfer fast path),
 *   - RGB -> class-ID remap through a (256,256,256) LUT (converter hot loop,
 *     reference convert_uavid_to_yolo.py:161-191 semantics).
 *
 * Arithmetic is kept EXACTLY numpy-equivalent (same op order, f32 division,
 * RNE rounding) so the numpy fallbacks in native/__init__.py are bit-equal —
 * guarded by tests/unit/test_native.py.
 *
 * Plain C + ctypes (no Python.h): built on first import by native/__init__.py
 * with whatever cc the image provides; OpenMP if available.
 */

#include <stdint.h>

#ifdef _OPENMP
#include <omp.h>
#endif

void normalize_u8_f32(const uint8_t *src, float *dst, long n_pix,
                      const float *mean, const float *std) {
    const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const float s0 = std[0], s1 = std[1], s2 = std[2];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long i = 0; i < n_pix; ++i) {
        const uint8_t *p = src + 3 * i;
        float *q = dst + 3 * i;
        /* match numpy: (x_f32 / 255.0f - mean) / std, true divisions */
        q[0] = ((float)p[0] / 255.0f - m0) / s0;
        q[1] = ((float)p[1] / 255.0f - m1) / s1;
        q[2] = ((float)p[2] / 255.0f - m2) / s2;
    }
}

static inline uint16_t bf16_rne(float f) {
    union { float f; uint32_t u; } v;
    v.f = f;
    if ((v.u & 0x7fffffffu) > 0x7f800000u) {  /* NaN: quiet, like ml_dtypes */
        return (uint16_t)((v.u >> 16) | 0x0040u);
    }
    uint32_t rounding_bias = 0x7fffu + ((v.u >> 16) & 1u);
    return (uint16_t)((v.u + rounding_bias) >> 16);
}

void f32_to_bf16(const float *src, uint16_t *dst, long n) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long i = 0; i < n; ++i) {
        dst[i] = bf16_rne(src[i]);
    }
}

void normalize_u8_bf16(const uint8_t *src, uint16_t *dst, long n_pix,
                       const float *mean, const float *std) {
    const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const float s0 = std[0], s1 = std[1], s2 = std[2];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long i = 0; i < n_pix; ++i) {
        const uint8_t *p = src + 3 * i;
        uint16_t *q = dst + 3 * i;
        q[0] = bf16_rne(((float)p[0] / 255.0f - m0) / s0);
        q[1] = bf16_rne(((float)p[1] / 255.0f - m1) / s1);
        q[2] = bf16_rne(((float)p[2] / 255.0f - m2) / s2);
    }
}

void lut_remap_rgb(const uint8_t *rgb, const uint8_t *lut, uint8_t *out,
                   long n_pix) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long i = 0; i < n_pix; ++i) {
        const uint8_t *p = rgb + 3 * i;
        out[i] = lut[((long)p[0] << 16) | ((long)p[1] << 8) | (long)p[2]];
    }
}
