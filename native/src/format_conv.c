/*
 * Native sample-format conversion kernels.
 *
 * TPU-native equivalent of the reference's per-sample Lua conversion loops
 * (/root/reference/radio/utilities/format_utils.lua:82-111 and the
 * IQFileSource hot conversion loop, iqfile.lua:100-112): the host-side
 * wire-format <-> float32 conversions that feed the device pipeline.
 * Plain C with auto-vectorizable loops (-O3); reached from Python via
 * ctypes (luaradio_tpu/utils/native.py), with a numpy fallback when this
 * library is not built.
 *
 * All functions convert `n` scalar samples.  Interleaved I/Q streams are
 * just 2n scalars.  float = (raw - offset) / scale ; raw = float * scale +
 * offset (clamped to the integer range).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define API __attribute__((visibility("default")))

static inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
static inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
static inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

/* ---------------- raw -> float32 ---------------- */

/* conversion in double: 32-bit integer formats exceed float32 mantissa */
#define DEF_TO_F32(NAME, TYPE, LOADEXPR)                                   \
    API void NAME(const void *src, float *dst, size_t n, double offset,    \
                  double inv_scale) {                                      \
        const TYPE *s = (const TYPE *)src;                                 \
        double off = offset, inv = inv_scale;                              \
        for (size_t i = 0; i < n; i++) {                                   \
            dst[i] = (float)(((double)(LOADEXPR) - off) * inv);            \
        }                                                                  \
    }

DEF_TO_F32(lrtpu_u8_to_f32, uint8_t, s[i])
DEF_TO_F32(lrtpu_s8_to_f32, int8_t, s[i])
DEF_TO_F32(lrtpu_u16_to_f32, uint16_t, s[i])
DEF_TO_F32(lrtpu_s16_to_f32, int16_t, s[i])
DEF_TO_F32(lrtpu_u16s_to_f32, uint16_t, bswap16(s[i]))
DEF_TO_F32(lrtpu_s16s_to_f32, uint16_t, (int16_t)bswap16(s[i]))
DEF_TO_F32(lrtpu_u32_to_f32, uint32_t, s[i])
DEF_TO_F32(lrtpu_s32_to_f32, int32_t, s[i])
DEF_TO_F32(lrtpu_u32s_to_f32, uint32_t, bswap32(s[i]))
DEF_TO_F32(lrtpu_s32s_to_f32, uint32_t, (int32_t)bswap32(s[i]))

API void lrtpu_f32_copy(const void *src, float *dst, size_t n, double offset,
                        double inv_scale) {
    (void)offset; (void)inv_scale;
    memcpy(dst, src, n * sizeof(float));
}

API void lrtpu_f32s_to_f32(const void *src, float *dst, size_t n,
                           double offset, double inv_scale) {
    (void)offset; (void)inv_scale;
    const uint32_t *s = (const uint32_t *)src;
    for (size_t i = 0; i < n; i++) {
        uint32_t v = bswap32(s[i]);
        memcpy(&dst[i], &v, 4);
    }
}

API void lrtpu_f64_to_f32(const void *src, float *dst, size_t n,
                          double offset, double inv_scale) {
    (void)offset; (void)inv_scale;
    const double *s = (const double *)src;
    for (size_t i = 0; i < n; i++) dst[i] = (float)s[i];
}

API void lrtpu_f64s_to_f32(const void *src, float *dst, size_t n,
                           double offset, double inv_scale) {
    (void)offset; (void)inv_scale;
    const uint64_t *s = (const uint64_t *)src;
    for (size_t i = 0; i < n; i++) {
        uint64_t v = bswap64(s[i]);
        double d;
        memcpy(&d, &v, 8);
        dst[i] = (float)d;
    }
}

/* ---------------- float32 -> raw ---------------- */

static inline double clampd(double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

#define DEF_FROM_F32(NAME, TYPE, LO, HI, STOREEXPR)                        \
    API void NAME(const float *src, void *dst, size_t n, double offset,    \
                  double scale) {                                          \
        TYPE *d = (TYPE *)dst;                                             \
        double off = offset, sc = scale;                                   \
        for (size_t i = 0; i < n; i++) {                                   \
            double v = clampd((double)src[i] * sc + off, (double)(LO),     \
                              (double)(HI));                               \
            TYPE r = (TYPE)__builtin_rint(v);                              \
            d[i] = STOREEXPR;                                              \
        }                                                                  \
    }

/* 8/16-bit formats fit float32 precision: int32 round then narrow, which
 * the vectorizer handles well */
static inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

#define DEF_FROM_F32_NARROW(NAME, TYPE, LO, HI, STOREEXPR)                 \
    API void NAME(const float *src, void *dst, size_t n, double offset,    \
                  double scale) {                                          \
        TYPE *d = (TYPE *)dst;                                             \
        float off = (float)offset, sc = (float)scale;                      \
        for (size_t i = 0; i < n; i++) {                                   \
            float v = clampf(src[i] * sc + off, (float)(LO), (float)(HI)); \
            int32_t r32 = (int32_t)__builtin_rintf(v);                     \
            TYPE r = (TYPE)r32;                                            \
            d[i] = STOREEXPR;                                              \
        }                                                                  \
    }

DEF_FROM_F32_NARROW(lrtpu_f32_to_u8, uint8_t, 0, 255, r)
DEF_FROM_F32_NARROW(lrtpu_f32_to_s8, int8_t, -128, 127, r)
DEF_FROM_F32_NARROW(lrtpu_f32_to_u16, uint16_t, 0, 65535, r)
DEF_FROM_F32_NARROW(lrtpu_f32_to_s16, int16_t, -32768, 32767, r)
DEF_FROM_F32_NARROW(lrtpu_f32_to_u16s, uint16_t, 0, 65535, bswap16(r))
DEF_FROM_F32_NARROW(lrtpu_f32_to_s16s, int16_t, -32768, 32767,
             (int16_t)bswap16((uint16_t)r))
DEF_FROM_F32(lrtpu_f32_to_u32, uint32_t, 0, 4294967295.0, r)
DEF_FROM_F32(lrtpu_f32_to_s32, int32_t, -2147483648.0, 2147483647.0, r)
DEF_FROM_F32(lrtpu_f32_to_u32s, uint32_t, 0, 4294967295.0, bswap32(r))
DEF_FROM_F32(lrtpu_f32_to_s32s, int32_t, -2147483648.0, 2147483647.0,
             (int32_t)bswap32((uint32_t)r))

API void lrtpu_f32_to_f32(const float *src, void *dst, size_t n,
                          double offset, double scale) {
    (void)offset; (void)scale;
    memcpy(dst, src, n * sizeof(float));
}

API void lrtpu_f32_to_f32s(const float *src, void *dst, size_t n,
                           double offset, double scale) {
    (void)offset; (void)scale;
    uint32_t *d = (uint32_t *)dst;
    for (size_t i = 0; i < n; i++) {
        uint32_t v;
        memcpy(&v, &src[i], 4);
        d[i] = bswap32(v);
    }
}

API void lrtpu_f32_to_f64(const float *src, void *dst, size_t n,
                          double offset, double scale) {
    (void)offset; (void)scale;
    double *d = (double *)dst;
    for (size_t i = 0; i < n; i++) d[i] = (double)src[i];
}

API void lrtpu_f32_to_f64s(const float *src, void *dst, size_t n,
                           double offset, double scale) {
    (void)offset; (void)scale;
    uint64_t *d = (uint64_t *)dst;
    for (size_t i = 0; i < n; i++) {
        double v = (double)src[i];
        uint64_t u;
        memcpy(&u, &v, 8);
        d[i] = bswap64(u);
    }
}

/* -------- interleaved I/Q deinterleave / interleave (complex path) ------ */

API void lrtpu_deinterleave_f32(const float *src, float *re, float *im,
                                size_t n) {
    for (size_t i = 0; i < n; i++) {
        re[i] = src[2 * i];
        im[i] = src[2 * i + 1];
    }
}

API void lrtpu_interleave_f32(const float *re, const float *im, float *dst,
                              size_t n) {
    for (size_t i = 0; i < n; i++) {
        dst[2 * i] = re[i];
        dst[2 * i + 1] = im[i];
    }
}
