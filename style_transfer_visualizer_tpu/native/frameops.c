/* Native frame operations for the host-side media pipeline.
 *
 * The hot host-side loop during timelapse encoding is uint8 frame
 * blending (intro fades, crossfades): out = a*(1-alpha) + b*alpha with
 * round-to-nearest, over H*W*3 bytes per transition frame.  The numpy
 * expression allocates two float32 temporaries (8x the frame size) and
 * makes four passes over memory; this kernel is a single fused pass
 * using 16.16 fixed-point arithmetic, no temporaries, no float math.
 *
 * Built as a plain shared object (no Python.h needed) and loaded via
 * ctypes; see loader.py.
 */
#include <stddef.h>
#include <stdint.h>

/* out[i] = round(a[i]*(1-alpha) + b[i]*alpha), alpha in [0,1]. */
void blend_u8(const uint8_t *a, const uint8_t *b, uint8_t *out,
              size_t n, float alpha) {
    /* 16.16 fixed point; +0.5 rounding bias folded into the add.
     * Clamp alpha into [0,1] BEFORE the uint cast: converting a
     * negative float to an unsigned integer is undefined behavior. */
    if (!(alpha > 0.0f)) alpha = 0.0f;   /* also catches NaN */
    if (alpha > 1.0f) alpha = 1.0f;
    uint32_t wb = (uint32_t)(alpha * 65536.0f + 0.5f);
    if (wb > 65536u) wb = 65536u;
    uint32_t wa = 65536u - wb;
    for (size_t i = 0; i < n; ++i) {
        uint32_t v = (uint32_t)a[i] * wa + (uint32_t)b[i] * wb + 32768u;
        out[i] = (uint8_t)(v >> 16);
    }
}

/* Pack float32 [0,1] HWC pixels to uint8 with round-half-away clamp:
 * the save path for final frames when data arrives as float. */
void pack_f32_to_u8(const float *src, uint8_t *out, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = src[i] * 255.0f;
        /* Inverted comparison routes NaN into the zero branch; a NaN
         * reaching the float->uint8 cast would be undefined behavior. */
        if (!(v > 0.0f)) { out[i] = 0; continue; }
        if (v >= 255.0f) { out[i] = 255; continue; }
        out[i] = (uint8_t)(v + 0.5f);
    }
}
