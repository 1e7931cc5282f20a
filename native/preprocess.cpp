// Native host-side image preprocessing for the TPU serving pipeline.
//
// The reference delegates its host image work to OpenCV's C++ kernels
// (cv2.resize/copyMakeBorder, reference utils/datasets.py:818-848); this
// library plays the same role for the ops OpenCV doesn't provide fused:
//
//   * bgr2rgb_s2d_u8 : BGR->RGB flip + 2x2 space-to-depth in one pass
//                      (feeds the engine's 12-channel stem; phase order
//                      [ee, oe, eo, oo] matching torch Focus)
//   * s2d_u8         : space-to-depth only (RGB input)
//   * letterbox_fill : padded-canvas fill + centered blit (uint8)
//   * normalize_f32  : uint8 -> float32/255 (seg loader path)
//
// Single translation unit, OpenMP parallel over rows, no dependencies.
// Built by native/Makefile into libpreprocess.so; loaded via ctypes with a
// numpy fallback (multiyolov5_tpu/native.py).

#include <cstdint>
#include <cstring>

extern "C" {

// src: (h, w, 3) uint8; dst: (h/2, w/2, 12) uint8.
// Phase channel order: [ee(3), oe(3), eo(3), oo(3)], H-offset first.
void s2d_u8(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w) {
    const int64_t oh = h / 2, ow = w / 2;
    const int64_t srow = w * 3;
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < oh; ++y) {
        const uint8_t* e = src + (2 * y) * srow;      // even input row
        const uint8_t* o = src + (2 * y + 1) * srow;  // odd input row
        uint8_t* d = dst + y * ow * 12;
        for (int64_t x = 0; x < ow; ++x) {
            const uint8_t* pe = e + 2 * x * 3;  // even col
            const uint8_t* po = o + 2 * x * 3;
            uint8_t* q = d + x * 12;
            // ee = (row even, col even), oe = (row odd, col even),
            // eo = (row even, col odd),  oo = (row odd, col odd)
            q[0] = pe[0]; q[1] = pe[1]; q[2] = pe[2];
            q[3] = po[0]; q[4] = po[1]; q[5] = po[2];
            q[6] = pe[3]; q[7] = pe[4]; q[8] = pe[5];
            q[9] = po[3]; q[10] = po[4]; q[11] = po[5];
        }
    }
}

// Same as s2d_u8 but also converts BGR -> RGB while scattering (one pass
// from the cv2-decoded frame straight to the device-upload buffer).
void bgr2rgb_s2d_u8(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w) {
    const int64_t oh = h / 2, ow = w / 2;
    const int64_t srow = w * 3;
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < oh; ++y) {
        const uint8_t* e = src + (2 * y) * srow;
        const uint8_t* o = src + (2 * y + 1) * srow;
        uint8_t* d = dst + y * ow * 12;
        for (int64_t x = 0; x < ow; ++x) {
            const uint8_t* pe = e + 2 * x * 3;
            const uint8_t* po = o + 2 * x * 3;
            uint8_t* q = d + x * 12;
            q[0] = pe[2]; q[1] = pe[1]; q[2] = pe[0];
            q[3] = po[2]; q[4] = po[1]; q[5] = po[0];
            q[6] = pe[5]; q[7] = pe[4]; q[8] = pe[3];
            q[9] = po[5]; q[10] = po[4]; q[11] = po[3];
        }
    }
}

// Fill a (oh, ow, c) canvas with `fill` and blit src (h, w, c) at (top, left).
void letterbox_fill(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w,
                    int64_t oh, int64_t ow, int64_t c, int64_t top,
                    int64_t left, uint8_t fill) {
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < oh; ++y) {
        uint8_t* drow = dst + y * ow * c;
        if (y < top || y >= top + h) {
            memset(drow, fill, ow * c);
            continue;
        }
        memset(drow, fill, left * c);
        memcpy(drow + left * c, src + (y - top) * w * c, w * c);
        memset(drow + (left + w) * c, fill, (ow - left - w) * c);
    }
}

// uint8 -> float32 / 255
void normalize_f32(const uint8_t* src, float* dst, int64_t n) {
    const float k = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

// RGB frame -> the u8 stem kernel's packed input, in one pass
// (ops/pallas/stem_kernel.py stem_apply_pallas_u8 / pack_stem96_host).
//
// src: (h, w, 3) uint8, h % 4 == 0, w % 4 == 0.
// dst: (h/4 + 3, cp, 96) uint8, cp >= w/4 + 2 (the kernel's padded cols).
//
// Semantics = two nested 2x2 space-to-depths (channel index of quarter
// pixel (r, c): 12*p2 + 3*p1 + ch reads src[4r + 2*dy2 + dy1,
// 4c + 2*dx2 + dx1, ch] with phase order (dy,dx) = 00,10,01,11), padded by
// 2 rows top/bottom and 2 cols left (zero), then row-pair packed:
// dst[r, :, 0:48] = xp[r], dst[r, :, 48:96] = xp[r + 1].
void frame_to_stem96(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w,
                     int64_t cp) {
    const int64_t hq = h / 4, wq = w / 4;
    const int64_t drow = cp * 96;
    const int64_t srow = w * 3;
#pragma omp parallel for schedule(static)
    for (int64_t r = -3; r < hq; ++r) {
        // dst row index for the x48 row r in the LOW half is r + 2 (pad 2);
        // r contributes to dst rows r+2 (low lanes) and r+1 (high lanes).
        // Iterate dst rows instead: dst row t holds xp[t] | xp[t+1] where
        // xp[i] = x48[i - 2] for 2 <= i < hq + 2, else zeros.
        const int64_t t = r + 3;       // dst row 0..hq+2
        uint8_t* d = dst + t * drow;
        memset(d, 0, drow);
        for (int half = 0; half < 2; ++half) {
            const int64_t i = t + half;           // xp row
            const int64_t rq = i - 2;             // x48 row
            if (rq < 0 || rq >= hq) continue;
            const uint8_t* s0 = src + 4 * rq * srow;
            for (int64_t c = 0; c < wq; ++c) {
                uint8_t* q = d + (c + 2) * 96 + half * 48;
                const uint8_t* p0 = s0 + 4 * c * 3;
                for (int p2 = 0; p2 < 4; ++p2) {
                    const int64_t dy2 = p2 & 1, dx2 = p2 >> 1;
                    for (int p1 = 0; p1 < 4; ++p1) {
                        const int64_t dy1 = p1 & 1, dx1 = p1 >> 1;
                        const uint8_t* s =
                            p0 + (2 * dy2 + dy1) * srow + (2 * dx2 + dx1) * 3;
                        uint8_t* o = q + 12 * p2 + 3 * p1;
                        o[0] = s[0]; o[1] = s[1]; o[2] = s[2];
                    }
                }
            }
        }
    }
}

}  // extern "C"
