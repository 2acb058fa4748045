// Host-side image ops for the pipeline edges (C++ native tier).
//
// The reference does these in Python: an O(H*W) double loop for mask erosion
// (kandinsky2/utils.py:11-30) and per-image float->uint8 conversion
// (utils.py:57-70). They sit on the host critical path between the TPU and
// PIL, so they are native here; kandinsky2_tpu/native.py binds via ctypes
// with a numpy fallback.
//
// Build: make -C native   (produces libhostops.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// [-1,1] float NHWC -> uint8, round-half-to-even then clamp, matching
// numpy rint + clip (utils.py:57-66).
void f32_to_u8_images(const float* in, uint8_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = (in[i] + 1.0f) * 127.5f;
        v = std::nearbyintf(v);  // round half to even (numpy rint)
        v = std::min(255.0f, std::max(0.0f, v));
        out[i] = static_cast<uint8_t>(v);
    }
}

// uint8 HWC -> [-1,1] float (utils.py:33-39 arr/127.5 - 1)
void u8_to_f32_images(const uint8_t* in, float* out, int64_t n) {
    constexpr float inv = 1.0f / 127.5f;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = static_cast<float>(in[i]) * inv - 1.0f;
    }
}

// 6-neighborhood mask erosion (utils.py:11-30 semantics): a zero at p zeroes
// {(±1,0),(0,±1),(-1,-1),(+1,+1)} of p; equivalently out[p] = in[p] AND all
// six transposed-offset neighbors (out-of-bounds treated as 1).
void erode_mask(const float* in, float* out, int h, int w) {
    static const int dy[6] = {1, 0, 1, -1, 0, -1};
    static const int dx[6] = {0, 1, 1, 0, -1, -1};
    for (int i = 0; i < h; ++i) {
        for (int j = 0; j < w; ++j) {
            float v = in[i * w + j];
            if (v != 0.0f) {
                for (int k = 0; k < 6 && v != 0.0f; ++k) {
                    int ni = i + dy[k], nj = j + dx[k];
                    if (ni >= 0 && ni < h && nj >= 0 && nj < w &&
                        in[ni * w + nj] == 0.0f) {
                        v = 0.0f;
                    }
                }
            }
            out[i * w + j] = v;
        }
    }
}

// CLIP preprocessing normalize: (x/255 - mean) / std per channel, HWC uint8.
void clip_normalize_u8(const uint8_t* in, float* out, int64_t pixels,
                       const float* mean, const float* std) {
    for (int64_t p = 0; p < pixels; ++p) {
        for (int c = 0; c < 3; ++c) {
            out[p * 3 + c] =
                (static_cast<float>(in[p * 3 + c]) / 255.0f - mean[c]) / std[c];
        }
    }
}

}  // extern "C"
