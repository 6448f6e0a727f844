// Native host-side audio data plane.
//
// The reference delegates its hot host loops (int16 decode, pad/truncate) to
// numpy inside DataLoader worker processes; here they are C++ with OpenMP +
// auto-vectorization, callable via ctypes (audioset_convnext_inf_tpu/utils/
// native.py), feeding the device pipeline without Python-loop overhead.
//
// Build: make -C native   (produces libaudiohost.so)

#include <algorithm>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// int16 -> float32, x / 32767 (reference utilities.py:226-227)
void int16_to_float32(const int16_t* src, float* dst, int64_t n) {
    const float scale = 1.0f / 32767.0f;
#pragma omp parallel for schedule(static) if (n > 1 << 16)
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = static_cast<float>(src[i]) * scale;
    }
}

// float32 -> int16 with clip to [-1, 1] (reference utilities.py:220-223)
void float32_to_int16(const float* src, int16_t* dst, int64_t n) {
#pragma omp parallel for schedule(static) if (n > 1 << 16)
    for (int64_t i = 0; i < n; ++i) {
        float v = src[i];
        v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        dst[i] = static_cast<int16_t>(v * 32767.0f);
    }
}

// Batch decode: n_items rows of int16[src_len] -> float32[dst_len] rows,
// zero-padding the tail or truncating (decode + pad_or_truncate fused).
void decode_batch_int16(const int16_t* src, int64_t n_items, int64_t src_len,
                        float* dst, int64_t dst_len) {
    const float scale = 1.0f / 32767.0f;
    const int64_t copy = std::min(src_len, dst_len);
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_items; ++r) {
        const int16_t* s = src + r * src_len;
        float* d = dst + r * dst_len;
        for (int64_t i = 0; i < copy; ++i) {
            d[i] = static_cast<float>(s[i]) * scale;
        }
        if (dst_len > copy) {
            std::memset(d + copy, 0, sizeof(float) * (dst_len - copy));
        }
    }
}

// Strided decimation resample 32k -> 16k/8k (reference data_generator.py:107-123)
void decimate_int16_to_float32(const int16_t* src, int64_t n, int64_t stride,
                               float* dst) {
    const float scale = 1.0f / 32767.0f;
    const int64_t out_n = (n + stride - 1) / stride;
#pragma omp parallel for schedule(static) if (out_n > 1 << 14)
    for (int64_t i = 0; i < out_n; ++i) {
        dst[i] = static_cast<float>(src[i * stride]) * scale;
    }
}

int omp_thread_count() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
