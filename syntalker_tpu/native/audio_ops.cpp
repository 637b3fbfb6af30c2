// Native host-side audio/data ops for the SynTalker-TPU data pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; these C++ kernels cover the
// host-side featurization hot spots that feed it (the reference delegated
// the equivalent work to librosa/numba and numpy stride tricks):
//
//  - rolling_max_f32: amplitude envelope (beat_sep_lower.py:395-403).
//    numpy's sliding_window_view does O(n*w) work and materializes an
//    n x 1024 view; this is the O(n) monotonic-deque algorithm.
//  - peak_pick_f32: librosa-style onset peak picking (utils/metric.py and
//    data/audio.py semantics) without the Python inner loop.
//  - window_gather_f32: batched strided window gather for cache building.
//
// Built as a plain shared library (no pybind11 in the image); bound via
// ctypes in syntalker_tpu/native/__init__.py with numpy fallbacks.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

extern "C" {

// Rolling max of |x| over `window` samples, stride 1, end-padded with the
// final value. out must have n elements.
void rolling_max_abs_f32(const float* x, int64_t n, int64_t window, float* out) {
    if (n <= 0) return;
    if (window > n) window = n;
    std::deque<int64_t> dq;  // indices of decreasing |x|
    auto absv = [&](int64_t i) { return x[i] < 0 ? -x[i] : x[i]; };
    const int64_t m = n - window + 1;  // number of full windows
    for (int64_t i = 0; i < n; ++i) {
        while (!dq.empty() && absv(dq.back()) <= absv(i)) dq.pop_back();
        dq.push_back(i);
        const int64_t start = i - window + 1;
        if (start >= 0) {
            while (dq.front() < start) dq.pop_front();
            out[start] = absv(dq.front());
        }
    }
    // pad the tail with the last full-window value
    const float last = m > 0 ? out[m - 1] : absv(dq.front());
    for (int64_t i = m; i < n; ++i) out[i] = last;
}

// librosa peak_pick: local max over [i-pre_max, i+post_max], above the
// moving mean over [i-pre_avg, i+post_avg] + delta, with a refractory
// `wait`. Returns the number of peaks written to out_idx (capacity n).
int64_t peak_pick_f32(const float* env, int64_t n, int64_t pre_max,
                      int64_t post_max, int64_t pre_avg, int64_t post_avg,
                      float delta, int64_t wait, int64_t* out_idx) {
    // prefix sums for O(1) window means
    std::vector<double> pre(n + 1, 0.0);
    for (int64_t i = 0; i < n; ++i) pre[i + 1] = pre[i] + env[i];

    int64_t count = 0;
    int64_t last = -1 - wait;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t lo_m = std::max<int64_t>(0, i - pre_max);
        const int64_t hi_m = std::min<int64_t>(n, i + post_max + 1);
        float wmax = env[lo_m];
        for (int64_t j = lo_m + 1; j < hi_m; ++j) wmax = std::max(wmax, env[j]);
        if (env[i] < wmax) continue;
        const int64_t lo_a = std::max<int64_t>(0, i - pre_avg);
        const int64_t hi_a = std::min<int64_t>(n, i + post_avg + 1);
        const double mean = (pre[hi_a] - pre[lo_a]) / double(hi_a - lo_a);
        if (env[i] < mean + delta) continue;
        if (i - last <= wait) continue;
        out_idx[count++] = i;
        last = i;
    }
    return count;
}

// Gather `num` windows of `length` rows x `dim` cols from src (n x dim),
// window w starting at starts[w]. dst must hold num*length*dim floats.
void window_gather_f32(const float* src, int64_t n, int64_t dim,
                       const int64_t* starts, int64_t num, int64_t length,
                       float* dst) {
    for (int64_t w = 0; w < num; ++w) {
        const int64_t s = starts[w];
        const int64_t avail = std::max<int64_t>(
            0, std::min<int64_t>(length, n - s));
        std::memcpy(dst + w * length * dim, src + s * dim,
                    size_t(avail) * dim * sizeof(float));
        if (avail < length) {
            std::memset(dst + (w * length + avail) * dim, 0,
                        size_t(length - avail) * dim * sizeof(float));
        }
    }
}

}  // extern "C"
