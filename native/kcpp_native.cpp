// Native helpers for the serving hot loop.
//
// TPU-native framework keeps tensor compute in XLA/Pallas; these are the
// *host-side* per-token text/array algorithms that would otherwise run as
// Python loops (counterparts: sample_dry's reverse Z-algorithm
// gpttype_adapter.cpp:843-880, arr_longest_common_substring
// model_adapter.cpp:382, stop-sequence scanning gpttype_adapter.cpp:3379).
// Exposed as a plain C ABI for ctypes; build with `make -C native`.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Longest run of consecutive equal elements between a and b.
// Writes [len, start_a, start_b] into out3.
void kcpp_longest_common_run(const int32_t* a, int64_t la,
                             const int32_t* b, int64_t lb,
                             int64_t* out3) {
    if (la <= 0 || lb <= 0) { out3[0] = out3[1] = out3[2] = 0; return; }
    std::vector<int32_t> prev(lb + 1, 0), cur(lb + 1, 0);
    int64_t best = 0, bi = 0, bj = 0;
    for (int64_t i = 0; i < la; ++i) {
        for (int64_t j = 0; j < lb; ++j) {
            if (a[i] == b[j]) {
                cur[j + 1] = prev[j] + 1;
                if (cur[j + 1] > best) {
                    best = cur[j + 1];
                    bi = i - best + 1;
                    bj = j - best + 1;
                }
            } else {
                cur[j + 1] = 0;
            }
        }
        std::swap(prev, cur);
    }
    out3[0] = best; out3[1] = bi; out3[2] = bj;
}

// Reverse Z-algorithm repeat scan for the DRY sampler: for each position,
// the length of the context suffix that reappears ending at that position
// (clamped to rep_limit). tokens/out have length n.
void kcpp_dry_repeat_scan(const int32_t* tokens, int64_t n,
                          int64_t rep_limit, int32_t* out) {
    std::memset(out, 0, sizeof(int32_t) * n);
    if (n < 2) return;
    const int64_t last = n - 1;
    int64_t rt = 0, lt = 0;
    for (int64_t k = 1; k < n; ++k) {
        if (k > rt) {
            int64_t m = 0;
            while (m + k < n && tokens[last - m] == tokens[last - (m + k)]) ++m;
            out[last - k] = (int32_t)std::min(m, rep_limit);
            if (m > 0) { lt = k; rt = k + m - 1; }
        } else {
            int64_t p = k - lt;
            int64_t right_len = rt - k + 1;
            if (out[last - p] < right_len) {
                out[last - k] = (int32_t)std::min((int64_t)out[last - p], rep_limit);
            } else {
                int64_t i = rt + 1;
                while (i < n && tokens[last - i] == tokens[last - (i - k)]) ++i;
                out[last - k] = (int32_t)std::min(i - k, rep_limit);
                lt = k; rt = i - 1;
            }
        }
    }
}

// First match position of any of `n_stops` byte strings in text, or -1.
// stops: concatenated bytes; stop_lens: per-stop lengths.
int64_t kcpp_find_first_stop(const char* text, int64_t text_len,
                             const char* stops, const int64_t* stop_lens,
                             int64_t n_stops) {
    int64_t best = -1;
    int64_t off = 0;
    for (int64_t s = 0; s < n_stops; ++s) {
        int64_t sl = stop_lens[s];
        if (sl > 0 && sl <= text_len) {
            for (int64_t i = 0; i + sl <= text_len; ++i) {
                if (std::memcmp(text + i, stops + off, sl) == 0) {
                    if (best < 0 || i < best) best = i;
                    break;
                }
            }
        }
        off += sl;
    }
    return best;
}

// Longest common prefix of two int32 arrays (context fast-forward).
int64_t kcpp_common_prefix(const int32_t* a, int64_t la,
                           const int32_t* b, int64_t lb) {
    int64_t n = std::min(la, lb);
    int64_t i = 0;
    while (i < n && a[i] == b[i]) ++i;
    return i;
}

}  // extern "C"
