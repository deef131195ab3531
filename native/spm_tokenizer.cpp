// Native SPM tokenizer core.
//
// Same greedy highest-score bigram-merge algorithm as the Python
// implementation in koboldcpp_tpu/tokenizers/spm.py (counterpart of the
// reference's llm_tokenizer_spm, src/llama-vocab.cpp:208), for long-prompt
// hot paths. C ABI for ctypes: build one tokenizer per vocab, then encode
// UTF-8 fragments into token ids.

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SPMVocab {
    std::unordered_map<std::string, int32_t> token_to_id;
    std::vector<float> scores;
    int32_t byte_ids[256];
    int32_t unk_id;
};

struct Bigram {
    float score;
    int64_t left;
    std::string merged;
    bool operator<(const Bigram& o) const {
        // max-heap on score; ties -> smaller left index first
        if (score != o.score) return score < o.score;
        return left > o.left;
    }
};

std::vector<SPMVocab*> g_vocabs;

size_t utf8_len(uint8_t c) {
    if (c < 0x80) return 1;
    if ((c >> 5) == 0x6) return 2;
    if ((c >> 4) == 0xE) return 3;
    if ((c >> 3) == 0x1E) return 4;
    return 1;
}

}  // namespace

extern "C" {

// tokens: concatenated UTF-8 bytes; offsets: n_tokens+1 prefix offsets.
// byte_token_ids: 256 ids (-1 when absent). Returns a handle (>=0).
int64_t kcpp_spm_new(const char* tokens, const int64_t* offsets,
                     const float* scores, int64_t n_tokens,
                     const int32_t* byte_token_ids, int32_t unk_id) {
    auto* v = new SPMVocab();
    v->scores.assign(scores, scores + n_tokens);
    v->token_to_id.reserve((size_t)n_tokens * 2);
    for (int64_t i = 0; i < n_tokens; ++i) {
        std::string t(tokens + offsets[i], (size_t)(offsets[i + 1] - offsets[i]));
        v->token_to_id.emplace(std::move(t), (int32_t)i);
    }
    std::memcpy(v->byte_ids, byte_token_ids, sizeof(v->byte_ids));
    v->unk_id = unk_id;
    g_vocabs.push_back(v);
    return (int64_t)g_vocabs.size() - 1;
}

void kcpp_spm_free(int64_t handle) {
    if (handle >= 0 && handle < (int64_t)g_vocabs.size() && g_vocabs[handle]) {
        delete g_vocabs[handle];
        g_vocabs[handle] = nullptr;
    }
}

// Encode one fragment. out must hold text_len+1 ids; returns count.
int64_t kcpp_spm_encode(int64_t handle, const char* text, int64_t text_len,
                        int32_t* out) {
    if (handle < 0 || handle >= (int64_t)g_vocabs.size() || !g_vocabs[handle])
        return -1;
    const SPMVocab& v = *g_vocabs[handle];
    if (text_len <= 0) return 0;

    // initial symbols: utf-8 characters as (start, len) over text
    struct Sym { int64_t start, len, prev, next; bool alive; };
    std::vector<Sym> syms;
    syms.reserve((size_t)text_len);
    for (int64_t i = 0; i < text_len;) {
        int64_t l = (int64_t)utf8_len((uint8_t)text[i]);
        if (i + l > text_len) l = text_len - i;
        int64_t idx = (int64_t)syms.size();
        syms.push_back({i, l, idx - 1, idx + 1, true});
        i += l;
    }
    const int64_t n0 = (int64_t)syms.size();

    std::priority_queue<Bigram> heap;
    auto try_bigram = [&](int64_t left) {
        if (left < 0) return;
        int64_t right = syms[left].next;
        if (right >= n0) return;
        std::string merged(text + syms[left].start,
                           (size_t)(syms[left].len + syms[right].len));
        auto it = v.token_to_id.find(merged);
        if (it != v.token_to_id.end()) {
            heap.push({v.scores[it->second], left, std::move(merged)});
        }
    };
    for (int64_t i = 0; i + 1 < n0; ++i) try_bigram(i);

    while (!heap.empty()) {
        Bigram b = heap.top();
        heap.pop();
        int64_t left = b.left;
        if (!syms[left].alive) continue;
        int64_t right = syms[left].next;
        if (right >= n0 || !syms[right].alive) continue;
        if ((int64_t)b.merged.size() != syms[left].len + syms[right].len ||
            std::memcmp(b.merged.data(), text + syms[left].start,
                        b.merged.size()) != 0)
            continue;
        syms[left].len += syms[right].len;
        syms[right].alive = false;
        syms[left].next = syms[right].next;
        if (syms[right].next < n0) syms[syms[right].next].prev = left;
        try_bigram(syms[left].prev);
        try_bigram(left);
    }

    int64_t n_out = 0;
    for (int64_t i = 0; i < n0; i = (syms[i].alive ? syms[i].next : i + 1)) {
        if (!syms[i].alive) continue;
        std::string piece(text + syms[i].start, (size_t)syms[i].len);
        auto it = v.token_to_id.find(piece);
        if (it != v.token_to_id.end()) {
            out[n_out++] = it->second;
        } else {
            bool ok = true;
            for (int64_t j = 0; j < syms[i].len; ++j) {
                if (v.byte_ids[(uint8_t)piece[(size_t)j]] < 0) { ok = false; break; }
            }
            if (ok && syms[i].len > 0) {
                for (int64_t j = 0; j < syms[i].len; ++j)
                    out[n_out++] = v.byte_ids[(uint8_t)piece[(size_t)j]];
            } else if (v.unk_id >= 0) {
                out[n_out++] = v.unk_id;
            }
        }
    }
    return n_out;
}

}  // extern "C"
