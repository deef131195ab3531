// Native byte-trie tokenizer cores: RWKV greedy longest-match and UGM
// (unigram) Viterbi.
//
// Counterparts of the reference's llm_tokenizer_rwkv and llm_tokenizer_ugm
// (src/llama-vocab.cpp:1429, :1024 — both build a naive byte trie over the
// vocab and walk it per position). Same algorithms as the Python
// implementations in koboldcpp_tpu/tokenizers/{rwkv,ugm}.py; normalization
// (UGM charsmap) stays host-side — these operate on pre-normalized bytes.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct TrieNode {
    std::unordered_map<uint8_t, int32_t> children;
    int32_t token_id = -1;
};

struct Trie {
    std::vector<TrieNode> nodes;   // node 0 = root
    std::vector<float> scores;     // per token id (UGM); empty for RWKV

    void insert(const uint8_t* bytes, size_t len, int32_t id) {
        int32_t cur = 0;
        for (size_t i = 0; i < len; ++i) {
            auto it = nodes[cur].children.find(bytes[i]);
            if (it == nodes[cur].children.end()) {
                nodes.emplace_back();
                int32_t nxt = (int32_t)nodes.size() - 1;
                nodes[cur].children.emplace(bytes[i], nxt);
                cur = nxt;
            } else {
                cur = it->second;
            }
        }
        nodes[cur].token_id = id;
    }
};

std::vector<Trie*> g_tries;

size_t utf8_len(uint8_t c) {
    if (c < 0x80) return 1;
    if ((c >> 5) == 0x6) return 2;
    if ((c >> 4) == 0xE) return 3;
    if ((c >> 3) == 0x1E) return 4;
    return 1;
}

}  // namespace

extern "C" {

// tokens: concatenated raw token bytes; offsets: n+1 prefix offsets;
// scores: per-token (may be null for RWKV); skip: per-token 0/1 — 1 means
// the token is not inserted (control tokens). Returns handle.
int64_t kcpp_trie_new(const uint8_t* tokens, const int64_t* offsets,
                      const float* scores, const uint8_t* skip,
                      int64_t n_tokens) {
    auto* t = new Trie();
    t->nodes.emplace_back();
    if (scores) t->scores.assign(scores, scores + n_tokens);
    for (int64_t i = 0; i < n_tokens; ++i) {
        int64_t len = offsets[i + 1] - offsets[i];
        if (len <= 0 || (skip && skip[i])) continue;
        t->insert(tokens + offsets[i], (size_t)len, (int32_t)i);
    }
    g_tries.push_back(t);
    return (int64_t)g_tries.size() - 1;
}

void kcpp_trie_free(int64_t handle) {
    if (handle >= 0 && handle < (int64_t)g_tries.size() && g_tries[handle]) {
        delete g_tries[handle];
        g_tries[handle] = nullptr;
    }
}

// Greedy longest-match (RWKV): unknown bytes are skipped with no output.
int64_t kcpp_rwkv_encode(int64_t handle, const uint8_t* data, int64_t n,
                         int32_t* out, int64_t out_cap) {
    Trie* t = g_tries[handle];
    int64_t n_out = 0;
    int64_t i = 0;
    while (i < n && n_out < out_cap) {
        int32_t node = 0;
        int32_t best_id = -1;
        int64_t best_len = 0;
        int64_t j = i;
        while (j < n) {
            auto it = t->nodes[node].children.find(data[j]);
            if (it == t->nodes[node].children.end()) break;
            node = it->second;
            ++j;
            if (t->nodes[node].token_id >= 0) {
                best_id = t->nodes[node].token_id;
                best_len = j - i;
            }
        }
        if (best_id < 0) { ++i; continue; }
        out[n_out++] = best_id;
        i += best_len;
    }
    return n_out;
}

// UGM Viterbi over pre-normalized bytes (llm_tokenizer_ugm_session::tokenize
// semantics: per-UTF8-codepoint steps, unknown fallback with penalty score,
// consecutive unknowns merged).
int64_t kcpp_ugm_encode(int64_t handle, const uint8_t* data, int64_t n,
                        int32_t unk_id, float unk_score,
                        int32_t* out, int64_t out_cap) {
    Trie* t = g_tries[handle];
    if (n <= 0) return 0;
    struct Best { int32_t id; int64_t start; double score; };
    std::vector<Best> best((size_t)n + 1, {unk_id, 0, -1e30});
    best[0] = {unk_id, 0, 0.0};

    int64_t off = 0;
    while (off < n) {
        size_t n_units = utf8_len(data[off]);
        if ((int64_t)n_units > n - off) n_units = (size_t)(n - off);
        double cur = best[off].score;
        int32_t node = 0;
        bool single_cp = false;
        int64_t j = off;
        while (j < n) {
            auto it = t->nodes[node].children.find(data[j]);
            if (it == t->nodes[node].children.end()) break;
            node = it->second;
            ++j;
            int32_t id = t->nodes[node].token_id;
            if (id >= 0) {
                if ((size_t)(j - off) == n_units) single_cp = true;
                double cand = cur + (double)t->scores[id];
                if (cand > best[j].score) best[j] = {id, off, cand};
            }
        }
        if (!single_cp) {
            int64_t j2 = off + (int64_t)n_units;
            double cand = cur + (double)unk_score;
            if (cand > best[j2].score) best[j2] = {unk_id, off, cand};
        }
        off += (int64_t)n_units;
    }

    // backtrack (reversed), merging consecutive unknowns
    std::vector<int32_t> rev;
    int64_t pos = n;
    bool prev_unk = false;
    while (true) {
        const Best& b = best[pos];
        bool is_unk = b.id == unk_id;
        if (!(prev_unk && is_unk)) rev.push_back(b.id);
        if (b.start == 0) break;
        prev_unk = is_unk;
        pos = b.start;
    }
    int64_t n_out = 0;
    for (auto it = rev.rbegin(); it != rev.rend() && n_out < out_cap; ++it)
        out[n_out++] = *it;
    return n_out;
}

}  // extern "C"
