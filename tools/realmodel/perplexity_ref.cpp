// Reference-side perplexity driver.
//
// Links against the REFERENCE llama.cpp runtime (the koboldcpp fork's objects,
// built CPU-only from /root/reference via a scratch copy) and computes perplexity
// with EXACTLY the same windowing as our tools/perplexity.py: non-overlapping
// n_ctx windows, window[0] replaced by BOS, NLL accumulated over targets
// window[n_ctx/2 .. n_ctx-1].  This produces the llama.cpp-side Δppl baseline on
// the very same GGUF files + eval text, apples-to-apples (upstream tool itself is
// stripped from the fork — Makefile has no perplexity target, only a clean-rule
// remnant at /root/reference/Makefile:574).
//
// Build (from the scratch reference build dir that already has the .o files):
//   g++ -I. -Iggml/include -Iinclude -O2 -std=c++11 -pthread \
//       perplexity_ref.cpp ggml.o llama.o ggml-backend_default.o ggml-alloc.o \
//       ggml-aarch64.o ggml-quants.o unicode.o unicode-data.o sgemm.o \
//       llavaclip_default.o llava.o -o perplexity_ref
//
// Usage: perplexity_ref MODEL.gguf EVAL.txt [n_ctx]

#include "llama.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s MODEL.gguf EVAL.txt [n_ctx]\n", argv[0]);
        return 1;
    }
    const char * model_path = argv[1];
    const char * text_path  = argv[2];
    const int n_ctx = argc > 3 ? atoi(argv[3]) : 512;

    llama_backend_init();
    llama_model_params mparams = llama_model_default_params();
    mparams.n_gpu_layers = 0;
    llama_model * model = llama_load_model_from_file(model_path, mparams);
    if (!model) { fprintf(stderr, "failed to load %s\n", model_path); return 1; }

    llama_context_params cparams = llama_context_default_params();
    cparams.n_ctx    = n_ctx;
    cparams.n_batch  = n_ctx;
    cparams.n_ubatch = n_ctx;
    cparams.n_threads = 2;
    cparams.n_threads_batch = 2;
    llama_context * ctx = llama_new_context_with_model(model, cparams);
    if (!ctx) { fprintf(stderr, "failed to create context\n"); return 1; }

    std::ifstream fh(text_path);
    std::stringstream ss; ss << fh.rdbuf();
    std::string text = ss.str();

    std::vector<llama_token> tokens(text.size() + 8);
    int n_tok = llama_tokenize(model, text.c_str(), (int32_t) text.size(),
                               tokens.data(), (int32_t) tokens.size(),
                               /*add_special*/ false, /*parse_special*/ false);
    if (n_tok < 0) { fprintf(stderr, "tokenize failed (%d)\n", n_tok); return 1; }
    tokens.resize(n_tok);
    fprintf(stderr, "tokenized %d tokens\n", n_tok);

    const int n_vocab = llama_n_vocab(model);
    const llama_token bos = llama_token_bos(model);
    const int n_chunks = n_tok / n_ctx;
    const int first_eval = n_ctx / 2 < 512 ? (n_ctx / 2 < 1 ? 1 : n_ctx / 2) : 512;

    llama_batch batch = llama_batch_init(n_ctx, 0, 1);

    double total_nll = 0.0;
    long   total_cnt = 0;
    for (int ci = 0; ci < n_chunks; ci++) {
        std::vector<llama_token> chunk(tokens.begin() + (size_t) ci * n_ctx,
                                       tokens.begin() + (size_t) (ci + 1) * n_ctx);
        if (bos >= 0) chunk[0] = bos;

        llama_kv_cache_clear(ctx);
        batch.n_tokens = n_ctx;
        for (int i = 0; i < n_ctx; i++) {
            batch.token[i]    = chunk[i];
            batch.pos[i]      = i;
            batch.n_seq_id[i] = 1;
            batch.seq_id[i][0] = 0;
            batch.logits[i]   = 1;   // need logits at every position
        }
        if (llama_decode(ctx, batch) != 0) {
            fprintf(stderr, "decode failed at chunk %d\n", ci);
            return 1;
        }
        const float * logits = llama_get_logits(ctx);
        // targets chunk[first_eval .. n_ctx-1], predicted by logits row (t-1)
        for (int t = first_eval; t < n_ctx; t++) {
            const float * row = logits + (size_t) (t - 1) * n_vocab;
            // log-softmax in double
            double maxv = row[0];
            for (int v = 1; v < n_vocab; v++) if (row[v] > maxv) maxv = row[v];
            double sum = 0.0;
            for (int v = 0; v < n_vocab; v++) sum += exp((double) row[v] - maxv);
            double lp = (double) row[chunk[t]] - maxv - log(sum);
            total_nll += -lp;
            total_cnt += 1;
        }
        fprintf(stderr, "[%d/%d] ppl so far: %.4f\n", ci + 1, n_chunks,
                exp(total_nll / total_cnt));
    }
    printf("FINAL_PPL %.6f tokens %ld\n", exp(total_nll / total_cnt), total_cnt);

    llama_batch_free(batch);
    llama_free(ctx);
    llama_free_model(model);
    llama_backend_free();
    return 0;
}
