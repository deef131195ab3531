// Dump the reference runtime's logits for a fixed token sequence, as text:
// one row per position, n_vocab floats.  Used by tools/realmodel/make_fixtures.py
// to produce golden files for tests/test_ref_gguf_fixtures.py (our engine's
// forward on reference-produced GGUF files must match the reference runtime).
//
// Usage: logits_ref MODEL.gguf tok0,tok1,tok2,...
#include "llama.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

int main(int argc, char ** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s MODEL.gguf t0,t1,...\n", argv[0]); return 1; }
    std::vector<llama_token> toks;
    {
        std::string s = argv[2];
        size_t pos = 0;
        while (pos < s.size()) {
            size_t c = s.find(',', pos);
            if (c == std::string::npos) c = s.size();
            toks.push_back(atoi(s.substr(pos, c - pos).c_str()));
            pos = c + 1;
        }
    }
    llama_backend_init();
    llama_model_params mp = llama_model_default_params();
    llama_model * model = llama_load_model_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 128; cp.n_batch = 128; cp.n_ubatch = 128;
    cp.n_threads = cp.n_threads_batch = 2;
    llama_context * ctx = llama_new_context_with_model(model, cp);
    const int n = (int) toks.size();
    llama_batch batch = llama_batch_init(n, 0, 1);
    batch.n_tokens = n;
    for (int i = 0; i < n; i++) {
        batch.token[i] = toks[i]; batch.pos[i] = i;
        batch.n_seq_id[i] = 1; batch.seq_id[i][0] = 0; batch.logits[i] = 1;
    }
    if (llama_decode(ctx, batch) != 0) { fprintf(stderr, "decode failed\n"); return 1; }
    const int nv = llama_n_vocab(model);
    const float * logits = llama_get_logits(ctx);
    for (int i = 0; i < n; i++) {
        for (int v = 0; v < nv; v++)
            printf("%.9g%c", logits[(size_t) i * nv + v], v + 1 == nv ? '\n' : ' ');
    }
    llama_batch_free(batch);
    llama_free(ctx);
    llama_free_model(model);
    llama_backend_free();
    return 0;
}
