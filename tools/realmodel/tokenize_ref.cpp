// Print the reference runtime's llama_tokenize ids for a text file, one per
// whitespace-separated token — used by run_quality.py to assert our tokenizer
// produces the identical stream (precondition for apples-to-apples ppl
// windows), and by tests/test_realmodel_goldens.py fixtures.
#include "llama.h"

#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

int main(int argc, char ** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s MODEL.gguf TEXT\n", argv[0]); return 1; }
    llama_backend_init();
    llama_model_params mp = llama_model_default_params();
    mp.vocab_only = true;
    llama_model * model = llama_load_model_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    std::ifstream fh(argv[2]);
    std::stringstream ss; ss << fh.rdbuf();
    std::string text = ss.str();
    std::vector<llama_token> toks(text.size() + 8);
    int n = llama_tokenize(model, text.c_str(), (int32_t) text.size(),
                           toks.data(), (int32_t) toks.size(), false, false);
    if (n < 0) { fprintf(stderr, "tokenize failed\n"); return 1; }
    for (int i = 0; i < n; i++) printf("%d\n", toks[i]);
    llama_free_model(model);
    llama_backend_free();
    return 0;
}
