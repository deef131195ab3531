import sys, os, time
sys.path.insert(0, ".")
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama
from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params
cfg = TINYLLAMA_1_1B
params = synthetic_params(cfg, kind="q4_k", seed=0)
cache = init_cache(cfg.n_layers, 1, 1024, cfg.n_kv_heads, cfg.head_dim)
@partial(jax.jit, donate_argnums=(1,))
def decode_n(params, cache, tok0, start_pos):
    def body(i, carry):
        tok, cache, acc = carry
        logits, cache = llama.forward(params, cfg, tok,
            jnp.full((1, 1), start_pos + i, jnp.int32), cache, last_only=True)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        return nxt, cache, acc + logits[0, -1, 0]
    return jax.lax.fori_loop(0, 128, body, (tok0, cache, jnp.float32(0)))
tok0 = jnp.full((1, 1), 7, jnp.int32)
tok, cache, acc = decode_n(params, cache, tok0, 100); _ = float(acc)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    tok, cache, acc = decode_n(params, cache, tok0, 100); _ = float(acc)
    best = min(best, time.perf_counter() - t0)
print("CFG", os.environ.get("SWEEP_TAG"), "decode_tps", round(128/best, 1))
