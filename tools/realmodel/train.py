"""Train a small llama-architecture LM from scratch in JAX (single TPU chip).

This exists to satisfy the "run a REAL model end-to-end" requirement in an
environment with zero network egress: no published weights can be downloaded, so
we train one locally on locally-harvested English text (see corpus.py), export it
to HF format (export_hf.py), and push it through the reference's own
convert_hf_to_gguf.py + quantize pipeline to obtain genuine reference-produced
GGUF files at every quant level.

The forward pass uses the HF LlamaForCausalLM conventions exactly (rotate-half
RoPE on (i, i+d/2) pairs, pre-norm RMSNorm, SwiGLU, GQA, untied lm_head) so the
exported checkpoint is bit-compatible with `transformers` — verified by
export_hf.py against torch before conversion.

Usage:
  python tools/realmodel/train.py CORPUS_DIR TOKENIZER_DIR OUT.npz \
      [--steps 3000] [--batch 32] [--seqlen 512]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tokenizers import Tokenizer

# all contraction dims (hidden, ffn) are multiples of 256 so every tensor is
# eligible for K-quant / IQ super-block formats in the reference quantizer
# (256-element super-blocks, /root/reference/ggml/src/ggml-common.h:253-334)
CFG = dict(
    vocab_size=8192,
    hidden=512,
    layers=6,
    heads=8,
    kv_heads=2,
    head_dim=64,
    ffn=1536,
    rope_theta=10000.0,
    rms_eps=1e-5,
)


def init_params(key, cfg):
    d, v, f = cfg["hidden"], cfg["vocab_size"], cfg["ffn"]
    hd, nh, nkv = cfg["head_dim"], cfg["heads"], cfg["kv_heads"]
    keys = iter(jax.random.split(key, 4 + 8 * cfg["layers"]))

    def dense(k, shape):
        # HF layout: (out, in); scaled init
        return (jax.random.normal(k, shape, jnp.float32) * (0.02)).astype(jnp.float32)

    p = {
        "embed": dense(next(keys), (v, d)),
        "lm_head": dense(next(keys), (v, d)),
        "final_norm": jnp.ones((d,), jnp.float32),
        "layers": [],
    }
    for _ in range(cfg["layers"]):
        p["layers"].append({
            "q": dense(next(keys), (nh * hd, d)),
            "k": dense(next(keys), (nkv * hd, d)),
            "v": dense(next(keys), (nkv * hd, d)),
            "o": dense(next(keys), (d, nh * hd)),
            "gate": dense(next(keys), (f, d)),
            "up": dense(next(keys), (f, d)),
            "down": dense(next(keys), (d, f)),
            "ln1": jnp.ones((d,), jnp.float32),
            "ln2": jnp.ones((d,), jnp.float32),
        })
    return p


def rmsnorm(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def rope_tables(seqlen, head_dim, theta):
    pos = np.arange(seqlen, dtype=np.float32)
    inv = theta ** (-np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    ang = pos[:, None] * inv[None, :]            # (T, hd/2)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)  # HF layout
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin)


def rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def forward(params, tokens, cfg, cos, sin):
    d, nh, nkv, hd = cfg["hidden"], cfg["heads"], cfg["kv_heads"], cfg["head_dim"]
    B, T = tokens.shape
    x = params["embed"][tokens]  # (B,T,d)
    mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
    for lyr in params["layers"]:
        h = rmsnorm(x, lyr["ln1"], cfg["rms_eps"])
        q = (h @ lyr["q"].T).reshape(B, T, nh, hd)
        k = (h @ lyr["k"].T).reshape(B, T, nkv, hd)
        v = (h @ lyr["v"].T).reshape(B, T, nkv, hd)
        q = q * cos[None, :, None, :] + rotate_half(q) * sin[None, :, None, :]
        k = k * cos[None, :, None, :] + rotate_half(k) * sin[None, :, None, :]
        # GQA broadcast
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        att = jnp.where(mask[None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, nh * hd)
        x = x + out @ lyr["o"].T
        h = rmsnorm(x, lyr["ln2"], cfg["rms_eps"])
        x = x + (jax.nn.silu(h @ lyr["gate"].T) * (h @ lyr["up"].T)) @ lyr["down"].T
    x = rmsnorm(x, params["final_norm"], cfg["rms_eps"])
    return x @ params["lm_head"].T


def loss_fn(params, batch, cfg, cos, sin):
    logits = forward(params, batch[:, :-1], cfg, cos, sin)
    tgt = batch[:, 1:]
    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir")
    ap.add_argument("tokenizer_dir")
    ap.add_argument("out")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    cfg = dict(CFG)
    tok = Tokenizer.from_file(os.path.join(args.tokenizer_dir, "tokenizer.json"))
    bos = tok.token_to_id("<|begin_of_text|>")

    def encode_file(name):
        with open(os.path.join(args.corpus_dir, name)) as fh:
            text = fh.read()
        ids = []
        for para in text.split("\n\n"):
            ids.append(bos)
            ids.extend(tok.encode(para).ids)
        return np.asarray(ids, np.int32)

    t0 = time.time()
    train_ids = encode_file("train.txt")
    eval_ids = encode_file("eval.txt")
    print(f"tokenized: train={len(train_ids)/1e6:.2f}M eval={len(eval_ids)/1e3:.0f}K "
          f"tokens in {time.time()-t0:.0f}s")

    T = args.seqlen
    n_blocks = (len(train_ids) - 1) // T
    blocks = np.stack([train_ids[i * T: i * T + T + 1] for i in range(n_blocks)])
    n_eval_blocks = (len(eval_ids) - 1) // T
    eval_blocks = np.stack([eval_ids[i * T: i * T + T + 1] for i in range(n_eval_blocks)])
    print(f"blocks: train={n_blocks} eval={n_eval_blocks} (seqlen {T})")

    cos, sin = rope_tables(T, cfg["head_dim"], cfg["rope_theta"])
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=args.steps, end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, cos, sin)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, batch):
        return loss_fn(params, batch, cfg, cos, sin)

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, n_blocks, args.batch)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(blocks[idx]))
        if step % 200 == 0 or step == args.steps - 1:
            el = np.mean([float(eval_loss(params, jnp.asarray(eval_blocks[i:i + args.batch])))
                          for i in range(0, min(n_eval_blocks, 4 * args.batch), args.batch)])
            print(f"step {step:5d} loss {float(loss):.3f} eval {el:.3f} "
                  f"(ppl {math.exp(el):.1f}) {time.time()-t0:.0f}s", flush=True)

    flat = {"embed": params["embed"], "lm_head": params["lm_head"],
            "final_norm": params["final_norm"]}
    for i, lyr in enumerate(params["layers"]):
        for k, vv in lyr.items():
            flat[f"layer{i}.{k}"] = vv
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    with open(args.out + ".cfg.json", "w") as fh:
        json.dump(cfg, fh)
    print(f"saved {args.out} ({n_params/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
