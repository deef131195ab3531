"""Device-side stochastic sampling for the K-token decode fast path.

The reference samples on the host every token (SampleLogits,
/root/reference/gpttype_adapter.cpp:1338) — cheap over PCIe, but on a
tunneled TPU every host hop costs ~25 ms. This module runs the common
sampler preset ON DEVICE so the engine can decode FAST_DECODE_K tokens per
device call, like the greedy fast path.

Key observation: after the rep-pen/bias/ban stage (which modifies logit
VALUES), every remaining supported stage — top-k 5000 prefilter, top-k,
top-p, min-p, temperature — only ever keeps a PREFIX of the candidates
sorted by descending logit. So one sort per step suffices; the chain
reduces to tracking (prefix length n, inverse temperature) and the final
draw is gumbel-max over the masked prefix.

All sampler knobs are DYNAMIC jnp scalars (one XLA compile serves every
preset); only the sampler ORDER is static (it changes the dataflow:
whether top-p sees temperature-scaled logits depends on stage order).

Parity contract: identical candidate SET and probabilities as the host
chain (tests/test_device_sampler.py checks distribution equality); the
random DRAW uses the JAX PRNG, so per-seed sequences differ from the host
loop (both are faithful samples of the same distribution — the reference
itself draws differently across backends' RNGs).

Supported: temperature > 0, top_k, top_p, min_p, rep-pen (range/slope/
presence) in leading order position, logit biases, token bans, top-k 5000
prefilter. Everything else (DRY, XTC, mirostat, dynatemp, smoothing,
top-a, TFS, typical, grammar, anti-slop) falls back to the host loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sampling.samplers import (KCPP_SAMPLER_REP_PEN, KCPP_SAMPLER_TEMP,
                                 KCPP_SAMPLER_TOP_K, KCPP_SAMPLER_TOP_P)

NEG = jnp.float32(-1e30)


def supported_order(order, rep_pen_active: bool) -> bool:
    """The single-sort scheme needs value-modifying stages (rep-pen) BEFORE
    the sort — i.e. rep-pen must come before top_k/top_p/temp in the user
    order (true for the kobold default [6,0,1,3,4,2,5])."""
    filt = [s for s in order if s in (KCPP_SAMPLER_TOP_K, KCPP_SAMPLER_TOP_P,
                                      KCPP_SAMPLER_TEMP, KCPP_SAMPLER_REP_PEN)]
    if not rep_pen_active:
        return True
    return bool(filt) and filt[0] == KCPP_SAMPLER_REP_PEN


def make_dyn(sp, max_context: int) -> dict:
    """Pack a SamplerParams into the dynamic-scalar pytree the jitted chunk
    takes. One compile serves every value of these."""
    return dict(
        temperature=jnp.float32(sp.temperature),
        top_k=jnp.int32(sp.top_k),
        top_p=jnp.float32(sp.top_p),
        min_p=jnp.float32(sp.min_p),
        rep_pen=jnp.float32(sp.rep_pen),
        rep_pen_slope=jnp.float32(sp.rep_pen_slope),
        presence=jnp.float32(sp.presence_penalty),
        # host chain caps the window at min(range, n_ctx)
        # (sample_rep_pen, gpttype_adapter.cpp:950)
        rep_limit=jnp.int32(min(max(sp.rep_pen_range, 0), max_context)),
    )


def apply_rep_pen(logits, recent, count, dyn):
    """Vectorized sample_rep_pen (gpttype_adapter.cpp:950): the last
    min(count, rep_limit) entries of the rolling `recent` buffer form the
    penalty window; the older half takes the slope-reduced penalty. Identity
    when rep_pen == 1 and presence == 0."""
    V = logits.shape[0]
    W = recent.shape[0]
    last_n = jnp.minimum(jnp.minimum(count, dyn["rep_limit"]), W)
    idx = jnp.arange(W)
    age = W - 1 - idx                      # 0 == newest slot
    in_win = age < last_n
    i_pos = last_n - 1 - age               # index from the oldest, host order
    near = in_win & (2 * i_pos >= last_n)
    far = in_win & ~(2 * i_pos >= last_n)
    rep_pen = dyn["rep_pen"]
    reduced = jnp.where(rep_pen > 1.0,
                        1.0 + (rep_pen - 1.0) * dyn["rep_pen_slope"], rep_pen)
    pen = jnp.ones(V, jnp.float32)
    pen = pen.at[jnp.where(far, recent, V)].set(reduced, mode="drop")
    pen = pen.at[jnp.where(near, recent, V)].set(rep_pen, mode="drop")
    present = jnp.zeros(V, jnp.float32).at[
        jnp.where(in_win, recent, V)].set(1.0, mode="drop")
    out = jnp.where(pen != 1.0,
                    jnp.where(logits <= 0, logits * pen, logits / pen), logits)
    return out - dyn["presence"] * present


def _chain(logits, bias_mask, recent, count, dyn, order):
    """Run the supported sampler chain; returns (scaled_masked_logits over
    sorted candidates, sorted_ids). Softmax of the first gives the exact
    distribution the host chain would draw from."""
    V = logits.shape[0]
    l = logits.astype(jnp.float32) + bias_mask

    # top-k 5000 prefilter happens BEFORE the order chain (reference :1365)
    if V > 5000:
        thresh = jax.lax.top_k(l, 5000)[0][-1]
        l = jnp.where(l >= thresh, l, NEG)

    l = apply_rep_pen(l, recent, count, dyn)

    # one sort; every later stage keeps a prefix
    sorted_l, sorted_ids = jax.lax.top_k(l, V)  # descending
    n = jnp.int32(V)
    inv_temp = jnp.float32(1.0)
    pos = jnp.arange(V)

    for s in order:
        if s == KCPP_SAMPLER_TOP_K:
            # k <= 0 keeps everything (sample_top_k, host :111)
            k_eff = jnp.where(dyn["top_k"] > 0,
                              jnp.minimum(dyn["top_k"], V), V)
            n = jnp.minimum(n, k_eff)
        elif s == KCPP_SAMPLER_TOP_P:
            scaled = sorted_l * inv_temp
            m = jnp.where(pos < n, scaled, NEG)
            p = jax.nn.softmax(m)
            cum = jnp.cumsum(p)
            # host keeps indices [0, first(cum >= p)]  (:1009)
            keep = 1 + jnp.sum((cum < dyn["top_p"]) & (pos < n)).astype(jnp.int32)
            n = jnp.where(dyn["top_p"] < 1.0, jnp.minimum(n, keep), n)
            # min-p rides the same stage (host :505): keep logit >=
            # max_logit + log(min_p) on CURRENT (possibly temp-scaled) values
            cutoff = sorted_l[0] * inv_temp + jnp.log(dyn["min_p"])
            ge = (scaled >= cutoff) & (pos < n)
            n_minp = jnp.maximum(jnp.sum(ge).astype(jnp.int32), 1)
            n = jnp.where(dyn["min_p"] > 0.0, jnp.minimum(n, n_minp), n)
        elif s == KCPP_SAMPLER_TEMP:
            inv_temp = 1.0 / dyn["temperature"]

    final = jnp.where(pos < n, sorted_l * inv_temp, NEG)
    return final, sorted_ids


def sample_step(logits, bias_mask, recent, count, key, dyn, order):
    """One full sampler-chain step on device. Returns the sampled token id.
    `order` is a static tuple; everything in `dyn` is a traced scalar."""
    final, sorted_ids = _chain(logits, bias_mask, recent, count, dyn, order)
    g = jax.random.gumbel(key, final.shape, jnp.float32)
    pick = jnp.argmax(final + g)
    return sorted_ids[pick].astype(jnp.int32)


def make_dyn_rows(sps, max_context: int) -> dict:
    """Per-slot dynamic knob vectors for the batched sampler: one (B,)
    array per knob.  Greedy slots (temperature == 0) get sanitized values
    (temp 1, rep_pen 1) — their pick is overridden by the greedy mask, the
    sanitized row just keeps the vmapped chain NaN-free."""
    import numpy as np

    def col(f, dtype):
        return jnp.asarray(np.array([f(sp) for sp in sps], dtype=dtype))

    return dict(
        temperature=col(lambda sp: sp.temperature if sp.temperature > 0
                        else 1.0, "float32"),
        top_k=col(lambda sp: sp.top_k, "int32"),
        top_p=col(lambda sp: sp.top_p, "float32"),
        min_p=col(lambda sp: sp.min_p, "float32"),
        rep_pen=col(lambda sp: sp.rep_pen, "float32"),
        rep_pen_slope=col(lambda sp: sp.rep_pen_slope, "float32"),
        presence=col(lambda sp: sp.presence_penalty, "float32"),
        rep_limit=col(lambda sp: min(max(sp.rep_pen_range, 0), max_context),
                      "int32"),
    )


def sample_step_batched(logits, bias, recent, count, key, dyn, order, greedy):
    """Per-slot device sampling for the batched engine (VERDICT r2 item 6):
    vmap of the single-slot chain over B rows with per-slot knob vectors.
    `greedy` rows take argmax(logits + bias) — the host semantics of
    temperature == 0.  Returns (B,) int32 token ids."""
    B = logits.shape[0]
    keys = jax.random.split(key, B)

    def one(l, b, r, c, k, d, g):
        final, sorted_ids = _chain(l, b, r, c, d, order)
        gmb = jax.random.gumbel(k, final.shape, jnp.float32)
        pick = sorted_ids[jnp.argmax(final + gmb)]
        gpick = jnp.argmax(l.astype(jnp.float32) + b)
        return jnp.where(g, gpick, pick).astype(jnp.int32)

    return jax.vmap(one)(logits, bias, recent, count, keys, dyn, greedy)


def candidate_distribution(logits, bias_mask, recent, count, dyn, order):
    """Full-vocab probability vector the device sampler draws from — the
    test/parity hook against the host chain."""
    final, sorted_ids = _chain(jnp.asarray(logits), jnp.asarray(bias_mask),
                               jnp.asarray(recent), jnp.asarray(count),
                               dyn, tuple(order))
    p = jax.nn.softmax(final)
    V = logits.shape[0]
    return jnp.zeros(V, jnp.float32).at[sorted_ids].set(p)


def make_stoch_chunk(forward_fn, cfg, k_tokens, order):
    """Build the jitted K-token decode+sample chunk. forward_fn(params,
    tokens, positions, cache) -> (logits, cache) must be the last_only
    llama-family step. Returns fn(params, logits0, cache, start_pos,
    bias_mask, recent, count, key, dyn) -> (toks, logits, cache, recent,
    count, key)."""

    def chunk(params, logits0, cache, start_pos, bias_mask, recent, count,
              key, dyn):
        W = recent.shape[0]

        def body(i, carry):
            logits, cache, toks, recent, count, key = carry
            key, sub = jax.random.split(key)
            tok = sample_step(logits, bias_mask, recent, count, sub, dyn,
                              order)
            toks = toks.at[i].set(tok)
            recent = jnp.roll(recent, -1).at[-1].set(tok)
            count = jnp.minimum(count + 1, W)
            new_logits, cache = forward_fn(
                params, tok[None, None],
                jnp.full((1, 1), start_pos + i, jnp.int32), cache)
            return new_logits[0, -1], cache, toks, recent, count, key

        logits, cache, toks, recent, count, key = jax.lax.fori_loop(
            0, k_tokens, body,
            (logits0, cache, jnp.zeros((k_tokens,), jnp.int32), recent,
             count, key))
        return toks, logits, cache, recent, count, key

    return jax.jit(chunk, donate_argnames=("cache",))
