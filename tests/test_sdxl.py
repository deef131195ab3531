"""SDXL-shaped pipeline: per-level transformer depth, linear projections,
dual text encoders with pooled projection, add-embedding micro-conditioning.
Tower parity vs transformers CLIPTextModelWithProjection (the bigG tower);
UNet/pipe tested by shape + determinism (no diffusers oracle offline)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from koboldcpp_tpu.models import sd as jsd

TINY_XL = jsd.SDConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attn_levels=(1,), n_heads=2, context_dim=48,  # = text_dim + text2_dim
    transformer_depth=(0, 2), attn_head_dim=16, linear_proj=True,
    add_embed_dim=32 + 6 * 256, pooled_dim=32,
    text_vocab=100, text_ctx=8, text_dim=16, text_layers=2, text_heads=2,
    text2_dim=32, text2_layers=3, text2_heads=2,
    vae_ch=16, vae_ch_mult=(1, 2), latent_channels=4)


@pytest.fixture(scope="module")
def tiny_xl():
    params = jsd.init_random_sd_params(TINY_XL, seed=1)
    return jsd.SDModel(TINY_XL, params)


def test_xl_unet_shapes(tiny_xl):
    m = tiny_xl
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((1, 8, 48), jnp.float32)
    pooled = jnp.zeros((1, 32), jnp.float32)
    tids = jnp.zeros((1, 6), jnp.float32)
    out = jsd.unet_apply(m.params, m.cfg, x, jnp.array([500.0]), ctx,
                         pooled=pooled, time_ids=tids)
    assert out.shape == (1, 8, 8, 4)
    # pooled conditioning must affect the output
    out2 = jsd.unet_apply(m.params, m.cfg, x, jnp.array([500.0]), ctx,
                          pooled=pooled + 1.0, time_ids=tids)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_xl_encode_prompt_shapes(tiny_xl):
    ctx, pooled = tiny_xl.encode_prompt("x")
    assert ctx.shape == (1, 8, 48)
    assert pooled.shape == (1, 32)


def test_xl_txt2img_determinism(tiny_xl):
    img1 = tiny_xl.txt2img("a", width=16, height=16, steps=2, cfg_scale=2.0,
                           seed=7)
    img2 = tiny_xl.txt2img("a", width=16, height=16, steps=2, cfg_scale=2.0,
                           seed=7)
    assert img1.shape == (4, 4, 3)
    np.testing.assert_array_equal(img1, img2)
    img3 = tiny_xl.txt2img("a", width=16, height=16, steps=2, cfg_scale=2.0,
                           seed=8)
    assert not np.array_equal(img1, img3)


def test_bigg_tower_matches_hf(tmp_path):
    """The second tower + projection vs transformers
    CLIPTextModelWithProjection on converted weights."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(71)
    hcfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                          intermediate_size=128, num_hidden_layers=3,
                          num_attention_heads=2, max_position_embeddings=8,
                          projection_dim=24, hidden_act="quick_gelu",
                          eos_token_id=99, bos_token_id=98)
    model = CLIPTextModelWithProjection(hcfg).eval().float()
    st = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = jsd.SDConfig(text_vocab=100, text_ctx=8,
                       text2_dim=32, text2_layers=3, text2_heads=2,
                       pooled_dim=24)
    p = {}
    T = "text_model."
    p["text2.tok_embd"] = jnp.asarray(st[T + "embeddings.token_embedding.weight"])
    p["text2.pos_embd"] = jnp.asarray(st[T + "embeddings.position_embedding.weight"])
    for i in range(3):
        hp = f"{T}encoder.layers.{i}."
        gp = f"text2.{i}."
        for a, b in (("ln1", "layer_norm1"), ("ln2", "layer_norm2"),
                     ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                     ("v", "self_attn.v_proj"), ("out", "self_attn.out_proj"),
                     ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            p[gp + a + ".weight"] = jnp.asarray(st[hp + b + ".weight"])
            p[gp + a + ".bias"] = jnp.asarray(st[hp + b + ".bias"])
    p["text2.ln_final.weight"] = jnp.asarray(st[T + "final_layer_norm.weight"])
    p["text2.ln_final.bias"] = jnp.asarray(st[T + "final_layer_norm.bias"])
    p["text2.projection"] = jnp.asarray(st["text_projection.weight"])

    toks = np.array([[98, 5, 9, 42, 7, 60, 3, 99]], np.int32)
    hidden = jsd.clip_text_apply(p, cfg, jnp.asarray(toks), prefix="text2.",
                                 n_layers=3, n_heads=2)
    with torch.no_grad():
        out = model(torch.tensor(toks, dtype=torch.long),
                    output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(),
                               rtol=3e-3, atol=3e-3)
    # pooled: EOT token (id 99 at position 7) through the projection
    pooled = np.asarray(hidden[:, 7] @ p["text2.projection"].T)
    np.testing.assert_allclose(pooled, out.text_embeds.numpy(),
                               rtol=3e-3, atol=3e-3)
    # penultimate (skip_last) == hidden_states[-2]
    pen = jsd.clip_text_apply(p, cfg, jnp.asarray(toks), prefix="text2.",
                              n_layers=3, n_heads=2, skip_last=1,
                              final_ln=False)
    np.testing.assert_allclose(np.asarray(pen),
                               out.hidden_states[-2].numpy(),
                               rtol=3e-3, atol=3e-3)
