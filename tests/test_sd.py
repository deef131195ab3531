"""Stable Diffusion: text-encoder parity vs HF CLIPTextModel, sampler math vs
the analytic probability-flow ODE, full pipeline smoke + determinism."""
import math

import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models import sd as jsd


TINY = jsd.SDConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attn_levels=(0, 1), n_heads=2, context_dim=32,
    text_vocab=100, text_ctx=8, text_dim=32, text_layers=2, text_heads=2,
    vae_ch=16, vae_ch_mult=(1, 2), latent_channels=4)


@pytest.fixture(scope="module")
def tiny_sd():
    params = jsd.init_random_sd_params(TINY, seed=0)
    return jsd.SDModel(TINY, params)


def test_unet_shapes(tiny_sd):
    m = tiny_sd
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, 32))
    eps = m._unet(params=m.params, latents=x, t=t, context=ctx)
    assert eps.shape == (1, 8, 8, 4)


def test_vae_decoder_shapes(tiny_sd):
    m = tiny_sd
    img = m._vae(params=m.params, z=jnp.zeros((1, 8, 8, 4)))
    assert img.shape == (1, 16, 16, 3)  # 2 levels -> 2x upsample


def test_text_encoder_shapes(tiny_sd):
    m = tiny_sd
    out = m._text(params=m.params, tokens=jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, 32)


def test_clip_text_matches_hf():
    """Our text tower vs transformers' CLIPTextModel on converted weights."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(17)
    hcfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=8, hidden_act="quick_gelu")
    hf = CLIPTextModel(hcfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = jsd.SDConfig(text_vocab=100, text_ctx=8, text_dim=32, text_layers=2,
                       text_heads=2)
    T = "text_model."
    p = {
        "text.tok_embd": jnp.asarray(sd[T + "embeddings.token_embedding.weight"]),
        "text.pos_embd": jnp.asarray(sd[T + "embeddings.position_embedding.weight"]),
        "text.ln_final.weight": jnp.asarray(sd[T + "final_layer_norm.weight"]),
        "text.ln_final.bias": jnp.asarray(sd[T + "final_layer_norm.bias"]),
    }
    for i in range(2):
        hp = f"{T}encoder.layers.{i}."
        gp = f"text.{i}."
        for a, b in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            p[gp + a + ".weight"] = jnp.asarray(sd[hp + b + ".weight"])
            p[gp + a + ".bias"] = jnp.asarray(sd[hp + b + ".bias"])
        for a, b in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                     ("out", "out_proj")):
            p[gp + a + ".weight"] = jnp.asarray(sd[hp + "self_attn." + b + ".weight"])
            p[gp + a + ".bias"] = jnp.asarray(sd[hp + "self_attn." + b + ".bias"])
        for a, b in (("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            p[gp + a + ".weight"] = jnp.asarray(sd[hp + b + ".weight"])
            p[gp + a + ".bias"] = jnp.asarray(sd[hp + b + ".bias"])

    toks = np.array([[1, 5, 9, 42, 7, 3, 2, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).last_hidden_state.numpy()
    ours = np.asarray(jsd.clip_text_apply(p, cfg, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_euler_sampler_solves_linear_ode():
    """With eps(x, sigma) = x/sqrt(sigma^2+1) (i.e. x0 = x/(sigma^2+1)), the
    PF-ODE has a known solution; euler with many steps must approach it."""

    class FakeKD:
        def denoise(self, x, sigma, cond, uncond, cfg_scale):
            return x / (sigma ** 2 + 1.0)

    x0 = jnp.ones((1, 2, 2, 1)) * 5.0
    sig_max, n = 10.0, 400
    sigmas = np.append(np.linspace(sig_max, 1e-4, n), 0.0).astype(np.float32)
    out = jsd.sample_euler(FakeKD(), x0, sigmas, None, None, 1.0,
                           np.random.default_rng(0))
    # d x/d sigma = (x - x/(s^2+1))/s = x*s/(s^2+1) => x(0) = x(smax)*sqrt(1/(smax^2+1))
    expect = 5.0 * math.sqrt(1.0 / (sig_max ** 2 + 1.0))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2)


def test_heun_more_accurate_than_euler():
    class FakeKD:
        def denoise(self, x, sigma, cond, uncond, cfg_scale):
            return x / (sigma ** 2 + 1.0)

    x0 = jnp.ones((1, 2, 2, 1)) * 5.0
    sig_max = 10.0
    sigmas = np.append(np.linspace(sig_max, 1e-4, 12), 0.0).astype(np.float32)
    expect = 5.0 * math.sqrt(1.0 / (sig_max ** 2 + 1.0))
    rng = np.random.default_rng(0)
    e = abs(float(jsd.sample_euler(FakeKD(), x0, sigmas, None, None, 1.0, rng)[0, 0, 0, 0]) - expect)
    h = abs(float(jsd.sample_heun(FakeKD(), x0, sigmas, None, None, 1.0, rng)[0, 0, 0, 0]) - expect)
    assert h < e


def test_txt2img_pipeline_and_determinism(tiny_sd):
    # tiny VAE has one upsample level: output = latent(16//8=2) * 2 = 4 px
    img1 = tiny_sd.txt2img("x", width=16, height=16, steps=3, cfg_scale=1.0,
                           sampler="euler", seed=11)
    assert img1.shape == (4, 4, 3) and img1.dtype == np.uint8
    img2 = tiny_sd.txt2img("x", width=16, height=16, steps=3, cfg_scale=1.0,
                           sampler="euler", seed=11)
    np.testing.assert_array_equal(img1, img2)
    img3 = tiny_sd.txt2img("x", width=16, height=16, steps=3, cfg_scale=1.0,
                           sampler="euler", seed=12)
    assert (img1 != img3).any()


@pytest.mark.parametrize("sampler", ["euler", "euler a", "heun", "dpm++ 2m"])
def test_all_samplers_run(tiny_sd, sampler):
    img = tiny_sd.txt2img("x", width=16, height=16, steps=3, cfg_scale=2.0,
                          sampler=sampler, seed=1)
    assert img.shape == (4, 4, 3)
    assert np.isfinite(img.astype(np.float64)).all()


def test_gguf_roundtrip(tmp_path, tiny_sd):
    from koboldcpp_tpu.gguf import GGMLType, GGUFWriter

    path = str(tmp_path / "sd.gguf")
    w = GGUFWriter(path, architecture="sd")
    w.add("sd.unet.model_channels", np.uint32(32))
    w.add("sd.unet.res_blocks", np.uint32(1))
    w.add("sd.unet.heads", np.uint32(2))
    w.add("sd.context_dim", np.uint32(32))
    w.add("sd.text.layers", np.uint32(2))
    w.add("sd.text.heads", np.uint32(2))
    w.add("sd.text.dim", np.uint32(32))
    w.add("sd.vae.ch", np.uint32(16))
    w.add("sd.unet.channel_mult", np.array([1, 2], np.uint32))
    w.add("sd.unet.attn_levels", np.array([0, 1], np.uint32))
    w.add("sd.text.vocab", np.uint32(100))
    w.add("sd.text.ctx", np.uint32(8))
    w.add("sd.vae.ch_mult", np.array([1, 2], np.uint32))
    for name, arr in tiny_sd.params.items():
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)
    w.write()
    m = jsd.load_sd(path)
    assert m.cfg.vae_ch_mult == (1, 2) and m.cfg.text_ctx == 8
    img = m.txt2img("x", width=16, height=16, steps=2, cfg_scale=1.0, seed=5)
    assert img.shape == (4, 4, 3)


def test_sd_vae_override(tmp_path, tiny_sd):
    """--sdvae: standalone VAE (safetensors, diffusers layout) replaces the
    model's vae.* tensors; shape mismatch rejected."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(3)
    vae_new = {name[len("vae."):]: rng.standard_normal(
                   np.asarray(arr).shape).astype(np.float32)
               for name, arr in tiny_sd.params.items() if name.startswith("vae.")}
    path = str(tmp_path / "vae.safetensors")
    save_file(vae_new, path)

    params = dict(tiny_sd.params)
    n = jsd.load_sd_vae(params, path)
    assert n == len(vae_new) and n > 0
    key = "vae." + next(iter(vae_new))
    np.testing.assert_allclose(np.asarray(params[key]), vae_new[key[4:]],
                               rtol=1e-6)

    bad = {next(iter(vae_new)): np.zeros((3, 3), np.float32)}
    bad_path = str(tmp_path / "bad.safetensors")
    save_file(bad, bad_path)
    with pytest.raises(ValueError):
        jsd.load_sd_vae(dict(tiny_sd.params), bad_path)


def test_sd_lora_merge(tmp_path, tiny_sd):
    """SD LoRA: diffusers-PEFT keys -> GGUF adapter -> merged weights
    (W + mult*(alpha/r)*B@A), unmappable keys skipped, txt2img changes."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_sd_lora import convert_sd_lora_state_dict

    rng = np.random.default_rng(3)
    r = 4
    target_u = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    target_t = "text_encoder.text_model.encoder.layers.0.self_attn.q_proj"
    A_u = rng.standard_normal((r, 32)).astype(np.float32)
    B_u = rng.standard_normal((32, r)).astype(np.float32)
    A_t = rng.standard_normal((r, 32)).astype(np.float32)
    B_t = rng.standard_normal((32, r)).astype(np.float32)
    state = {
        f"unet.{target_u}.lora_A.weight": A_u,
        f"unet.{target_u}.lora_B.weight": B_u,
        f"{target_t}.lora_A.weight": A_t,
        f"{target_t}.lora_B.weight": B_t,
        # conv (4-D) and unknown keys are skipped, not fatal
        "unet.conv_in.lora_A.weight": rng.standard_normal((r, 4, 3, 3)).astype(np.float32),
        "unet.conv_in.lora_B.weight": rng.standard_normal((16, r, 1, 1)).astype(np.float32),
        "some.unknown.key": np.zeros(1, np.float32),
    }
    path = str(tmp_path / "sdlora.gguf")
    convert_sd_lora_state_dict(state, path, alpha=8.0)

    params = dict(tiny_sd.params)
    w0_u = np.asarray(params[target_u + ".weight"], np.float32).copy()
    w0_t = np.asarray(params["text.0.q.weight"], np.float32).copy()
    mult = 0.5
    n = jsd.apply_sd_lora(params, path, multiplier=mult)
    assert n == 2
    scale = mult * (8.0 / r)
    np.testing.assert_allclose(np.asarray(params[target_u + ".weight"]),
                               w0_u + scale * (B_u @ A_u), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["text.0.q.weight"]),
                               w0_t + scale * (B_t @ A_t), rtol=1e-5, atol=1e-5)

    # merged params change the image, same seed
    base = tiny_sd.txt2img("x", width=16, height=16, steps=2, cfg_scale=1.0, seed=5)
    m2 = jsd.SDModel(TINY, params)
    mod = m2.txt2img("x", width=16, height=16, steps=2, cfg_scale=1.0, seed=5)
    assert not np.allclose(base, mod)


def test_new_samplers_solve_linear_ode():
    """dpm2 / dpm++2s_a / ipndm / ipndm_v (the r1-missing sampler set,
    sdtype_adapter.cpp:41-58) must track the known PF-ODE solution of the
    linear test problem at least as well as euler."""
    import numpy as np

    class FakeKD:
        def denoise(self, x, sigma, cond, uncond, cfg_scale):
            return x * 0.0  # d = x/sigma -> dx/dsigma = x/sigma (linear)

    rng = np.random.default_rng(0)
    x0 = jnp.ones((1, 2, 2, 4), jnp.float32) * 5.0
    sigmas = np.linspace(10.0, 1.0, 40).astype(np.float32)
    expect = 5.0 * (1.0 / 10.0)  # x scales with sigma
    e_euler = abs(float(jsd.sample_euler(
        FakeKD(), x0, sigmas, None, None, 1.0, rng)[0, 0, 0, 0]) - expect)
    for name in ("dpm2", "ipndm", "ipndm_v", "dpm++2mv2"):
        fn = jsd.SAMPLERS[name]
        out = fn(FakeKD(), x0, sigmas, None, None, 1.0,
                 np.random.default_rng(0))
        err = abs(float(out[0, 0, 0, 0]) - expect)
        assert np.isfinite(np.asarray(out)).all(), name
        assert err <= e_euler * 1.5 + 1e-3, (name, err, e_euler)
    # the ancestral variant injects noise, so compare it against euler_a
    # under the same rng instead of the deterministic ODE solution
    out_a = jsd.SAMPLERS["dpm++2s_a"](FakeKD(), x0, sigmas, None, None, 1.0,
                                      np.random.default_rng(0))
    ref_a = jsd.sample_euler(FakeKD(), x0, sigmas, None, None, 1.0,
                             np.random.default_rng(0), ancestral=True)
    assert np.isfinite(np.asarray(out_a)).all()
    spread = float(np.abs(np.asarray(ref_a)).mean()) + abs(expect) + 1e-3
    assert abs(float(out_a[0, 0, 0, 0])) < 10 * spread


def test_sampler_name_matrix_covers_reference():
    """Every sampler name the reference adapter maps
    (sdtype_adapter.cpp:327-350) resolves to an implementation."""
    for name in ("euler", "euler a", "heun", "dpm2", "dpm++ 2s a",
                 "dpm++ 2m", "dpm++2mv2", "ipndm", "ipndm_v", "lcm"):
        assert name in jsd.SAMPLERS, name


def test_lcm_sampler_consistency_semantics():
    """LCM takes the consistency prediction DIRECTLY each step (not an euler
    ODE step) and re-injects fresh noise at the next sigma; with one step to
    sigma 0 it returns exactly the denoised x0 — euler from sigma 10 does
    not (reference LCM case, stable-diffusion.cpp:1172-1206)."""

    class FakeKD:
        def denoise(self, x, sigma, cond, uncond, cfg_scale):
            return x / (sigma ** 2 + 1.0)

    class ZeroRng:
        def standard_normal(self, shape):
            return np.zeros(shape, np.float32)

    x0 = jnp.ones((1, 2, 2, 1)) * 5.0
    sigmas = np.array([10.0, 0.0], np.float32)
    out = jsd.sample_lcm(FakeKD(), x0, sigmas, None, None, 1.0, ZeroRng())
    np.testing.assert_allclose(np.asarray(out), 5.0 / 101.0, rtol=1e-5)
    # 2-step, zero noise: LCM chains consistency predictions
    # den(den(x, 10), 2) = x/101/5; euler's intermediate step is an ODE move,
    # so it must differ (the old alias silently ran euler — Missing #4 r4)
    sig2 = np.array([10.0, 2.0, 0.0], np.float32)
    out2 = jsd.sample_lcm(FakeKD(), x0, sig2, None, None, 1.0, ZeroRng())
    np.testing.assert_allclose(np.asarray(out2), 5.0 / 101.0 / 5.0, rtol=1e-5)
    eul = jsd.sample_euler(FakeKD(), x0, sig2, None, None, 1.0, ZeroRng())
    assert abs(float(eul[0, 0, 0, 0]) - 5.0 / 101.0 / 5.0) > 1e-3
    # multi-step: intermediate steps re-inject noise at sigma_next; the run
    # is deterministic given the rng and ends at a finite image
    sigmas3 = np.array([10.0, 2.0, 0.0], np.float32)
    o1 = jsd.sample_lcm(FakeKD(), x0, sigmas3, None, None, 1.0,
                        np.random.default_rng(3))
    o2 = jsd.sample_lcm(FakeKD(), x0, sigmas3, None, None, 1.0,
                        np.random.default_rng(3))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.isfinite(np.asarray(o1)).all()
    # the registry maps the name to the real LCM sampler, not an alias
    assert jsd.SAMPLERS["lcm"] is jsd.sample_lcm


def test_lcm_txt2img_runs(tiny_sd):
    img = tiny_sd.txt2img("x", width=16, height=16, steps=3, cfg_scale=2.0,
                          sampler="lcm", seed=1)
    assert img.shape == (4, 4, 3)
    assert np.isfinite(img.astype(np.float64)).all()
