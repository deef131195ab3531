"""LLaVA pipeline: image embeds spliced into the decode stream, engine e2e."""
import base64
import io

import numpy as np
import pytest
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def png_b64(size=56, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def llava_engine(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel, LlamaConfig,
                              LlamaForCausalLM)
    from convert_clip import convert_clip_state_dict
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md
    from koboldcpp_tpu.engine import Engine
    from koboldcpp_tpu.gguf import GGMLType
    from koboldcpp_tpu.models.clip import load_clip
    from koboldcpp_tpu.models.loader import load_model

    torch.manual_seed(20)
    lcfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=512,
                       tie_word_embeddings=False)
    lm = LlamaForCausalLM(lcfg).eval().float()
    lstate = {k: v.numpy() for k, v in lm.state_dict().items()}
    d = tmp_path_factory.mktemp("lv")
    lpath = str(d / "lm.gguf")
    convert_llama_state_dict(lstate, lcfg, lpath, tokenizer_md=tiny_tokenizer_md(512))

    vcfg = CLIPVisionConfig(image_size=56, patch_size=14, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64)
    vm = CLIPVisionModel(vcfg).eval().float()
    vs = {k.replace("vision_model.vision_model.", "vision_model."): v.numpy()
          for k, v in vm.state_dict().items()}
    rng = np.random.default_rng(1)
    proj = {
        "mm.0.weight": rng.standard_normal((64, 32)).astype(np.float32) * 0.05,
        "mm.0.bias": np.zeros(64, np.float32),
        "mm.2.weight": rng.standard_normal((64, 64)).astype(np.float32) * 0.05,
        "mm.2.bias": np.zeros(64, np.float32),
    }
    cpath = str(d / "mmproj.gguf")
    convert_clip_state_dict(vs, vcfg, cpath, proj, quant_type=GGMLType.F32)

    model = load_model(lpath, packed=False, dtype=jnp.float32)
    clip = load_clip(cpath)
    # tiny clip expects 56x56 input; patch preprocess size accordingly
    return Engine(model, max_context=128, cache_dtype=jnp.float32,
                  clip_model=clip)


def test_generate_with_image(llava_engine, monkeypatch):
    from koboldcpp_tpu.engine import GenParams
    from koboldcpp_tpu.models import clip as jclip
    from koboldcpp_tpu.sampling import SamplerParams

    # resize test images to the tiny vision tower's 56px input
    orig = jclip.preprocess_image

    def small_pre(img):
        from PIL import Image

        img = img.convert("RGB").resize((56, 56), Image.BICUBIC)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - jclip.IMAGE_MEAN) / jclip.IMAGE_STD
        return x.transpose(2, 0, 1)

    monkeypatch.setattr(jclip, "preprocess_image", small_pre)

    eng = llava_engine
    params = GenParams(max_length=4,
                       sampler=SamplerParams(temperature=0.0, top_k=1, rep_pen=1.0),
                       images=[png_b64()])
    r = eng.generate([1, 5, 9], params)
    assert len(r.tokens) == 4
    # context includes 16 image-patch sentinels + bos? prompt had no bos here
    assert eng.context_tokens.count(eng.IMG_SENTINEL) == 16

    # a different image changes the greedy continuation... or at least reruns
    params2 = GenParams(max_length=4,
                        sampler=SamplerParams(temperature=0.0, top_k=1, rep_pen=1.0),
                        images=[png_b64(seed=9)])
    r2 = eng.generate([1, 5, 9], params2)
    assert len(r2.tokens) == 4

    # no image: plain path still works
    r3 = eng.generate([1, 5, 9], GenParams(
        max_length=4, sampler=SamplerParams(temperature=0.0, top_k=1, rep_pen=1.0)))
    assert len(r3.tokens) == 4


def test_image_changes_output_vs_no_image(llava_engine, monkeypatch):
    from koboldcpp_tpu.engine import GenParams
    from koboldcpp_tpu.models import clip as jclip
    from koboldcpp_tpu.sampling import SamplerParams

    def small_pre(img):
        from PIL import Image

        img = img.convert("RGB").resize((56, 56), Image.BICUBIC)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - jclip.IMAGE_MEAN) / jclip.IMAGE_STD
        return x.transpose(2, 0, 1)

    monkeypatch.setattr(jclip, "preprocess_image", small_pre)
    eng = llava_engine
    g = lambda **kw: GenParams(max_length=6, sampler=SamplerParams(
        temperature=0.0, top_k=1, rep_pen=1.0), **kw)
    eng.reset_context()
    with_img = eng.generate([1, 5, 9, 20], g(images=[png_b64(seed=3)]))
    eng.reset_context()
    without = eng.generate([1, 5, 9, 20], g())
    # random projector embeds virtually never produce the same greedy path
    assert with_img.tokens != without.tokens
