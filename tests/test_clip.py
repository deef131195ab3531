"""CLIP vision encoder parity vs transformers + projector pipeline."""
import numpy as np
import pytest
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from koboldcpp_tpu.models import clip as jclip


@pytest.fixture(scope="module")
def clip_pair(tmp_path_factory):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from convert_clip import convert_clip_state_dict
    from koboldcpp_tpu.gguf import GGMLType

    torch.manual_seed(12)
    cfg = CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=128, projection_dim=32)
    model = CLIPVisionModel(cfg).eval().float()
    vs = {k: v.numpy() for k, v in model.state_dict().items()}
    # strip the "vision_model." container prefix variations
    vs = {k.replace("vision_model.vision_model.", "vision_model."): v
          for k, v in vs.items()}
    rng = np.random.default_rng(0)
    proj = {
        "mm.0.weight": rng.standard_normal((48, 64)).astype(np.float32) * 0.05,
        "mm.0.bias": np.zeros(48, np.float32),
        "mm.2.weight": rng.standard_normal((48, 48)).astype(np.float32) * 0.05,
        "mm.2.bias": np.zeros(48, np.float32),
    }
    path = str(tmp_path_factory.mktemp("c") / "mmproj.gguf")
    convert_clip_state_dict(vs, cfg, path, proj, quant_type=GGMLType.F32)
    return model, path


def test_vision_features_match_hf(clip_pair):
    import torch

    model, path = clip_pair
    m = jclip.load_clip(path)
    assert m.cfg.n_layers == 3 and m.cfg.patch_size == 14
    px = np.random.default_rng(1).standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(px), output_hidden_states=True)
    # llava select_layer=-2: penultimate hidden state, patches only
    want = ref.hidden_states[-2].numpy()[:, 1:]
    got = np.asarray(jclip.encode_image_features(m.params, m.cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_projector_output_shape(clip_pair):
    _, path = clip_pair
    m = jclip.load_clip(path)
    px = np.random.default_rng(2).standard_normal((3, 56, 56)).astype(np.float32)
    emb = m.image_embed(px)
    assert emb.shape == (1, (56 // 14) ** 2, 48)


def test_preprocess_image():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (100, 80, 3), dtype=np.uint8))
    x = jclip.preprocess_image(img)
    assert x.shape == (3, 336, 336)
    assert np.isfinite(x).all()


def test_decode_image_base64():
    import base64
    import io

    from PIL import Image

    img = Image.fromarray(np.zeros((20, 20, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    x = jclip.decode_image_base64(b64)
    assert x.shape == (3, 336, 336)
