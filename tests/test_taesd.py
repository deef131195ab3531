"""TAESD numerics vs a torch replica of the published architecture."""
import numpy as np
import jax.numpy as jnp

from koboldcpp_tpu.models.taesd import (decoder_apply, encoder_apply,
                                        load_taesd, scale_latents,
                                        unscale_latents)


def _torch_taesd():
    import torch
    import torch.nn as nn

    def conv(n_in, n_out, **kw):
        return nn.Conv2d(n_in, n_out, 3, padding=1, **kw)

    class Clamp(nn.Module):
        def forward(self, x):
            return torch.tanh(x / 3) * 3

    class Block(nn.Module):
        def __init__(self, n_in, n_out):
            super().__init__()
            self.conv = nn.Sequential(conv(n_in, n_out), nn.ReLU(),
                                      conv(n_out, n_out), nn.ReLU(),
                                      conv(n_out, n_out))
            self.skip = (nn.Conv2d(n_in, n_out, 1, bias=False)
                         if n_in != n_out else nn.Identity())
            self.fuse = nn.ReLU()

        def forward(self, x):
            return self.fuse(self.conv(x) + self.skip(x))

    def Encoder():
        return nn.Sequential(
            conv(3, 64), Block(64, 64),
            conv(64, 64, stride=2, bias=False), Block(64, 64), Block(64, 64), Block(64, 64),
            conv(64, 64, stride=2, bias=False), Block(64, 64), Block(64, 64), Block(64, 64),
            conv(64, 64, stride=2, bias=False), Block(64, 64), Block(64, 64), Block(64, 64),
            conv(64, 4))

    def Decoder():
        return nn.Sequential(
            Clamp(), conv(4, 64), nn.ReLU(),
            Block(64, 64), Block(64, 64), Block(64, 64),
            nn.Upsample(scale_factor=2), conv(64, 64, bias=False),
            Block(64, 64), Block(64, 64), Block(64, 64),
            nn.Upsample(scale_factor=2), conv(64, 64, bias=False),
            Block(64, 64), Block(64, 64), Block(64, 64),
            nn.Upsample(scale_factor=2), conv(64, 64, bias=False),
            Block(64, 64), conv(64, 3))

    class TAESD(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()

    return TAESD()


def test_taesd_matches_torch():
    import torch

    torch.manual_seed(0)
    model = _torch_taesd().eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    p = load_taesd(state)

    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)

    ours_dec = np.asarray(decoder_apply(p, jnp.asarray(z)))
    ours_enc = np.asarray(encoder_apply(p, jnp.asarray(img)))
    with torch.no_grad():
        ref_dec = model.decoder(torch.tensor(z.transpose(0, 3, 1, 2)))
        ref_enc = model.encoder(torch.tensor(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours_dec, ref_dec.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours_enc, ref_enc.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    assert ours_dec.shape == (1, 64, 64, 3)
    assert ours_enc.shape == (1, 4, 4, 4)


def test_latent_scaling_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 4)),
                    jnp.float32) * 2
    s = scale_latents(x)
    assert float(s.min()) >= 0 and float(s.max()) <= 1
    mid = jnp.clip(x, -3.0, 3.0)
    np.testing.assert_allclose(np.asarray(unscale_latents(scale_latents(mid))),
                               np.asarray(mid), rtol=1e-5, atol=1e-5)


def test_sdmodel_taesd_decode():
    """txt2img with TAESD set decodes through the tiny decoder."""
    import torch
    from koboldcpp_tpu.models.sd import SDConfig, SDModel, init_random_sd_params

    cfg = SDConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                   attn_levels=(0, 1), n_heads=2, context_dim=32,
                   text_vocab=100, text_ctx=8, text_dim=32, text_layers=2,
                   text_heads=2, vae_ch=16, vae_ch_mult=(1, 2),
                   latent_channels=4)
    model = SDModel(cfg, init_random_sd_params(cfg, seed=0))
    torch.manual_seed(1)
    taesd = _torch_taesd()
    model.set_taesd({k: v.numpy() for k, v in taesd.state_dict().items()})
    img = model.txt2img("x", steps=2, width=64, height=64, seed=3,
                        cfg_scale=1.0)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
