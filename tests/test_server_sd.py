"""A1111 txt2img/img2img endpoints with a tiny SD model."""
import base64
import io

import numpy as np
import pytest

pytest_plugins = ("aiohttp.pytest_plugin",)

from koboldcpp_tpu.server.app import ServerSettings, make_app
from koboldcpp_tpu.models import sd as jsd
from .test_sd import TINY


class StubEngine:
    max_context = 128
    generation_finished = True

    def token_count(self, text):
        return []

    def abort(self):
        pass


@pytest.fixture(scope="module")
def sd_model():
    return jsd.SDModel(TINY, jsd.init_random_sd_params(TINY, seed=0))


async def test_txt2img_endpoint(sd_model, aiohttp_client):
    app = make_app(StubEngine(), ServerSettings(sd_model=sd_model))
    c = await aiohttp_client(app)
    r = await c.post("/sdapi/v1/txt2img", json={
        "prompt": "a test", "width": 16, "height": 16, "steps": 2,
        "cfg_scale": 1.0, "seed": 3})
    assert r.status == 200
    j = await r.json()
    img_bytes = base64.b64decode(j["images"][0])
    from PIL import Image

    im = Image.open(io.BytesIO(img_bytes))
    # the server clamps to the reference 64px minimum (koboldcpp.py:1123);
    # 64px -> 8x8 latents -> 16px from the tiny one-upsample VAE
    assert im.size == (16, 16)

    r = await c.get("/api/extra/version")
    assert (await r.json())["txt2img"] is True


async def test_img2img_endpoint(sd_model, aiohttp_client):
    from PIL import Image

    app = make_app(StubEngine(), ServerSettings(sd_model=sd_model))
    c = await aiohttp_client(app)
    init = Image.fromarray(np.full((8, 8, 3), 128, np.uint8))
    buf = io.BytesIO()
    init.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    r = await c.post("/sdapi/v1/img2img", json={
        "prompt": "x", "init_images": [b64], "steps": 2,
        "denoising_strength": 0.5, "cfg_scale": 1.0, "seed": 1})
    assert r.status == 200
    j = await r.json()
    assert len(j["images"]) == 1


async def test_txt2img_no_model(aiohttp_client):
    app = make_app(StubEngine(), ServerSettings())
    c = await aiohttp_client(app)
    r = await c.post("/sdapi/v1/txt2img", json={"prompt": "x"})
    assert r.status == 503
