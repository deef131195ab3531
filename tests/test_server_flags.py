"""Server/launcher convenience flags (VERDICT r3 item 10 parity sweep):
--nomodel API shell, --ssl context construction, --ignoremissing, --onready
/--launch hook registration."""
import os
import subprocess

import pytest

pytest_plugins = ("aiohttp.pytest_plugin",)

from koboldcpp_tpu.cli import NullEngine, build_parser
from koboldcpp_tpu.server.app import ServerSettings, make_app


async def test_nomodel_shell(aiohttp_client):
    eng = NullEngine(512)
    app = make_app(eng, ServerSettings(model_name="inactive"))
    client = await aiohttp_client(app)
    r = await client.get("/api/v1/model")
    assert r.status == 200
    assert (await r.json())["result"] == "inactive"
    r = await client.get("/api/extra/version")
    assert r.status == 200
    r = await client.post("/api/v1/generate",
                          json={"prompt": "x", "max_length": 4})
    assert r.status == 200  # error result, not a crash
    body = await r.json()
    assert body["results"][0]["text"] == ""


def test_flags_parse():
    p = build_parser()
    a = p.parse_args(["--nomodel", "--ssl", "c.pem", "k.pem",
                      "--onready", "echo hi", "--launch", "--nocertify",
                      "--ignoremissing"])
    assert a.nomodel and a.launch and a.nocertify and a.ignoremissing
    assert a.ssl == ["c.pem", "k.pem"]
    assert a.onready == "echo hi"


def test_ssl_context_builds(tmp_path):
    cert = tmp_path / "c.pem"
    key = tmp_path / "k.pem"
    r = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"], capture_output=True)
    if r.returncode != 0:
        pytest.skip("openssl unavailable")
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))  # what run_server does


def test_ignoremissing_skips(tmp_path, capsys):
    # parser-level behavior is exercised through main()'s lora filter logic;
    # here just assert the flag exists and a missing path filter works
    p = build_parser()
    a = p.parse_args(["--ignoremissing", "--lora", "/nonexistent/l.gguf"])
    loras = [(lp, a.loramult) for lp in (a.lora or [])]
    kept = [(lp, m) for lp, m in loras if os.path.exists(lp)]
    assert kept == []
