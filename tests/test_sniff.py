"""File-format sniffing vs hand-crafted legacy headers (check_file_format
decision tree, model_adapter.cpp:83-335)."""
import struct

import pytest

from koboldcpp_tpu.gguf.sniff import FileFormat, check_file_format, describe_or_raise

GGML, GGMF, GGJT, GGUF = 0x67676D6C, 0x67676D66, 0x67676A74, 0x46554747


def hdr(magic, *vals):
    return struct.pack(f"<{1+len(vals)}I", magic, *vals)


CASES = [
    (hdr(GGUF, 3, 0, 0), FileFormat.GGUF),
    (hdr(GGML, 32000, 2048, 4096, 32, 32, 128, 1), FileFormat.GGML),
    (hdr(GGML, 4096), FileFormat.MPT_1),
    (hdr(GGML, 50400, 2048, 4096, 16, 28, 64, 1), FileFormat.GPTJ_1),
    (hdr(GGML, 50400, 2048, 4096, 16, 28, 64, 1002), FileFormat.GPTJ_4),
    (hdr(GGML, 50400, 2048, 4096, 16, 28, 64, 2002), FileFormat.GPTJ_5),
    (hdr(GGML, 50400, 2048, 4096, 16, 28, 64, 3), FileFormat.GPTJ_3),
    (hdr(GGML, 50257, 1024, 768, 12, 12, 1), FileFormat.GPT2_1),
    (hdr(GGML, 50257, 1024, 768, 12, 12, 1005), FileFormat.GPT2_3),
    (hdr(GGML, 49152, 4096, 2560, 32, 32, 0), FileFormat.NEOX),
    (hdr(GGML, 50432, 2048, 2560, 32, 32, 20, 5, 0), FileFormat.NEOX_LEGACY),
    (hdr(GGML, 50432, 2048, 2560, 32, 32, 20, 1, 2000), FileFormat.NEOX),
    (hdr(GGMF, 1, 32000), FileFormat.GGHF),
    (hdr(GGMF, 100), FileFormat.RWKV_1),
    (hdr(GGMF, 101), FileFormat.RWKV_2),
    (hdr(GGJT, 1, 32000, 4096, 256, 32, 32, 128, 1), FileFormat.GGJT),
    (hdr(GGJT, 2, 32000, 4096, 256, 32, 32, 128, 1), FileFormat.GGJT_2),
    (hdr(GGJT, 3, 32000, 4096, 256, 32, 32, 128, 1), FileFormat.GGJT_3),
    (b"\x00\x01\x02\x03junk", FileFormat.BADFORMAT),
]


@pytest.mark.parametrize("data,expected", CASES)
def test_sniff(tmp_path, data, expected):
    p = tmp_path / "m.bin"
    p.write_bytes(data)
    assert check_file_format(str(p)) is expected


def test_describe_or_raise(tmp_path):
    # ggjt v2 is now loadable (gguf/legacy.py) -> no raise
    p = tmp_path / "legacy.bin"
    p.write_bytes(hdr(GGJT, 2, 32000, 4096, 256, 32, 32, 128, 1))
    describe_or_raise(str(p))
    # RWKV .bin containers are loadable now (LegacyRwkvReader) -> no raise
    import struct
    p3 = tmp_path / "rwkv.bin"
    p3.write_bytes(struct.pack("<II", 0x67676D66, 100))
    describe_or_raise(str(p3))
    p2 = tmp_path / "junk.bin"
    p2.write_bytes(b"nope")
    with pytest.raises(ValueError, match="not a recognized"):
        describe_or_raise(str(p2))
