"""gguf-split parity: split a GGUF into shards, read the shard set
transparently, merge back bit-identically, and load+run a split model.

Counterpart of /root/reference/examples/gguf-split/gguf-split.cpp and the
split-aware loader in /root/reference/src/llama.cpp (llama_split_path).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from .test_tools import f32_gguf  # noqa: F401  (fixture reuse)


def _split(src, prefix, max_tensors=3):
    from gguf_split import do_split

    do_split(src, prefix, max_tensors, 0)


def test_split_then_sharded_read(f32_gguf, tmp_path):  # noqa: F811
    from koboldcpp_tpu.gguf import GGUFReader
    from koboldcpp_tpu.gguf.reader import ShardedGGUFReader, open_gguf

    prefix = str(tmp_path / "model")
    _split(f32_gguf, prefix)
    first = prefix + "-00001-of-"
    shards = sorted(p for p in os.listdir(tmp_path) if p.endswith(".gguf"))
    assert len(shards) > 2
    first = str(tmp_path / shards[0])

    with GGUFReader(f32_gguf) as ref, open_gguf(first) as r:
        assert isinstance(r, ShardedGGUFReader)
        assert set(r.tensors) == set(ref.tensors)
        assert r.metadata["general.architecture"] == "llama"
        assert int(r.metadata["split.tensors.count"]) == len(ref.tensors)
        for name, info in ref.tensors.items():
            assert r.tensors[name].shape == info.shape
            assert r.tensors[name].ggml_type == info.ggml_type
            np.testing.assert_array_equal(r.tensor_raw(name),
                                          ref.tensor_raw(name))


def test_merge_roundtrip_bitexact_tensors(f32_gguf, tmp_path):  # noqa: F811
    from gguf_split import do_merge
    from koboldcpp_tpu.gguf import GGUFReader

    prefix = str(tmp_path / "model")
    _split(f32_gguf, prefix)
    shards = sorted(p for p in os.listdir(tmp_path) if "-of-" in p)
    merged = str(tmp_path / "merged.gguf")
    do_merge(str(tmp_path / shards[0]), merged)
    with GGUFReader(f32_gguf) as a, GGUFReader(merged) as b:
        assert set(a.tensors) == set(b.tensors)
        assert "split.count" not in b.metadata
        for name in a.tensors:
            np.testing.assert_array_equal(a.tensor_raw(name),
                                          b.tensor_raw(name))
        for k, v in a.metadata.items():
            assert k in b.metadata


def test_split_model_loads_and_runs(f32_gguf, tmp_path):  # noqa: F811
    from koboldcpp_tpu.engine import Engine, GenParams
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.sampling import SamplerParams

    prefix = str(tmp_path / "model")
    _split(f32_gguf, prefix, max_tensors=5)
    shards = sorted(p for p in os.listdir(tmp_path) if "-of-" in p)
    gp = GenParams(max_length=4, sampler=SamplerParams(
        temperature=0.0, top_k=1, rep_pen=1.0))

    whole = Engine(load_model(f32_gguf), max_context=128).generate([1, 5, 9], gp)
    split = Engine(load_model(str(tmp_path / shards[0])),
                   max_context=128).generate([1, 5, 9], gp)
    assert whole.tokens == split.tokens


def test_wrong_shard_rejected(f32_gguf, tmp_path):  # noqa: F811
    from koboldcpp_tpu.gguf.reader import ShardedGGUFReader

    prefix = str(tmp_path / "model")
    _split(f32_gguf, prefix)
    shards = sorted(p for p in os.listdir(tmp_path) if "-of-" in p)
    with pytest.raises(ValueError, match="first shard"):
        ShardedGGUFReader(str(tmp_path / shards[1]))
