"""Split a GGUF model into shards / merge shards back into one file.

Counterpart of the reference's examples/gguf-split/gguf-split.cpp: shards are
self-contained GGUF files named `<prefix>-%05d-of-%05d.gguf`; every shard
carries `split.no` / `split.count` / `split.tensors.count` KVs; shard 1 keeps
the full model metadata. Tensor payloads are copied packed (no re-quant).

Usage:
  python tools/gguf_split.py --split --split-max-tensors 128 in.gguf outprefix
  python tools/gguf_split.py --split --split-max-size 4G in.gguf outprefix
  python tools/gguf_split.py --merge in-00001-of-00003.gguf out.gguf
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGUFReader, GGUFWriter  # noqa: E402
from koboldcpp_tpu.gguf.constants import GGUFValueType  # noqa: E402
from koboldcpp_tpu.gguf.reader import (  # noqa: E402
    ShardedGGUFReader, split_path)

_SPLIT_KEYS = (ShardedGGUFReader.SPLIT_NO, ShardedGGUFReader.SPLIT_COUNT,
               ShardedGGUFReader.SPLIT_TENSORS_COUNT)


def _parse_size(s: str) -> int:
    mult = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30}
    if s and s[-1].upper() in mult:
        return int(float(s[:-1]) * mult[s[-1].upper()])
    return int(s)


def _plan(reader, max_tensors: int, max_size: int) -> list[list[str]]:
    """Greedy contiguous partition of the tensor list (reference semantics:
    first shard may hold 0 tensors only with --no-tensor-first-split, which we
    don't replicate; every shard here is non-empty)."""
    shards: list[list[str]] = [[]]
    size = 0
    for name, info in reader.tensors.items():
        cur = shards[-1]
        over_n = max_tensors and len(cur) >= max_tensors
        over_s = max_size and cur and size + info.nbytes > max_size
        if over_n or over_s:
            shards.append([])
            size = 0
            cur = shards[-1]
        cur.append(name)
        size += info.nbytes
    return shards


def do_split(src: str, prefix: str, max_tensors: int, max_size: int):
    with GGUFReader(src) as r:
        if int(r.metadata.get(ShardedGGUFReader.SPLIT_COUNT, 0)) >= 2:
            raise SystemExit(f"{src}: already a split shard")
        plan = _plan(r, max_tensors, max_size)
        count = len(plan)
        if count < 2:
            raise SystemExit("split would produce a single shard; lower "
                             "--split-max-tensors / --split-max-size")
        for no, names in enumerate(plan):
            w = GGUFWriter(split_path(prefix, no, count))
            if no == 0:
                for k, v in r.metadata.items():
                    if k not in _SPLIT_KEYS:
                        w.add(k, v)
            w.add(ShardedGGUFReader.SPLIT_NO, np.uint16(no))
            w.add(ShardedGGUFReader.SPLIT_COUNT, np.uint16(count))
            w.add(ShardedGGUFReader.SPLIT_TENSORS_COUNT,
                  len(r.tensors), GGUFValueType.INT32)
            for name in names:
                info = r.tensors[name]
                w.add_tensor_raw(name, info.shape, info.ggml_type,
                                 r.tensor_raw(name))
            w.write()
            print(f"wrote {split_path(prefix, no, count)} "
                  f"({len(names)} tensors)")


def do_merge(first_shard: str, dst: str):
    with ShardedGGUFReader(first_shard) as r:
        if len(r.shards) < 2:
            raise SystemExit(f"{first_shard}: not a split shard set")
        w = GGUFWriter(dst)
        for k, v in r.metadata.items():
            if k not in _SPLIT_KEYS:
                w.add(k, v)
        for name, info in r.tensors.items():
            w.add_tensor_raw(name, info.shape, info.ggml_type,
                             r.tensor_raw(name))
        w.write()
        print(f"wrote {dst} ({len(r.tensors)} tensors from "
              f"{len(r.shards)} shards)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--split", action="store_true")
    mode.add_argument("--merge", action="store_true")
    ap.add_argument("--split-max-tensors", type=int, default=0)
    ap.add_argument("--split-max-size", type=_parse_size, default=0)
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    if args.split:
        if not (args.split_max_tensors or args.split_max_size):
            args.split_max_tensors = 128  # reference default
        do_split(args.input, args.output, args.split_max_tensors,
                 args.split_max_size)
    else:
        do_merge(args.input, args.output)


if __name__ == "__main__":
    main()
