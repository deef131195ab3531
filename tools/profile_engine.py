"""Instrument the BatchedEngine tick loop: where does wall time go during
an 8-slot greedy batch?  Wraps the hot methods with accumulating timers.
Usage: python tools/profile_engine.py [max_len] [burst]
"""
import os
import sys
import time
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if len(sys.argv) > 2:
    os.environ["KCPP_BURST_TICKS"] = sys.argv[2]

import numpy as np

from koboldcpp_tpu.engine.batch_engine import BatchedEngine
from koboldcpp_tpu.engine.engine import GenParams
from koboldcpp_tpu.models.loader import Model
from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params
from koboldcpp_tpu.sampling.samplers import SamplerParams
from koboldcpp_tpu.tokenizers import Tokenizer
from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

MAXLEN = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = TINYLLAMA_1_1B
params = synthetic_params(cfg, kind="q4_k", seed=0)
md = {"tokenizer.ggml.model": "gpt2",
      "tokenizer.ggml.tokens": [f"tok{i}" for i in range(cfg.vocab_size)],
      "tokenizer.ggml.token_type": np.full(cfg.vocab_size, 1, np.int32),
      "tokenizer.ggml.bos_token_id": np.uint32(1),
      "tokenizer.ggml.eos_token_id": np.uint32(2),
      "tokenizer.ggml.add_bos_token": False}
model = Model(cfg, params, Tokenizer(vocab_from_metadata(md)))
eng = BatchedEngine(model, max_context=512, n_slots=8)

acc = {}
counts = {}


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        counts[name] = counts.get(name, 0) + 1
        return r
    return inner


eng._decode_step = wrap("decode_step", eng._decode_step)
eng._prefill_chunk = wrap("prefill_chunk", eng._prefill_chunk)
eng._emit_sampled = wrap("emit", eng._emit_sampled)
eng._tick = wrap("tick", eng._tick)
eng._admit = wrap("admit", eng._admit)
eng._burst_steps_greedy = wrap("burst_dispatch", eng._burst_steps_greedy)
eng._greedy_forward = wrap("single_step_fwd", eng._greedy_forward)
eng._chain_or_drain = wrap("chain_or_drain", eng._chain_or_drain)
eng._emit_burst = wrap("emit_burst", eng._emit_burst)

_np_asarray = np.asarray
import koboldcpp_tpu.engine.batch_engine as _be
def _timed_asarray(x, *a, **k):
    t0 = time.perf_counter()
    r = _np_asarray(x, *a, **k)
    acc["np_pull"] = acc.get("np_pull", 0.0) + time.perf_counter() - t0
    counts["np_pull"] = counts.get("np_pull", 0) + 1
    return r
_be.np.asarray = _timed_asarray


def run_batch():
    greedy = GenParams(max_length=MAXLEN, bypass_eos=True,
                       sampler=SamplerParams(temperature=0.0, rep_pen=1.0))
    results = [None] * 8

    def worker(i):
        results[i] = eng.generate([1, 5 + i, 9], greedy)

    t0 = time.perf_counter()
    ths = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.perf_counter() - t0
    return sum(len(r.tokens) for r in results) / dt, dt


run_batch()  # warm
for d in (acc, counts):
    d.clear()
tps, dt = run_batch()
print(f"burst={os.environ.get('KCPP_BURST_TICKS', '8')} max_len={MAXLEN} "
      f"tps={tps:.0f} wall={dt*1e3:.0f}ms")
tick_total = acc.get("tick", 0)
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"  {k:14s} {acc[k]*1e3:8.1f} ms  x{counts[k]}")
print(f"  outside tick  {(dt - tick_total)*1e3:8.1f} ms")
eng.shutdown()
