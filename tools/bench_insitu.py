"""Quick in-situ decode/batched-8 bench (the bench.py measurement, minus
served/longctx/engine sections) for kernel A/B iteration.
Usage: [KCPP_SBQ=0|1] python tools/bench_insitu.py [1b|7b]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from koboldcpp_tpu.models.synthetic import LLAMA2_7B, TINYLLAMA_1_1B

cfg = LLAMA2_7B if (len(sys.argv) > 1 and sys.argv[1] == "7b") \
    else TINYLLAMA_1_1B
latency = bench.measure_latency()
r = bench.bench_model(cfg, latency, os.environ.get("KCPP_BENCH_KIND", "q4_k"),
                      scan=False)
keys = ("first_call_s", "decode_tps", "decode_compile_s",
        "batched_decode_tps_8slots", "pct_streamed_roofline")
print({k: r.get(k) for k in keys}, "SBQ=", os.environ.get("KCPP_SBQ", "1"))
