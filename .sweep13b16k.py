import os, sys
os.environ["KCPP_BENCH_MODEL"] = "13b"
sys.path.insert(0, ".")
import bench
from koboldcpp_tpu.models.synthetic import LLAMA2_13B
lat = bench.measure_latency()
r = bench.bench_longctx(LLAMA2_13B, lat, "q4_k", S=16384, prefix="13b_16k", quant="q4")
print("CFG", os.environ.get("SWEEP_TAG"), r, flush=True)
