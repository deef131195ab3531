import sys, os
sys.path.insert(0, ".")
import bench
from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B
lat = bench.measure_latency()
r = bench.bench_longctx(TINYLLAMA_1_1B, lat, "q4_k", page_size=int(os.environ.get("SWEEP_P","0")))
print("CFG", os.environ.get("SWEEP_TAG"), r)
