import os, sys
os.environ["KCPP_BENCH_MODEL"] = "13b"   # triggers scoped-vmem env at import
extra = os.environ.get("SWEEP_FLAGS", "")
if extra:
    os.environ["LIBTPU_INIT_ARGS"] = (
        "--xla_tpu_scoped_vmem_limit_kib=65536 " + extra)
sys.path.insert(0, ".")
import bench
from koboldcpp_tpu.models.synthetic import LLAMA2_13B
lat = bench.measure_latency()
r = {}
r.update(bench.bench_longctx(LLAMA2_13B, lat, "q4_k", S=16384,
                             prefix="13b_16k", quant="q4"))
print("CFG", os.environ.get("SWEEP_TAG"), r, flush=True)
r2 = bench.bench_longctx(LLAMA2_13B, lat, "q4_k", S=8192, prefix="13b_8k")
print("CFG", os.environ.get("SWEEP_TAG"), r2, flush=True)
