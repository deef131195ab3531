"""Child process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed runtime and exercises (1) request broadcast, (2) a
TP-sharded matmul whose collective crosses the process boundary (the
DCN-equivalent), (3) engine generation in SPMD lockstep through the
LockstepEngine / follower_loop serving protocol.

Usage: python multihost_child.py <coordinator> <n> <pid> <model.gguf> <outdir>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    coord, n, pid, model_path, outdir = sys.argv[1:6]
    n, pid = int(n), int(pid)

    from koboldcpp_tpu.parallel import multihost

    topo = multihost.initialize(coord, n, pid)
    assert topo.n_hosts == n, topo
    assert topo.n_devices_global == 4 * n

    # (1) broadcast: host 0 sends, followers must receive the same bytes
    # (>1 frame to exercise chunking)
    msg = (b"kcpp-multihost-payload " * 4096) if topo.is_server else b""
    got = multihost.broadcast_request(msg)
    assert got == b"kcpp-multihost-payload " * 4096, len(got)

    # (2) TP matmul across ALL devices (tp spans both processes -> the
    # psum crosses the process boundary, i.e. DCN in production)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from koboldcpp_tpu.parallel import make_mesh

    mesh = make_mesh(dp=1, tp=topo.n_devices_global)
    rng = np.random.default_rng(0)
    w_host = rng.standard_normal((64, 128)).astype(np.float32)
    x_host = rng.standard_normal((4, 64)).astype(np.float32)
    w = jax.make_array_from_callback(
        w_host.shape, NamedSharding(mesh, P(None, "tp")),
        lambda idx: w_host[idx])
    x = jax.make_array_from_callback(
        x_host.shape, NamedSharding(mesh, P()), lambda idx: x_host[idx])

    @jax.jit
    def f(x, w):
        # contraction over the replicated axis; a follow-up contraction over
        # the tp-sharded axis forces a cross-process collective (psum)
        y = x @ w                      # (4, 128) sharded P(None, "tp")
        return y, (y * y).sum()        # scalar: reduces over tp -> psum

    with mesh:
        y, ss = f(x, w)
    ref = x_host @ w_host
    np.testing.assert_allclose(float(ss), float((ref * ref).sum()), rtol=1e-3)
    for shard in y.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data), ref[shard.index],
                                   rtol=1e-4, atol=1e-4)

    # (3) engine lockstep: host 0 drives two generates through the serving
    # protocol; the follower replays them; token streams must match.
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.sampling import SamplerParams

    model = load_model(model_path, packed=False, dtype=jnp.float32)
    eng = Engine(model, max_context=128, cache_dtype=jnp.float32)
    gp = GenParams(max_length=6,
                   sampler=SamplerParams(temperature=0.0, rep_pen=1.0))
    if topo.is_server:
        ls = multihost.LockstepEngine(eng, topo)
        r1 = ls.generate([1, 5, 9], gp)
        r2 = ls.generate([1, 5, 9] + r1.tokens + [7], gp)
        multihost.announce_shutdown()
        toks = r1.tokens + [-1] + r2.tokens
    else:
        multihost.follower_loop(eng)
        # follower ran the same two generates; reconstruct its view
        toks = []
    # cross-check: broadcast host 0's tokens, compare with the follower's
    # replayed engine state (context_tokens reflect both generations)
    import pickle

    host0 = pickle.loads(multihost.broadcast_request(
        pickle.dumps(toks) if topo.is_server else b""))
    if topo.is_follower:
        # the follower's replayed engine must hold host 0's token stream
        tail = host0[host0.index(-1) + 1:]
        if tail:
            assert eng.context_tokens[-len(tail):] == tail, (
                eng.context_tokens, host0)

    with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
        f.write("ok")
    print(f"host {pid}: OK")


if __name__ == "__main__":
    main()
