"""Multi-host serving topology.

TPU-native counterpart of the reference's RPC scale-out
(/root/reference/ggml/src/ggml-rpc.cpp + examples/rpc): instead of shipping
cgraphs to remote devices over TCP per step, all hosts join one
jax.distributed runtime; weights/KV shard over the global mesh (ICI within a
slice, DCN across slices) and XLA emits the collectives. The HTTP API runs on
host 0; follower hosts execute the same jitted computations via SPMD — every
host calls the same step functions in lockstep, driven by a tiny broadcast of
the host-0 request state (multihost_utils.broadcast_one_to_all).

Serving protocol (run_generate / follower_loop): host 0 broadcasts a pickled
op before every engine call; followers replay the identical call. Device
computation is deterministic, and engine outputs (sampled tokens) are
replicated, so every host's python control flow stays in lockstep — the
JAX-native equivalent of the reference shipping each cgraph to rpc-server.

CLI: every process runs `koboldcpp ... --coordinator host0:port
--numprocesses N --processid i`; host 0 serves HTTP, the rest follow.
Exercised by tests/test_multihost.py with 2 CPU processes.
"""
from __future__ import annotations

import pickle
from dataclasses import dataclass

import jax
import numpy as np

from .sharding import make_mesh

# broadcast frame size for serialized ops; requests larger than this are
# chunked (count frame first, then payload frames)
_FRAME = 64 * 1024


@dataclass
class HostTopology:
    n_hosts: int
    host_id: int
    n_devices_global: int
    is_server: bool  # host 0 runs the HTTP API

    @property
    def is_follower(self) -> bool:
        return not self.is_server


def initialize(coordinator: str | None = None, n_hosts: int = 1,
               host_id: int = 0) -> HostTopology:
    """Join (or skip, when single-host) the jax.distributed runtime."""
    if coordinator and n_hosts > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=n_hosts, process_id=host_id)
    return HostTopology(
        n_hosts=jax.process_count(),
        host_id=jax.process_index(),
        n_devices_global=len(jax.devices()),
        is_server=jax.process_index() == 0,
    )


def global_mesh(topo: HostTopology, dp: int | None = None, tp: int | None = None):
    """Mesh over ALL hosts' devices. Default: tp within a host (ICI), dp
    across hosts (DCN) — decode TP collectives stay on the fast fabric."""
    n_local = len(jax.local_devices())
    if dp is None and tp is None:
        tp = n_local
        dp = topo.n_devices_global // tp
    return make_mesh(dp=dp, tp=tp)


def broadcast_request(obj_bytes: bytes) -> bytes:
    """Replicate a serialized request from host 0 to all hosts so every
    process runs the same step sequence (SPMD lockstep). Arbitrary size:
    a length frame first, then as many payload frames as needed."""
    from jax.experimental import multihost_utils

    n = np.array([len(obj_bytes)], dtype=np.int64)
    n = multihost_utils.broadcast_one_to_all(n)
    total = int(n[0])
    nframes = max(1, -(-total // _FRAME))
    padded = obj_bytes.ljust(nframes * _FRAME, b"\0")
    out = bytearray()
    for i in range(nframes):
        arr = np.frombuffer(padded[i * _FRAME:(i + 1) * _FRAME], dtype=np.uint8)
        out += bytes(multihost_utils.broadcast_one_to_all(arr))
    return bytes(out[:total])


# -- serving lockstep -------------------------------------------------------

def _engine_call(engine, op: str, payload: dict):
    if op == "generate":
        from ..engine.engine import GenParams
        from ..sampling import SamplerParams

        params = GenParams(**{**payload["params"],
                              "sampler": SamplerParams(**payload["sampler"])})
        return engine.generate(payload["prompt"], params)
    if op == "reset":
        engine.reset_context()
        return None
    raise ValueError(f"unknown multihost op {op!r}")


def announce_shutdown():
    broadcast_request(pickle.dumps(("shutdown", {})))


def follower_loop(engine):
    """Follower hosts: replay every op host 0 broadcasts until shutdown.
    The engine state (KV cache, context) stays in lockstep with host 0
    because all computation is deterministic SPMD."""
    while True:
        op, payload = pickle.loads(broadcast_request(b""))
        if op == "shutdown":
            return
        _engine_call(engine, op, payload)


class LockstepEngine:
    """Engine wrapper for host 0 under multi-host: broadcasts each generate
    to the followers before running it, so all hosts advance together.

    Determinism requirements for lockstep: a concrete sampler seed is drawn
    on host 0 and broadcast (a per-host random seed would diverge the token
    streams and desync the SPMD collectives), and mid-generation abort is
    disabled (an abort is host-0-local state; stopping early only there
    would leave followers issuing collective ops host 0 never joins)."""

    def __init__(self, engine, topo: HostTopology):
        self._engine = engine
        self._topo = topo

    def generate(self, prompt, params, on_token=None, genkey: str = ""):
        import random

        sampler = dict(params.sampler.__dict__)
        if sampler.get("seed", -1) is not None and sampler.get("seed", -1) < 0:
            sampler["seed"] = random.randrange(2 ** 31)
        pp = {k: v for k, v in params.__dict__.items() if k != "sampler"}
        payload = {
            "prompt": list(prompt) if not isinstance(prompt, str) else prompt,
            "params": pp, "sampler": sampler}
        broadcast_request(pickle.dumps(("generate", payload)))
        result = _engine_call(self._engine, "generate", payload)
        if on_token is not None:  # streamed after the fact (host 0 only)
            for piece in self._engine.stream_tokens:
                on_token(0, piece)
        return result

    def abort(self, genkey: str = ""):
        pass  # see class docstring

    def reset_context(self):
        broadcast_request(pickle.dumps(("reset", {})))
        self._engine.reset_context()

    def __getattr__(self, name):
        return getattr(self._engine, name)
