"""Multi-host serving topology.

TPU-native counterpart of the reference's RPC scale-out
(/root/reference/ggml/src/ggml-rpc.cpp + examples/rpc): instead of shipping
cgraphs to remote devices over TCP per step, all hosts join one
jax.distributed runtime; weights/KV shard over the global mesh (ICI within a
slice, DCN across slices) and XLA emits the collectives. The HTTP API runs on
host 0; follower hosts execute the same jitted computations via SPMD — every
host calls the same step functions in lockstep, driven by a tiny broadcast of
the host-0 request state (multihost_utils.broadcast_one_to_all).

Single-host mesh works identically (n_hosts == 1), which is how this module
is exercised in CI; real multi-host needs `--coordinator` on every process.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .sharding import make_mesh


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
    process runs the same step sequence (SPMD lockstep)."""
    from jax.experimental import multihost_utils

    arr = np.frombuffer(obj_bytes.ljust(64 * 1024, b"\0"), dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(arr)
    return bytes(out).rstrip(b"\0")
