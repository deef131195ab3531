"""Mesh + sharding rules (GSPMD).

TPU-native counterpart of the reference's multi-device machinery
(split-mode row/layer `gpttype_adapter.cpp:1892`, CUDA split buffers
`ggml-cuda.cu:1883-1913`, RPC scale-out `ggml-rpc.cpp`): instead of manual
row-splits + peer copies, weights and KV get NamedShardings over a device mesh
and XLA inserts the ICI collectives.

Axes:
  dp — data/batch parallel (independent sequences)
  tp — tensor parallel (attention heads / ffn rows, Megatron-style)
Weights: wq/wk/wv/w_gate/w_up/output shard the out-dim over tp; wo/w_down the
in-dim (contraction -> psum over tp). KV cache shards heads over tp, batch
over dp. sp (sequence/ring) and ep (expert) axes land with the paged engine.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.linear import QTensor


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None, devices=None,
              ep: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    n = len(devices)
    if ep:
        # 3-axis mesh for routed expert parallelism (ops/moe.py): experts
        # over ep, attention/dense weights over tp, sequences over dp
        if dp is None or tp is None:
            tp = tp or max(1, n // ep)
            dp = n // (tp * ep)
        return Mesh(np.asarray(devices).reshape(dp, tp, ep),
                    ("dp", "tp", "ep"))
    if dp is None or tp is None:
        # favor tp (decode is latency-bound; TP over ICI is the win)
        tp = tp or min(n, 8)
        while n % tp:
            tp //= 2
        dp = n // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


# which param keys shard which way
_ROW_SHARDED = {"wq", "wk", "wv", "wqkv", "w_gate", "w_up", "w_gateup",
                "output"}  # out-dim over tp
_COL_SHARDED = {"wo", "w_down"}  # in-dim over tp (psum on output)
_REPLICATED = {"attn_norm", "ffn_norm", "output_norm", "tok_embd",
               "bq", "bk", "bv", "ffn_gate_inp"}
# MoE expert stacks (E, F, C): expert axis over tp — expert parallelism; the
# dense-EP combine (models/llama.py _moe_ffn) psums across tp automatically
_EXPERT_SHARDED = {"ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"}


def _qt_spec(qt: QTensor, axis: int) -> dict[str, P]:
    """PartitionSpec for each array inside a QTensor, sharding the logical
    `axis` (0=out rows, 1=in cols) over tp.  Fields named `*_t` are
    lane-transposed (in-group, out-row) sidecars (ops/linear.py pack_q4_k),
    so their dims swap."""
    specs = {}
    for name, arr in qt.data.items():
        nd = getattr(arr, "ndim", 0)
        transposed = name.endswith(("_t", "_pt")) and nd == 2
        if axis == 0:
            # out-dim is axis 0 of every packed field (last axis if _t)
            if transposed:
                specs[name] = P(None, "tp")
            else:
                specs[name] = P("tp") if nd == 1 else P("tp", *([None] * (nd - 1)))
        else:
            # in-dim is the last axis of every packed field (axis 0 if _t)
            if transposed:
                specs[name] = P("tp", None)
            else:
                specs[name] = P(*([None] * (nd - 1)), "tp") if nd >= 1 else P()
    return specs


def _shard_qtensor(qt: QTensor, mesh: Mesh, axis: int | None) -> QTensor:
    data = {}
    tp = mesh.shape["tp"]
    if qt.kind == "iq2p" and axis == 1:
        # iq2p's sign sidecar packs GLOBAL plane halves per byte (bit j =
        # position e, bit 4+j = e + C/8), so an in-dim shard of sg is not a
        # self-consistent sub-tensor — replicate these (wo/w_down) for now
        axis = None
    if axis is None:
        for name, arr in qt.data.items():
            data[name] = jax.device_put(arr, NamedSharding(mesh, P()))
    else:
        specs = _qt_spec(qt, axis)
        for name, arr in qt.data.items():
            spec = specs[name]
            # replicate arrays whose sharded dim doesn't divide the tp axis
            # (tiny scale sidecars of small layers)
            dim = next((i for i, s in enumerate(spec) if s == "tp"), None)
            if dim is not None and arr.shape[dim] % tp:
                spec = P()
            data[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return QTensor(kind=qt.kind, shape=qt.shape, data=data)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a model params pytree onto the mesh with TP shardings."""
    def place(key: str, v: Any) -> Any:
        if isinstance(v, QTensor):
            if key in _EXPERT_SHARDED:
                # dedicated ep axis (routed EP, ops/moe.py) when the mesh has
                # one; otherwise the dense-EP expert-over-tp scheme
                ax = "ep" if "ep" in mesh.axis_names else "tp"
                w = v.data.get("w")
                if w is not None and w.ndim == 3 and w.shape[0] % mesh.shape[ax] == 0:
                    return QTensor(kind=v.kind, shape=v.shape, data={
                        "w": jax.device_put(w, NamedSharding(mesh, P(ax, None, None)))})
                return _shard_qtensor(v, mesh, None)
            if key in _ROW_SHARDED:
                return _shard_qtensor(v, mesh, 0)
            if key in _COL_SHARDED:
                return _shard_qtensor(v, mesh, 1)
            return _shard_qtensor(v, mesh, None)
        return jax.device_put(v, NamedSharding(mesh, P()))

    out: dict = {}
    for k, v in params.items():
        if k == "layers":
            out["layers"] = [
                {lk: place(lk, lv) for lk, lv in layer.items()} for layer in v
            ]
        else:
            out[k] = place(k, v)
    return out


def _qt_spec_stacked(qt: QTensor, axis: int) -> dict[str, P]:
    """_qt_spec for layer-STACKED QTensor fields (leading L axis replicated,
    the logical out/in dim sharded over tp) — the config-5 70B scan-serving
    layout: lax.scan over layers with every stage TP-sharded."""
    specs = {}
    for name, arr in qt.data.items():
        nd = getattr(arr, "ndim", 0)
        transposed = name.endswith(("_t", "_pt")) and nd == 3
        if axis == 0:
            if transposed:
                specs[name] = P(None, None, "tp")
            else:
                specs[name] = P(None, "tp", *([None] * max(0, nd - 2)))
        else:
            if transposed:
                specs[name] = P(None, "tp", None)
            else:
                specs[name] = P(*([None] * (nd - 1)), "tp")
    return specs


def shard_params_stacked(params: dict, mesh: Mesh) -> dict:
    """TP-shard a stack_layers() pytree: the same row/col rules as
    shard_params with the leading layer axis replicated (the 70B-class
    scan-decode serving path, BASELINE config 5)."""
    rep = NamedSharding(mesh, P())
    tp = mesh.shape["tp"]

    def place_stacked(key: str, v: Any) -> Any:
        if not isinstance(v, QTensor):
            return jax.device_put(v, rep)
        axis = 0 if key in _ROW_SHARDED else (1 if key in _COL_SHARDED
                                              else None)
        if axis is None:
            data = {n: jax.device_put(a, rep) for n, a in v.data.items()}
            return QTensor(kind=v.kind, shape=v.shape, data=data)
        specs = _qt_spec_stacked(v, axis)
        data = {}
        for name, arr in v.data.items():
            spec = specs[name]
            dim = next((i for i, sp in enumerate(spec) if sp == "tp"), None)
            if dim is not None and arr.shape[dim] % tp:
                spec = P()
            data[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        return QTensor(kind=v.kind, shape=v.shape, data=data)

    out: dict = {}
    for k, v in params.items():
        if k == "layers_stacked":
            out[k] = {lk: place_stacked(lk, lv) for lk, lv in v.items()}
        elif k == "layers":
            out[k] = v
        elif isinstance(v, QTensor):
            out[k] = _shard_qtensor(
                v, mesh, 0 if k in _ROW_SHARDED else None)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache layer buffer: batch over dp, heads over tp. Fused (B, S, H*D)
    leaves shard the fused axis over tp — head-major fusion means equal tp
    chunks hold whole heads, identical to sharding the head axis."""
    return NamedSharding(mesh, P("dp", None, "tp"))


def shard_cache(cache, mesh: Mesh):
    from ..kv.cache import KVCache, _is_layers

    if _is_layers(cache.k):
        def put(x):
            spec = (P("dp", None, "tp") if x.ndim == 3
                    else P("dp", None, "tp", None))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return KVCache(k=tuple(put(x) for x in cache.k),
                       v=tuple(put(x) for x in cache.v),
                       heads=getattr(cache, "heads", None))
    s5 = NamedSharding(mesh, P(None, "dp", None, "tp", None))
    return KVCache(k=jax.device_put(cache.k, s5), v=jax.device_put(cache.v, s5))


def token_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
