"""Routed expert-parallel MoE dispatch (sort-based, static capacity).

TPU-native counterpart of the reference's mul_mat_id row-mapping path
(/root/reference/ggml/src/ggml-cuda.cu:2063-2125): instead of building
per-expert row maps on one device, assignments are bucketed into a static
(E, capacity, C) layout and the expert axis is sharded over the mesh's `ep`
axis — XLA lowers the (tokens -> expert buckets -> tokens) reshardings to
all-to-all-style collectives over ICI. Static shapes keep everything jit-
friendly; overflow past the per-expert capacity drops the assignment
(Switch-Transformer semantics), with capacity sized so inference batches
never overflow by default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _maybe_constrain(x: jnp.ndarray, spec: P) -> jnp.ndarray:
    """Apply a named-sharding constraint when an `ep` mesh is active."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m.empty or "ep" not in m.axis_names:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(m, spec))
    except Exception:
        return x


def dispatch_indices(topi: jnp.ndarray, n_experts: int, capacity: int):
    """Flat destination slot + validity for each (token, k) assignment.

    topi: (N, k) expert ids. Returns (dest (N*k,), valid (N*k,)) where
    dest = expert * capacity + rank-within-expert; assignments ranked past
    the capacity are invalid (dropped)."""
    flat_e = topi.reshape(-1)
    nk = flat_e.shape[0]
    order = jnp.argsort(flat_e, stable=True)
    sorted_e = flat_e[order]
    starts = jnp.searchsorted(sorted_e, jnp.arange(n_experts))
    rank_sorted = jnp.arange(nk) - starts[sorted_e]
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    valid = rank < capacity
    dest = flat_e * capacity + jnp.where(valid, rank, 0)
    return dest, valid


def moe_ffn_ep(xt: jnp.ndarray, topi: jnp.ndarray, topw: jnp.ndarray,
               wg: jnp.ndarray, wu: jnp.ndarray, wd: jnp.ndarray,
               act, capacity: int | None = None,
               capacity_factor: float | None = None) -> jnp.ndarray:
    """Sorted-dispatch gated-FFN MoE.

    xt: (N, C) tokens; topi/topw: (N, k) routing; wg/wu: (E, F, C);
    wd: (E, C, F). Expert-major tensors carry `ep` sharding constraints so
    under an ep mesh each device computes only its experts' buckets.
    """
    N, C = xt.shape
    k = topi.shape[1]
    E = wg.shape[0]
    if capacity is None:
        # per-token top-k experts are distinct, so <= N assignments per
        # expert ever: capacity == N is DROPLESS — exact parity with the
        # reference's mul_mat_id routing under ANY routing skew
        # (ggml-cuda.cu:2063).  A finite capacity_factor opts into
        # Switch-style capped buckets (smaller all-to-all buffers, silent
        # drops under skew) for throughput experiments.
        if capacity_factor is None or capacity_factor <= 0:
            capacity = N
        else:
            capacity = min(N, max(1, int((N * k / E) * capacity_factor
                                         + 0.999)))
    dest, valid = dispatch_indices(topi, E, capacity)

    src = jnp.broadcast_to(xt[:, None], (N, k, C)).reshape(N * k, C)
    safe_dest = jnp.where(valid, dest, E * capacity)  # drop row
    buckets = jnp.zeros((E * capacity, C), xt.dtype).at[safe_dest].set(
        src, mode="drop")
    bx = buckets.reshape(E, capacity, C)
    bx = _maybe_constrain(bx, P("ep", None, None))

    wg = _maybe_constrain(wg, P("ep", None, None))
    wu = _maybe_constrain(wu, P("ep", None, None))
    wd = _maybe_constrain(wd, P("ep", None, None))
    g = jnp.einsum("ekc,efc->ekf", bx, wg, preferred_element_type=jnp.float32)
    u = jnp.einsum("ekc,efc->ekf", bx, wu, preferred_element_type=jnp.float32)
    a = (act(g) * u).astype(xt.dtype)
    d = jnp.einsum("ekf,ecf->ekc", a, wd, preferred_element_type=jnp.float32)
    d = _maybe_constrain(d, P("ep", None, None))
    d = d.reshape(E * capacity, C)

    # combine: gather each assignment's expert output back to its token
    y = d[dest] * (valid[:, None] * topw.reshape(-1)[:, None])
    return y.reshape(N, k, C).sum(axis=1)
