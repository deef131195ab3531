"""JAX profiler hook (tracing/profiling aux subsystem).

The reference's profiling story is printf timing splits plus llama.cpp perf
counters behind --debugmode (/root/reference/gpttype_adapter.cpp:2467-2470,
SURVEY.md §5.1, which notes the TPU build gets op-level tracing "for free"
via the JAX profiler). This wraps jax.profiler into a start/stop pair the
server exposes at /api/extra/profiler/{start,stop}; traces are
TensorBoard/Perfetto-compatible (xplane) directories.
"""
from __future__ import annotations

import os
import tempfile
import threading

_lock = threading.Lock()
_active_dir: str | None = None


def start(trace_dir: str | None = None) -> str:
    """Begin a profiler trace; returns the trace directory. Raises
    RuntimeError if already tracing."""
    global _active_dir
    import jax

    with _lock:
        if _active_dir is not None:
            raise RuntimeError(f"profiler already tracing to {_active_dir}")
        d = trace_dir or tempfile.mkdtemp(prefix="kcpp_trace_")
        os.makedirs(d, exist_ok=True)
        jax.profiler.start_trace(d)
        _active_dir = d
        return d


def stop() -> dict:
    """End the trace; returns {dir, files} of the captured artifacts."""
    global _active_dir
    import jax

    with _lock:
        if _active_dir is None:
            raise RuntimeError("profiler is not tracing")
        jax.profiler.stop_trace()
        d = _active_dir
        _active_dir = None
    files: list[str] = []
    for root, _, names in os.walk(d):
        for n in names:
            files.append(os.path.relpath(os.path.join(root, n), d))
    return {"dir": d, "files": sorted(files)}


def is_active() -> bool:
    return _active_dir is not None
