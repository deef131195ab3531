"""Persistent XLA compilation cache.

The unrolled decode loops compile in minutes on first use (the reference has
no compile step at all — gpttype_load_model is ready after weight load), so
every entry point enables jax's persistent cache: server restarts and bench
reruns then reuse compiled executables from disk and 'load -> first token'
drops from minutes to seconds.

The cache directory is keyed by a HOST CPU-FEATURE FINGERPRINT: XLA:CPU
entries are AOT machine code compiled for the producing machine's ISA
features, and jax's own cache key does not cover them — loading an entry
written by a different machine class warns "could lead to execution errors
such as SIGILL" and has produced a real segfault in serving (observed when a
home-dir cache migrated across machines). Different hosts therefore get
disjoint subdirectories automatically.

Env: KCPP_COMPILE_CACHE=0 disables; KCPP_COMPILE_CACHE=<dir> overrides the
default ~/.cache/koboldcpp_tpu/jax (the fingerprint subdir still applies).
"""
from __future__ import annotations

import hashlib
import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "koboldcpp_tpu",
                        "jax")
_done = False


def _host_fingerprint() -> str:
    """Short stable hash of the CPU feature set (ISA compatibility class)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(
        f"{platform.machine()}-{platform.processor()}".encode()
    ).hexdigest()[:12]


def enable_compile_cache() -> str | None:
    """Idempotently point jax at the on-disk compilation cache.

    Returns the cache dir, or None when disabled/unavailable."""
    global _done
    val = os.environ.get("KCPP_COMPILE_CACHE", "")
    if val == "0":
        return None
    base = val if val and val != "1" else _DEFAULT
    path = os.path.join(base, _host_fingerprint())
    if _done:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time (default 1.0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _done = True
        return path
    except Exception:  # pragma: no cover - best effort, never fatal
        return None
