"""Shared harness bits for the ad-hoc TPU measurement tools.

Timing convention: `jax.block_until_ready` returns early on the axon
remote-PJRT backend (PERF.md "What we learned"), so every measurement
chains a small `jax.device_get` VALUE FETCH through the computation —
never block_until_ready.
"""

from __future__ import annotations

import os
import time

# the env-var fallback must be visible before jax initializes its config
_CACHE = os.path.expanduser("~/.cache/stp_xla_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax  # noqa: E402


def enable_compile_cache() -> None:
    """Persistent XLA compile cache (cold compiles through the axon
    remote-compile tunnel cost minutes)."""
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob — env var already set above


def timeit(name: str, fn, *args, n: int = 5, width: int = 45) -> float:
    """Warm up once, run ``n`` times, fetch a value to close the chain."""
    out = fn(*args)
    jax.device_get(_probe(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(_probe(out))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:{width}s} {dt:8.2f} ms", flush=True)
    return dt


def _probe(out):
    leaf = jax.tree.leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(min(leaf.ndim, 3)))
    return leaf[idx] if leaf.ndim else leaf
