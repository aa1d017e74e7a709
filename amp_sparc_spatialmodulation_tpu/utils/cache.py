"""Persistent XLA compilation cache.

The remote-TPU tunnel in this environment recompiles every program per
process and intermittently wedges compiles for 10+ minutes.  JAX's
persistent compilation cache works through the tunnel (measured: a 52 s
compile replays in 0.5 s from a fresh process), so every TPU-facing entry
point enables it — sweeps, bench, and the driver's compile checks become
immune to compile-time tunnel weather after first touch.
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent).

    Must be called before the first compilation; safe to call any time.
    """
    import jax

    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.environ.get("JAX_CACHE_DIR",
                                   os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
