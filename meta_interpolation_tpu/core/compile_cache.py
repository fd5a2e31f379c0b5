"""Persistent XLA compilation cache.

Compiles on this setup go through a remote-compile tunnel (axon) and cost
100-260 s for full models; JAX's persistent cache turns every repeat
compile into a disk read (measured: 1.0 s → 0.02 s for a toy program,
works with the axon backend). Enabled by the CLI, bench.py,
__graft_entry__, and the test conftest.

Env overrides: ``MIT_JAX_CACHE_DIR`` sets the directory, ``MIT_JAX_CACHE=0``
disables.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/meta_interpolation_tpu/xla")


def _machine_tag() -> str:
    """Fingerprint of this machine's CPU for the cache-dir suffix.

    The cache holds CPU AOT entries; entries compiled on a machine with a
    different CPU feature set error on every load after a machine swap
    (measured: 62 ``cpu_aot_loader`` feature-mismatch errors per run,
    which also stretched the test suite 12 -> 27 min). Keying the cache
    dir by (arch, CPU model, feature flags) makes a swap start a fresh
    cache instead of poisoning every future compile (VERDICT r4 item 1)."""
    import hashlib
    import platform

    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) >= 4:
                        break
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the cache dir, or None when disabled via MIT_JAX_CACHE=0.
    """
    if os.environ.get("MIT_JAX_CACHE", "1") == "0":
        return None
    import jax

    cache_dir = (cache_dir or os.environ.get("MIT_JAX_CACHE_DIR")
                 or os.path.join(_DEFAULT_DIR, _machine_tag()))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # everything is worth caching here: even small programs pay the
    # remote-compile round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
