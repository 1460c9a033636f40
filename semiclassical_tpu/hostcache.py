# coding: utf-8
"""Machine-keyed persistent-compilation-cache location for CPU runs.

XLA:CPU ahead-of-time executables embed the compile host's SIMD feature
set; loading a cached entry produced on a different machine type is at
best a loader warning ("Machine type used for XLA:CPU compilation
doesn't match the machine type for execution. ... could lead to
execution errors such as SIGILL") and at worst a hard crash — observed
as a reproducible SIGSEGV inside
``jax._src.compilation_cache.get_executable_and_time`` when this
repository's CPU test tier hit entries cached by a previous host with a
larger AVX-512/AMX feature set.

JAX's cache key does not currently include the host machine type, so
the entries are *reachable* across hosts. The remedy here is to key the
cache DIRECTORY by the CPU flag set: every machine type gets its own
warm cache, and stale cross-host entries become unreachable instead of
fatal. TPU caches are unaffected (device executables do not embed host
SIMD features) and keep their shared location.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["cpu_machine_cache_dir", "use_cpu_machine_cache"]


def cpu_machine_cache_dir(base: str = "/root/.jax_cache_cpu") -> str:
    """`base`_<12-hex digest of the sorted /proc/cpuinfo flag set>."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = hashlib.sha1(flags.encode()).hexdigest()[:12]
    return f"{base}_{key}"


def use_cpu_machine_cache(base: str = "/root/.jax_cache_cpu") -> str:
    """Point jax's persistent cache at the machine-keyed CPU directory
    (call before the first compilation; returns the directory)."""
    import jax

    d = cpu_machine_cache_dir(base)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return d


def disable_persistent_cache() -> None:
    """Turn the persistent compilation cache off entirely.

    Long-lived CPU processes (the full test suite: hundreds of compiled
    programs in one process) crashed REPRODUCIBLY inside the cache
    machinery at the same test — once SIGSEGV in
    ``get_executable_and_time`` (executable deserialize), once SIGABRT
    in ``put_executable_and_time`` (executable serialize) after the
    machine-keyed directory quarantined the first crash's entry. The
    same test passes standalone, so the trigger is accumulated process
    state, not the program itself; with the cache disabled the whole
    serialize/deserialize surface is gone. CPU compiles are local and
    cheap relative to the suite's physics gates; TPU processes (remote
    30-300 s compiles) keep the persistent cache."""
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
