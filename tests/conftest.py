# coding: utf-8
"""Test configuration.

Two tiers:

* default — CPU backend with 8 virtual devices, so multi-chip sharding is
  exercised without TPU hardware. The flags must be set before the first
  backend use (jax itself may already be imported by the environment).
* ``SEMI_TPU_TESTS=1`` — the real-TPU tier: the backend is left as the
  environment provides it (the axon TPU tunnel on this image) and ONLY
  tests marked ``@pytest.mark.tpu`` run; the CPU suite is skipped. Usage:

      SEMI_TPU_TESTS=1 python -m pytest tests/ -q

  The full-scale methylium parity gate additionally wants
  ``SEMI_FULL_PARITY=1`` (50k trajectories x 2000 steps — minutes on one
  chip, impractical on CPU).
"""

import os

TPU_TIER = os.environ.get("SEMI_TPU_TESTS") == "1"

if TPU_TIER:
    # remote compiles are 30-300 s without the persistent cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
else:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if TPU_TIER:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
else:
    # JAX_PLATFORMS=cpu as an env var is overridden by this image's
    # sitecustomize; the config update is not.
    jax.config.update("jax_platforms", "cpu")
    # NO persistent compilation cache on the CPU tier: the suite crashed
    # reproducibly inside the cache's executable (de)serialization (see
    # semiclassical_tpu.hostcache.disable_persistent_cache)
    import sys as _sys
    import pathlib as _pathlib
    _sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
    from semiclassical_tpu.hostcache import disable_persistent_cache
    disable_persistent_cache()
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

# Reference test fixtures (fchk files, sGDML model, QM correlation tables).
# Preferred source: the read-only reference checkout when mounted (or
# SEMI_REF_DATA). Fallback: the vendored trimmed tree tests/data/refdata
# (built by scripts/vendor_fixtures.py), which makes the suite
# self-contained — only the torch-parity tests, which need the reference
# *code*, still skip without the mount.
REF_DATA = pathlib.Path(
    os.environ.get("SEMI_REF_DATA", "/root/reference/tests/DATA")
)
VENDORED_DATA = pathlib.Path(__file__).parent / "data" / "refdata"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled programs between test modules on the CPU tier.

    The full suite accumulates thousands of distinct XLA CPU executables
    in one process; past a threshold the NEXT compilation segfaults
    inside XLA (observed deterministically at ~96% of the r5 suite in
    test_sharding's WM scan, while any subset of the suite passes — the
    same class of in-process compiler-state fragility as the r4
    persistent-cache crashes, hostcache.py). Recompiles within a module
    are cheap on CPU; between-module clearing keeps the live-executable
    count bounded."""
    yield
    if not TPU_TIER:
        jax.clear_caches()


@pytest.fixture(scope="session")
def ref_data():
    if REF_DATA.is_dir():
        return REF_DATA
    if VENDORED_DATA.is_dir():
        return VENDORED_DATA
    pytest.skip(f"neither {REF_DATA} nor the vendored fixture tree "
                f"{VENDORED_DATA} is available")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU tier — run with SEMI_TPU_TESTS=1 (real chip required)")
    skip_cpu = pytest.mark.skip(
        reason="CPU suite is skipped under SEMI_TPU_TESTS=1")
    skip_parity = pytest.mark.skip(
        reason="full-scale parity gate — additionally set SEMI_FULL_PARITY=1")
    full_parity = os.environ.get("SEMI_FULL_PARITY") == "1"
    for item in items:
        is_tpu = "tpu" in item.keywords
        if is_tpu and not TPU_TIER:
            item.add_marker(skip_tpu)
        elif not is_tpu and TPU_TIER:
            item.add_marker(skip_cpu)
        if "full_parity" in item.keywords and not full_parity:
            item.add_marker(skip_parity)
