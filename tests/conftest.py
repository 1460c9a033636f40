# coding: utf-8
"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding is exercised without TPU hardware. The flags must be set before the
first backend use (jax itself may already be imported by the environment).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

# Reference test fixtures (fchk files, sGDML model, QM correlation tables).
# These are *data* files read directly from the read-only reference checkout;
# tests that need them skip when the directory is absent.
REF_DATA = pathlib.Path(
    os.environ.get("SEMI_REF_DATA", "/root/reference/tests/DATA")
)


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.is_dir():
        pytest.skip(f"reference data directory {REF_DATA} not available")
    return REF_DATA
