"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(luaradio_tpu.parallel) is exercised without TPU hardware — the analog of
the reference's acceleration-matrix CI, which runs the same golden vectors
under every backend (/root/reference/.github/workflows/tests.yml:96-105).

Note: the environment's sitecustomize registers the TPU plugin and forces
jax_platforms, so the config must be updated after import, not via env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: spawns subprocesses / long-running scenarios")
    config.addinivalue_line(
        "markers", "accel_matrix: full-suite sweep lane, select with -m")


def pytest_collection_modifyitems(config, items):
    """accel_matrix lane tests run only when explicitly selected with -m:
    each re-runs the whole block suite under one acceleration config."""
    expr = config.getoption("-m") or ""
    if "accel_matrix" in expr:
        return
    import pytest as _pytest
    skip = _pytest.mark.skip(
        reason="accel-matrix lane: run with `pytest -m accel_matrix` "
               "(or tests/run_accel_matrix.py)")
    for item in items:
        if "accel_matrix" in item.keywords:
            item.add_marker(skip)
