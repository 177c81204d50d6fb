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
