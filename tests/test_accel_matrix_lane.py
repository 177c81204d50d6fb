"""pytest entry for the acceleration-matrix lane: one test per config,
each running the full block golden-vector suite (repo jig + reference
shipped-vector replay) in a subprocess under that config's env.

Selected ONLY with ``pytest -m accel_matrix`` (auto-skipped otherwise —
the lane re-runs the whole block suite 5x, which is a CI lane of its own,
exactly like the reference's 8-combination matrix job).
"""

import pytest

from tests.run_accel_matrix import CONFIGS, FULL_TARGETS, run_config


@pytest.mark.accel_matrix
@pytest.mark.parametrize("config", list(CONFIGS))
def test_accel_matrix_config(config):
    rec = run_config(config, FULL_TARGETS)
    assert rec["rc"] == 0, rec
    assert rec["failed"] == 0 and rec["passed"] > 100, rec
