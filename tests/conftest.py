from __future__ import annotations

import pytest

from watchman_spark.session import get_spark
from watchman_spark.synth import SynthParams


@pytest.fixture(scope="session")
def spark():
    s = get_spark("watchman-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
    })
    yield s
    s.stop()


# Small deterministic fixture: ~3.3k turns, hot conv0 ~600 turns vs median ~6
# (skew still >50x median so the salted path is genuinely exercised).
TEST_PARAMS = SynthParams(seed=42, n_convs=200, C=1200, hot_cap=600)


@pytest.fixture(scope="session")
def params():
    return TEST_PARAMS
