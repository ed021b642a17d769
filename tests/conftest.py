from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running soak/integration tests")


@pytest.fixture(scope="session")
def spark():
    from eirepolitic_data_pipeline_spark.session import get_spark

    spark = get_spark("tests", cores=4)
    yield spark
    spark.stop()
