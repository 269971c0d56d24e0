from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA}/sf0.001"
SF_MED = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from idr_data_pipelines_spark.session import get_spark

    s = get_spark(
        app_name="idr-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/idr_test_warehouse",
            "spark.driver.memory": "4g",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "plan_gate: registry-wide physical-plan lint sweep (slow; "
        "deselect with -m 'not plan_gate')",
    )
    config.addinivalue_line(
        "markers",
        "map_sweep: uncapped single-process oracle memory sweep of the "
        "staged driver window (slow; deselect with -m 'not map_sweep')",
    )
