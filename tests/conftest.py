from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dublin_smart_city_graphdb_spark.session import get_spark

    # 16g heap: the full suite runs ~280 tests in ONE local-mode JVM
    # (driver = executor = block manager) and accumulates localCheckpoint
    # blocks, cached plans and codegen classes; under the 8g default a
    # loaded box can OOM a daemon thread (observed: dag-scheduler-event-
    # loop dying, wedging every later job forever).
    s = get_spark(
        app_name="pytest",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "16g"},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    from tools.check_oracle import duck_connection

    return duck_connection(SF_DIR)
