from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plume_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="plume-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": str(4 * 1024 * 1024)},
    )
    yield s
    s.stop()
