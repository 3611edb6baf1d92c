from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from arion_spark import get_spark  # noqa: E402
from arion_spark.transcripts import TRANSCRIPT_SCHEMA, py_rows  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "arion_spark_tests",
        cpus=8,
        extra_conf={
            "spark.driver.memory": "8g",
            # run EVERY streaming test (soak, restart, CEP, rollup) against
            # the state store a real cluster uses, not the default
            # HDFS-backed one — checkpoint/restart guarantees are proven
            # under RocksDB
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_rows():
    return py_rows()


@pytest.fixture(scope="session")
def transcripts_df(spark, fixture_rows):
    return spark.createDataFrame(fixture_rows, schema=TRANSCRIPT_SCHEMA)
