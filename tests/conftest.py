from __future__ import annotations

import pytest

from mapreduce_rs_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Modest local parallelism: JVM startup dominates at sf0.001, and 8
    # threads keep task-scheduling overhead below the tiny task runtimes.
    spark = get_spark("tests", **{"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
