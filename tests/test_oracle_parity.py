"""Every oracle-checkable registry query vs DuckDB at sf0.001 — the local
replica of the driver's t2 correctness gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.plans.registry import QUERIES, queries
from tests.parity import assert_frames_match, run_oracle

ORACLED = sorted(name for name, spec in QUERIES.items() if spec.oracle is not None)
DRIVER_FORM = queries()  # operator + presentation sort, what the driver runs


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = DRIVER_FORM[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(QUERIES[name].oracle, sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            assert spec.fn(spark, sf_dir).count() >= 0, name
