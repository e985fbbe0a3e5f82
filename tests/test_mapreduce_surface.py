"""The generalized map/reduce UDF surface (reference ops 4 & 10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.mapreduce import map_reduce


@pytest.fixture(scope="module")
def lines_df(spark):
    return spark.createDataFrame(
        [("a b a",), ("b c",), ("a",)], ["value"]
    )


def test_reducer_path(lines_df):
    # Per-key value concatenation — a genuinely non-algebraic reducer.
    def mapper(rec):
        return [(w, w.upper()) for w in rec.split()]

    def reducer(key, values):
        return "|".join(sorted(values))

    out = {r["key"]: r["value"] for r in map_reduce(lines_df, mapper, reducer).collect()}
    assert out == {"a": "A|A|A", "b": "B|B", "c": "C"}


def test_combiner_path_is_jvm_side(lines_df):
    def mapper(rec):
        return [(w, "1") for w in rec.split()]

    df = map_reduce(lines_df, mapper, combiner=F.count("*").cast("string"))
    out = {r["key"]: r["value"] for r in df.collect()}
    assert out == {"a": "3", "b": "2", "c": "1"}
    # The reduce side must be a built-in aggregate (partial agg applies),
    # not a Python UDF stage.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan


def test_explicit_partitioning(lines_df):
    def mapper(rec):
        return [(w, "1") for w in rec.split()]

    df = map_reduce(lines_df, mapper, combiner=F.count("*").cast("string"), num_partitions=4)
    assert df.count() == 3


def test_requires_exactly_one_reduce_spec(lines_df):
    with pytest.raises(ValueError):
        map_reduce(lines_df, lambda r: [], None)
    with pytest.raises(ValueError):
        map_reduce(lines_df, lambda r: [], lambda k, v: "", combiner=F.count("*"))
