"""Bucketed co-located join: the write-once-shuffle-never pattern.
The assertion that matters: NO shuffle Exchange above either scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.sources.bucketing import bucketed_join, write_bucketed
from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # Disable broadcast so the test exercises the bucketed merge path,
    # not a broadcast shortcut.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", 4)
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey", 4
    )
    yield "lineitem_b", "orders_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ("l_orderkey", "o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ("l_orderkey", "o_orderkey"))
    plain = load_table(spark, sf_dir, "lineitem").join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_revenue_join_single_exchange(spark, sf_dir, bucketed_tables):
    """The headline-join rescue (round-3 verdict ask #7): with
    pre-bucketed facts, join_revenue_by_nation's ONLY exchange is the
    tiny nation-keyed aggregate — the lineitem ⋈ orders edge runs as a
    co-located SortMergeJoin straight off the bucket files."""
    from mapreduce_rs_spark.operators.relational import (
        join_revenue_by_nation,
        join_revenue_by_nation_bucketed,
    )
    from mapreduce_rs_spark.sources.catalog import load_tables

    li_b, o_b = bucketed_tables
    t = load_tables(spark, sf_dir)
    df = join_revenue_by_nation_bucketed(t, spark.table(li_b), spark.table(o_b))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan  # the agg only
    assert "Exchange rangepartitioning" not in plan
    # Spark 4 removed bucketed-scan output ordering, so the SMJ keeps
    # per-partition IN-MEMORY sorts above the scans (no exchange — the
    # network cost is what bucketing eliminates). Pin that both fact
    # scans read bucketed and no exchange sits between scan and join.
    assert plan.count("Bucketed: true") == 2, plan

    # Row-identical to the unbucketed operator.
    rows_b = {(r["r_name"], r["n_name"]): (r["revenue"], r["n_items"]) for r in df.collect()}
    rows_p = {
        (r["r_name"], r["n_name"]): (r["revenue"], r["n_items"])
        for r in join_revenue_by_nation(t).collect()
    }
    assert rows_b == rows_p
