"""Skew-rescue regression tests (round-4 verdict #4): the AQE skew-join
split and the salted holistic aggregate, each exercised on a
deliberately hot-keyed table (half the rows on one key) small enough
for CI but skewed enough to trip the tuned thresholds.

The companion MEASURED A/B (10M rows, local[32]) lives in SCALE.md
"Skew rescue A/B"; these tests pin the mechanisms so a Spark upgrade or
conf drift can't silently retire them:

* the skewed SMJ partition is actually SPLIT (plan carries
  ``skew=true`` / ``skewed`` markers) once both join children are bare
  shuffle stages — and, the subtlety the A/B surfaced, an aggregate
  between the exchange and the join DEFEATS OptimizeSkewedJoin because
  its output partitioning already satisfies the join requirement;
* the salted two-phase holistic aggregate is value-identical to the
  single-phase plan it rescues.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.partitioning import salted_group_count

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # CI-sized thresholds: the hot partition is ~MBs, not the 256 MB
    # production default
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    old = {}
    for k, v in SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def hot_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("skew")
    fact_dir, dim_dir = str(base / "fact"), str(base / "dim")
    # 200k rows, ~50% on user 0, spread over 16 input partitions
    fact = (
        spark.range(0, 200_000, 1, 16)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 500)
            .alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    fact.write.parquet(fact_dir)
    spark.range(0, 500).select(
        F.col("id").alias("user_id"),
        F.pmod(F.col("id"), F.lit(7)).alias("segment"),
    ).write.parquet(dim_dir)
    return fact_dir, dim_dir


def _final_plan(df) -> str:
    jdf = df._jdf
    jdf.queryExecution().executedPlan().execute().count()
    return jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark, hot_dirs, skew_confs):
    fact_dir, dim_dir = hot_dirs
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir)
    joined = fact.join(dim, "user_id").select("user_id", "segment", "value")
    plan = _final_plan(joined)
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # the AQEShuffleRead annotation
    # values are unaffected by the split
    assert joined.count() == fact.count()


def test_aggregate_child_defeats_skew_rule(spark, hot_dirs, skew_confs):
    """The documented trap: joining against an aggregate whose output
    partitioning already satisfies the join leaves no bare shuffle
    stage to split — OptimizeSkewedJoin silently does nothing. Pinned
    so the workaround guidance in partitioning.py stays truthful."""
    fact_dir, _ = hot_dirs
    fact = spark.read.parquet(fact_dir)
    dim = fact.groupBy("user_id").agg(F.avg("value").alias("uavg"))
    joined = fact.join(dim, "user_id").select("user_id", "value", "uavg")
    plan = _final_plan(joined)
    assert "SortMergeJoin" in plan
    assert "skew=true" not in plan


def test_salted_holistic_agg_matches_single_phase(spark, hot_dirs):
    """The salted two-phase holistic aggregate (the 1.69x rescue in
    SCALE.md) is value-identical to the single-phase plan: partial
    collect per (key, input-partition salt), merged downstream."""
    fact_dir, _ = hot_dirs
    fact = spark.read.parquet(fact_dir)
    plain = {
        r["user_id"]: r["n"]
        for r in fact.groupBy("user_id")
        .agg(F.size(F.collect_list("payload")).alias("n"))
        .collect()
    }
    part = (
        fact.select("user_id", "payload")
        .withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(16)))
        .groupBy("user_id", "_salt")
        .agg(F.collect_list("payload").alias("_vals"))
    )
    salted = {
        r["user_id"]: r["n"]
        for r in part.groupBy("user_id")
        .agg(F.size(F.flatten(F.collect_list("_vals"))).alias("n"))
        .collect()
    }
    assert salted == plain
    # and the count-shaped salted helper agrees with a plain count
    counts = {r["user_id"]: r["cnt"] for r in salted_group_count(fact, "user_id").collect()}
    expected = {r["user_id"]: r["count"] for r in fact.groupBy("user_id").count().collect()}
    assert counts == expected
