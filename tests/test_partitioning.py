"""Partitioning utilities: results must be invariant under partitioning
(the property the reference could not guarantee with its unflushed last
group, ``src/mr/worker.rs:203-222`` — partitioning CHANGED its answers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.partitioning import (
    ensure_parallelism,
    salted_group_count,
    with_salt,
)
from mapreduce_rs_spark.operators.text_analysis import word_count
from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_ensure_parallelism_widens_single_split(spark, docs):
    target = spark.sparkContext.defaultParallelism
    widened = ensure_parallelism(docs, "doc_id")
    assert widened.rdd.getNumPartitions() >= min(target, 2)
    assert widened.count() == docs.count()


def test_ensure_parallelism_noop_when_wide(spark):
    df = spark.range(1000).repartition(64)
    assert ensure_parallelism(df).rdd.getNumPartitions() == 64


def test_salt_is_deterministic(spark):
    df = spark.range(500).withColumn("k", F.col("id") % 7)
    s1 = {(r["id"], r["_salt"]) for r in with_salt(df, 8).collect()}
    s2 = {(r["id"], r["_salt"]) for r in with_salt(df, 8).collect()}
    assert s1 == s2
    assert {r[1] for r in s1} <= set(range(8))


def test_salt_actually_spreads_hot_key(spark):
    # The point of salting: a hot key's rows must land in MULTIPLE
    # (key, salt) groups, not one (a key-derived salt would collapse).
    from pyspark.sql import functions as F2

    df = (
        spark.range(10_000)
        .repartition(16)
        .select(F2.lit("hot").alias("k"))
        .withColumn("_salt", F2.pmod(F2.spark_partition_id(), F2.lit(8)))
    )
    n_groups = df.groupBy("k", "_salt").count().count()
    assert n_groups > 1


def test_salted_count_equals_plain_count(spark):
    # Heavily skewed: 90% of rows share one key.
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.col("id").cast("string")).alias("k")
    )
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_group_count(df, "k").collect()}
    assert salted == plain


@pytest.mark.parametrize("n_parts", [1, 3, 32])
def test_word_count_invariant_under_repartition(spark, docs, n_parts):
    base = {(r["word"], r["cnt"]) for r in word_count(docs).collect()}
    got = {(r["word"], r["cnt"]) for r in word_count(docs.repartition(n_parts)).collect()}
    assert got == base


def test_split_estimator_single_small_file_fires(spark, docs, sf_dir):
    """The file-index estimate (ADVICE r07: no physical planning, no
    df.rdd) must still see a single small parquet file as < cores
    splits so the rescue fires."""
    from mapreduce_rs_spark.operators.partitioning import _estimated_scan_splits

    target = spark.sparkContext.defaultParallelism
    est = _estimated_scan_splits(docs.select("doc_id", "text"), target)
    assert est is not None and est < max(target, 2)


def test_split_estimator_matches_spark_partition_count(spark, sf_dir):
    """The estimate mirrors FilePartition.maxSplitBytes — it must agree
    with the partition count Spark actually plans for the same scan
    (within one: greedy packing vs the ceil estimate)."""
    from mapreduce_rs_spark.operators.partitioning import _estimated_scan_splits

    for table in ("documents", "orders", "lineitem"):
        df = load_table(spark, sf_dir, table)
        target = spark.sparkContext.defaultParallelism
        est = _estimated_scan_splits(df, target)
        real = df.rdd.getNumPartitions()
        assert est is not None
        assert abs(est - real) <= 1, f"{table}: est {est} vs real {real}"


def test_split_estimator_many_files_short_circuits(spark, tmp_path):
    """>= target files -> the per-file open cost guarantees >= ~target
    partitions; the estimator must answer from the file COUNT alone."""
    from mapreduce_rs_spark.operators.partitioning import _estimated_scan_splits

    p = str(tmp_path / "many")
    spark.range(1000).repartition(12).write.parquet(p)
    df = spark.read.parquet(p)
    est = _estimated_scan_splits(df, 8)
    assert est is not None and est >= 8


def test_split_estimator_non_file_source_falls_back(spark):
    """createDataFrame / range plans have no file index: the estimator
    returns None and ensure_parallelism falls back to the RDD count —
    same behavior as before the ADVICE change."""
    from mapreduce_rs_spark.operators.partitioning import _estimated_scan_splits

    df = spark.range(100).repartition(4)
    assert _estimated_scan_splits(df, 32) is None
    assert ensure_parallelism(df).rdd.getNumPartitions() >= 4
