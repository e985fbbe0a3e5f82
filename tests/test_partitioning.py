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
