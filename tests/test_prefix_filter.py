"""Prefix filtering must be LOSSLESS: the PPJoin candidate pruner in
``prefix_filter_jaccard_pairs`` claims the exact same answer as the
naive full equi-join — every pair with J >= t survives (the prefix
theorem), none is invented (the verify step). This test computes the
unfiltered threshold join by brute force over distinct shingle sets and
asserts set equality of (doc_a, doc_b, n_common) — on the checked-in
corpus AND on a planted family with controlled overlap around the
threshold boundary."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators import dedup
from mapreduce_rs_spark.sources.catalog import load_table


def _naive_pairs(spark_df, t_bp):
    """Unfiltered exact threshold Jaccard join over distinct shingles."""
    sh = spark_df.select(
        "doc_id", F.explode(F.array_distinct(dedup._shingles())).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .where(
            F.col("n_common") * 10000
            >= t_bp * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .select("doc_a", "doc_b", "n_common")
    )
    return {tuple(r) for r in out.collect()}


def _filtered_pairs(spark_df):
    out = dedup.prefix_filter_jaccard_pairs(spark_df).select(
        "doc_a", "doc_b", "n_common"
    )
    return {tuple(r) for r in out.collect()}


def test_prefix_filter_lossless_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert _filtered_pairs(docs) == _naive_pairs(docs, dedup.PREFIX_T_BP)


def test_prefix_filter_lossless_on_boundary_family(spark):
    """Docs built from a shared core plus per-doc tails so pairwise
    Jaccard straddles the 0.5 threshold from both sides."""
    # doc i = the 8-word core + i unique tail words: the shared core
    # contributes 6 common shingles, so J(i, j) = 6/(6+i+j) — pairs
    # with i+j <= 6 sit at or above 0.5, the rest below: both sides of
    # the threshold boundary are populated.
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(10):
        toks = words + [f"tail{i}_{j}" for j in range(i)]
        rows.append((i, " ".join(toks)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    got = _filtered_pairs(docs)
    want = _naive_pairs(docs, dedup.PREFIX_T_BP)
    assert got == want
    assert want, "boundary family must produce at least one qualifying pair"


def test_prefix_indexes_fewer_tokens(spark, sf_dir):
    """The point of the pruner: the prefix index must be strictly
    smaller than the full shingle index on any non-trivial corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(dedup._shingles())).alias("shingle")
    ).distinct()
    full_n = sh.count()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    ranked = sh.join(dfreq, "shingle").select(
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
        )
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    prefix_n = ranked.where(
        F.col("rn")
        <= F.expr(f"n_sh - ((n_sh * {dedup.PREFIX_T_BP} + 9999) div 10000) + 1")
    ).count()
    assert prefix_n < full_n
    # per doc: 2·(floor(n/2)+1) <= n + 2, so the index is at most half
    # the full one plus one token per document
    n_docs = ranked.select("doc_id").distinct().count()
    assert prefix_n * 2 <= full_n + 2 * n_docs
