"""Bloom runtime-filter harness: the filter-theoretic properties the
oracle parity check can't state directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.bloom import (
    DEFAULT_BITS,
    WORD_BITS,
    bloom_prefilter_stats,
    bloom_words,
)
from mapreduce_rs_spark.sources.catalog import load_tables


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_tables(spark, sf_dir)


def test_no_false_negatives_at_any_size(tables):
    # The Bloom guarantee: every true match passes, at ANY filter size —
    # including a pathologically small one where almost everything
    # collides.
    for n_bits in (32, 256, DEFAULT_BITS):
        rows = bloom_prefilter_stats(tables, n_bits=n_bits).collect()
        assert rows, f"n_bits={n_bits}: empty result"
        assert all(r["n_false_neg"] == 0 for r in rows)
        # Pass set is a superset of the match set, subset of everything.
        for r in rows:
            assert r["n_match"] <= r["n_bloom_pass"] <= r["n_orders"]
            assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_match"]


def test_saturated_filter_passes_everything(spark, tables):
    # 32 bits for hundreds of keys: the filter saturates to all-ones and
    # passes EVERY probe, member or not — degraded to useless but NEVER
    # incorrect.
    from mapreduce_rs_spark.operators.bloom import _probe_pass_sql

    words = bloom_words(
        tables["customer"].select(F.col("c_custkey").alias("k")), "k", n_bits=32
    )
    assert len(words) == 1
    assert words[0] == (1 << WORD_BITS) - 1  # every bit set
    probes = spark.range(10_000, 10_500).select(
        F.expr(_probe_pass_sql("CAST(id AS STRING)", words, 32)).alias("p")
    )
    assert probes.where(~F.col("p")).count() == 0


def test_bloom_words_bounded_and_deterministic(spark, tables):
    keys = tables["customer"].select(F.col("c_custkey").alias("k"))
    w1 = bloom_words(keys, "k", n_bits=256)
    w2 = bloom_words(keys.repartition(7), "k", n_bits=256)
    assert len(w1) == 256 // WORD_BITS
    assert w1 == w2  # partition-invariant fold
    assert all(0 <= w <= (1 << WORD_BITS) - 1 for w in w1)


def test_bloom_rejects_bad_size(tables):
    with pytest.raises(ValueError, match="multiple"):
        bloom_words(tables["customer"].select(F.col("c_custkey").alias("k")), "k", n_bits=100)
