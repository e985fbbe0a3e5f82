"""Decimal-sum headroom guards (round-3 verdict ask #8).

relational.py reasons that MONEY = DECIMAL(12,2) sums have ample
headroom because Spark widens sum(DECIMAL(p,s)) to DECIMAL(p+10,s).
These tests PROVE the reasoning at adversarial magnitudes instead of
asserting it in a comment:

* near-max values sum EXACTLY (vs Python's arbitrary-precision
  Decimal) and bit-identically across partition counts;
* the widened accumulator type is what the comment claims;
* the ultimate failure mode at the DECIMAL(38) precision ceiling is
  LOUD (ANSI overflow error), never a silent wrap.

Documented bound: sum(DECIMAL(12,2)) accumulates in DECIMAL(22,2),
whose capacity is 1e20 - 0.01. Near-max rows are ~1e10 each, so
overflow needs ~1e10 such rows IN ONE aggregation group — a 100 TB
lineitem (~1e11 rows) of AVERAGE prices (~1e3-1e5) sums to ~1e14-1e16,
four-plus orders of magnitude inside capacity; only a single-group
all-near-max aggregation over the whole corpus could reach it, and
that run fails loudly (the ANSI test below), not wrongly.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.relational import money, stable_sum


def test_stable_sum_exact_at_adversarial_magnitudes(spark):
    # 20k DISTINCT near-max DECIMAL(12,2) values (max 9999999999.99,
    # descending cents) — each is exactly representable as a double
    # (integer cents < 2^53), so the double->decimal cast round-trips.
    n = 20_000
    vals = [Decimal("9999999999.99") - Decimal(i) / 100 for i in range(n)]
    expected = float(sum(vals))  # exact decimal total, one rounding to double
    rows = [(float(v),) for v in vals]
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["price"]).repartition(parts)
        got = df.agg(stable_sum(money("price")).alias("s")).collect()[0]["s"]
        assert got == expected, f"parts={parts}: {got!r} != {expected!r}"


def test_sum_accumulator_widens_ten_digits(spark):
    df = spark.range(1).select(F.lit("9999999999.99").cast("decimal(12,2)").alias("v"))
    dtypes = dict(df.agg(F.sum("v").alias("s")).dtypes)
    assert dtypes["s"] == "decimal(22,2)"
    # The discounted-price product follows the same discipline:
    # DECIMAL(12,2) * DECIMAL(3,2) -> DECIMAL(16,4) -> sum DECIMAL(26,4).
    prod = df.select((F.col("v") * F.lit("0.95").cast("decimal(3,2)")).alias("p"))
    assert dict(prod.dtypes)["p"] == "decimal(16,4)"
    assert dict(prod.agg(F.sum("p").alias("s")).dtypes)["s"] == "decimal(26,4)"


def test_overflow_at_precision_ceiling_is_loud(spark):
    """At DECIMAL(38,2) — the precision ceiling, where sum can no longer
    widen — an overflowing aggregation must RAISE (Spark 4 ANSI), never
    silently wrap. This is the failure mode a pathological single-group
    all-near-max 1e10-row aggregation would hit."""
    near_max = "9" * 36 + ".99"  # max DECIMAL(38,2)
    df = spark.createDataFrame([(near_max,), (near_max,)], ["s"]).select(
        F.col("s").cast("decimal(38,2)").alias("v")
    )
    with pytest.raises(Exception, match="(?i)overflow|cannot be represented|ARITHMETIC"):
        df.agg(F.sum("v")).collect()
