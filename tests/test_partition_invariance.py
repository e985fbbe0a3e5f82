"""Partition-count invariance of float aggregates.

The round-1 oracle failure was double-sum accumulation-order noise:
results changed with partition count, which means a cluster resize or
AQE re-plan changes the answer. The decimal-accumulation fix makes the
money aggregates EXACT, so the same query must produce bit-identical
floats under radically different parallelism. This is the property the
100 TB deployment needs (answers must not depend on executor count),
tested directly: same query, shuffle.partitions swept, outputs compared
bitwise.
"""

from __future__ import annotations

import struct

import pytest

from mapreduce_rs_spark.operators import events, relational
from mapreduce_rs_spark.sources.catalog import load_tables


def _bits(df) -> list[tuple]:
    rows = []
    for r in df.collect():
        rows.append(
            tuple(
                struct.pack("<d", v).hex() if isinstance(v, float) else v
                for v in r
            )
        )
    return sorted(rows)


@pytest.mark.parametrize(
    "query",
    [
        relational.agg_order_priorities,
        relational.q1_pricing_summary,
        relational.having_active_customers,
        relational.window_running_revenue,
        # round-3 float-hazard shapes: a strict < against a derived
        # threshold (q17), a ratio of two sums (q8), a max-equality
        # probe (q15), and band-boundary predicates feeding a global
        # sum (q6) — each would be partition-count-dependent under
        # double accumulation; decimal arithmetic must pin them.
        relational.q17_small_quantity_revenue,
        relational.q8_market_share,
        relational.q15_top_supplier,
        relational.q6_forecast_revenue,
        # round-4 continuation: percentile CUTPOINTS feeding score
        # comparisons (rfm — interpolated quantiles must not move with
        # partition count), and the native session-window decimal sums.
        relational.rfm_segments,
        # round-4: the closed-form OLS (five distributive sums feeding
        # three double divisions — the archetypal order-sensitive shape
        # if any sum were double), and q11's decimal threshold compare.
        events.user_value_trend,
        relational.q11_important_stock,
    ],
)
def test_money_aggregates_partition_invariant(spark, sf_dir, query):
    tables = load_tables(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        low = _bits(query(tables))
        spark.conf.set("spark.sql.shuffle.partitions", "31")  # prime, forces different splits
        high = _bits(query(tables))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high


def test_repartitioned_input_same_bits(spark, sf_dir):
    # Same invariance under INPUT repartitioning (different map-side
    # partial-aggregation groupings), not just shuffle fan-out.
    tables = load_tables(spark, sf_dir)
    base = _bits(relational.agg_order_priorities(tables))
    tables_re = dict(tables)
    tables_re["orders"] = tables["orders"].repartition(17)
    assert _bits(relational.agg_order_priorities(tables_re)) == base


def test_round4_ratio_signals_partition_invariant(spark, sf_dir):
    """The round-4 pipeline signals emit ratios of exact integer
    aggregates (one final double division) — invariant by construction;
    pinned bitwise under a partition sweep like the money aggregates."""
    from mapreduce_rs_spark.operators.curation import mixture_weights
    from mapreduce_rs_spark.operators.similarity import semdedup
    from mapreduce_rs_spark.operators.text_analysis import (
        boilerplate_ngrams,
        repetition_signals,
    )
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        lambda: repetition_signals(docs),
        lambda: boilerplate_ngrams(docs),
        lambda: mixture_weights(docs),
        lambda: semdedup(emb),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for q in queries:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            low = _bits(q())
            spark.conf.set("spark.sql.shuffle.partitions", "31")
            high = _bits(q())
            assert low == high
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_stats_battery_constant_group_is_defined(spark):
    """A (near-)constant group makes the computational-formula variance
    fractionally negative under double cancellation; both engines must
    stay DEFINED and aligned: variance clamps to 0, stddev to 0, and
    corr is NULL (0/0 via try_divide), matching DuckDB's NULL — never a
    DuckDB sqrt(negative) crash or a Spark NaN-vs-NULL hash mismatch."""
    from mapreduce_rs_spark.operators.relational import stats_battery

    const = spark.createDataFrame(
        [("X", 10.0, 100000.01)] * 5, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    r = stats_battery({"lineitem": const}).collect()[0]
    assert r["var_qty"] == 0.0 and r["stddev_qty"] == 0.0
    assert r["var_price"] == 0.0 and r["covar_qty_price"] == 0.0
    assert r["corr_qty_price"] is None


def test_session_new_ops_partition_invariant(spark, sf_dir):
    """Round-4 continuation ops pinned bitwise under the partition
    sweep: native session windows (decimal sums across merge orders),
    the bloom fold + probe (associative bit_or, hash positions), the
    leakage split draw (hash of CC labels — the iterative loop must
    converge to the same labels at any parallelism), and PII redaction
    arithmetic."""
    from mapreduce_rs_spark.operators.curation import leakage_safe_splits
    from mapreduce_rs_spark.operators.bloom import bloom_prefilter_stats
    from mapreduce_rs_spark.operators.events import session_window_stats
    from mapreduce_rs_spark.operators.text_analysis import pii_scrub_stats
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    tables = load_tables(spark, sf_dir)
    queries = [
        lambda: session_window_stats(tables),
        lambda: bloom_prefilter_stats(tables),
        lambda: leakage_safe_splits(docs),
        lambda: pii_scrub_stats(docs),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for q in queries:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            low = _bits(q())
            spark.conf.set("spark.sql.shuffle.partitions", "31")
            high = _bits(q())
            assert low == high
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_sixth_session_ops_partition_invariant(spark, sf_dir):
    """Sixth-session ops pinned bitwise under the partition sweep: the
    integer-cross-multiplied encoders/flags (target encoding, robust
    MAD, Benford deltas, seasonality bp), the power-of-two EWMA, the
    micro-unit Adamic-Adar sum, and the RRF fusion — each computes its
    floats as ONE division of exact integers, so parallelism must not
    move a bit."""
    from mapreduce_rs_spark.operators.events import (
        ewma_value,
        robust_value_anomalies,
        seasonality_profile,
    )
    from mapreduce_rs_spark.operators.graph import link_prediction_scores
    from mapreduce_rs_spark.operators.relational import (
        benford_digit_audit,
        target_encoding_nations,
    )

    tables = load_tables(spark, sf_dir)
    queries = [
        lambda: benford_digit_audit(tables),
        lambda: target_encoding_nations(tables),
        lambda: ewma_value(tables),
        lambda: robust_value_anomalies(tables),
        lambda: seasonality_profile(tables),
        lambda: link_prediction_scores(tables),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for q in queries:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            low = _bits(q())
            spark.conf.set("spark.sql.shuffle.partitions", "31")
            high = _bits(q())
            assert low == high
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
