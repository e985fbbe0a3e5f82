"""Hand-sized semantics tests for event_paths and value_anomalies.
Oracle parity checks these on the real tables; here the edge cases:
timestamp-tie ordering, path truncation, and zero-variance users."""

from __future__ import annotations

import datetime as dt
import math

from mapreduce_rs_spark.operators.events import event_paths, value_anomalies


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


def _t(sec):
    return dt.datetime(2024, 1, 1, 0, 0, sec)


def test_event_paths_tie_break_and_truncation(spark):
    # User 1: two events share a timestamp — event_id must break the tie
    # (2 before 3). User 2: 10 events, path truncates to the first 8.
    rows = [
        (1, _t(0), 1, "a", 0.0),
        (3, _t(5), 1, "c", 0.0),
        (2, _t(5), 1, "b", 0.0),
    ] + [(10 + i, _t(i), 2, "x", 0.0) for i in range(10)]
    got = {r["path"]: (r["path_len"], r["n_users"]) for r in event_paths({"events": _ev(spark, rows)}).collect()}
    assert got == {"a>b>c": (3, 1), ">".join(["x"] * 8): (8, 1)}


def test_value_anomalies_flags_outlier_and_skips_constant_users(spark):
    # User 1: nine 10.00s and one 100.00 — the spike must be flagged.
    # User 2: constant values (zero variance) — NULL z, never flagged.
    # User 3: single event (n < 2) — excluded.
    rows = (
        [(i, _t(i), 1, "click", 10.0) for i in range(9)]
        + [(9, _t(9), 1, "click", 100.0)]
        + [(20 + i, _t(i), 2, "click", 5.0) for i in range(4)]
        + [(30, _t(0), 3, "click", 7.0)]
    )
    out = value_anomalies({"events": _ev(spark, rows)}).collect()
    assert [r["event_id"] for r in out] == [9]
    # z = (100 - 19) / sqrt((sxx - sx^2/n)/(n-1)), sx=190, sxx=10900
    var = (10900 - 190 * 190 / 10) / 9
    assert math.isclose(out[0]["zscore"], 81 / math.sqrt(var), rel_tol=1e-12)


def test_time_weighted_value_locf_semantics(spark):
    # User 1: value 10 held 100s, then value 90 held 10s, final event
    # has no successor (dropped). TWA = (10*100 + 90*10) / 110.
    rows = [
        (1, _t(0), 1, "click", 10.0),
        (2, dt.datetime(2024, 1, 1, 0, 1, 40), 1, "click", 90.0),
        (3, dt.datetime(2024, 1, 1, 0, 1, 50), 1, "click", 0.0),
    ]
    from mapreduce_rs_spark.operators.events import time_weighted_value

    out = time_weighted_value({"events": _ev(spark, rows)}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_intervals"], r["span_sec"]) == (2, 110)
    assert math.isclose(r["twa_value"], (10 * 100 + 90 * 10) / 110, rel_tol=1e-15)


def test_ohlc_open_close_tie_break(spark):
    # Three events in one hour; the first two share a timestamp — open
    # must be the lower event_id's value; close is the latest event.
    from mapreduce_rs_spark.operators.events import ohlc_bars

    rows = [
        (2, _t(0), 1, "click", 7.0),   # same ts as event 1, higher id
        (1, _t(0), 1, "click", 3.0),   # open (lower event_id)
        (9, _t(30), 1, "click", 5.0),  # close
    ]
    out = ohlc_bars({"events": _ev(spark, rows)}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_events"]) == (
        3.0, 7.0, 3.0, 5.0, 3,
    )


def test_gapfill_fills_empty_hours_with_zeros(spark):
    from mapreduce_rs_spark.operators.events import gapfill_hourly

    # Events at hours 0 and 2 — hour 1 must be synthesized with zeros.
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 15), 1, "click", 2.5),
        (2, dt.datetime(2024, 1, 1, 2, 45), 1, "click", 4.0),
    ]
    out = {
        r["bucket_ts"].hour: (r["n_events"], r["sum_value"], r["filled"])
        for r in gapfill_hourly({"events": _ev(spark, rows)}).collect()
    }
    assert out == {
        0: (1, 2.5, False),
        1: (0, 0.0, True),
        2: (1, 4.0, False),
    }


def test_referential_audit_counts_orphans(spark):
    from mapreduce_rs_spark.operators.relational import referential_audit

    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0), (2, "C", 9)],  # nationkey 2 -> region 9 missing
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    region = spark.createDataFrame([(0, "R0")], ["r_regionkey", "r_name"])
    empty = spark.createDataFrame(
        [], "l_orderkey long, l_partkey long, l_suppkey long, "
            "o_orderkey long, o_custkey long, c_custkey long, "
            "c_nationkey long, s_suppkey long, s_nationkey long, "
            "p_partkey long"
    )
    t = {
        "lineitem": empty, "orders": empty, "customer": empty,
        "supplier": empty, "part": empty, "nation": nation, "region": region,
    }
    got = {
        r["relationship"]: (r["n_child_rows"], r["n_distinct_fk"], r["n_orphans"])
        for r in referential_audit(t).collect()
    }
    assert got["nation->region"] == (3, 2, 1)
    assert got["lineitem->orders"] == (0, 0, 0)


def test_session_window_gap_semantics_vs_sessionize(spark):
    """Pin the native session_window semantics the oracle encodes:
    (a) TOUCHING intervals merge — a gap of exactly gap_min does NOT
    split (same `diff > gap` predicate as sessionize);
    (b) the diff is EXACT microseconds — gap + 0.5s splits natively
    but merges under sessionize's floored-second unix_timestamp diff;
    (c) window end = last event ts + gap."""
    from mapreduce_rs_spark.operators.events import (
        SESSION_GAP_MIN,
        session_window_stats,
        sessionize,
    )

    gap = dt.timedelta(minutes=SESSION_GAP_MIN)
    half_s = dt.timedelta(milliseconds=500)
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "click", 1.0),
        (2, base + gap, 1, "click", 1.0),          # exactly the gap: merges
        (3, base + gap + gap + half_s, 1, "click", 1.0),  # gap+0.5s: splits
    ]
    t = {"events": _ev(spark, rows)}
    native = session_window_stats(t).collect()
    lag_based = sessionize(t).collect()
    # Native: {1,2} merge (touching), 3 splits (diff 0.5s beyond gap).
    assert sorted(r["n_events"] for r in native) == [1, 2]
    # Lag-cumsum: floor-second diff of event 3 is exactly gap -> one
    # session of all 3 (the documented precision divergence).
    assert [r["n_events"] for r in lag_based] == [3]
    by_start = {r["session_start"]: r for r in native}
    assert by_start[base]["n_events"] == 2
    assert by_start[base]["session_end"] == base + gap + gap
    last = base + gap + gap + half_s
    assert by_start[last]["session_end"] == last + gap


def test_user_value_trend_recovers_planted_line(spark):
    """Semantic golden for the closed-form OLS: a user whose value is
    EXACTLY linear in time must come back with that slope, the planted
    intercept at the rebase epoch, and r² = 1; a constant-value user
    gets slope 0 / r² = 1 (perfect horizontal fit); noisy-but-sloped
    data gets 0 < r² < 1; single/two-event users are excluded (n >= 3)."""
    from mapreduce_rs_spark.operators.events import user_value_trend

    def hour(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    rows = (
        # user 1: value = 20.00 + 0.24 * hours  ->  5.76/day, r²=1
        [(i, hour(i), 1, "click", round(20.0 + 0.24 * i, 2)) for i in range(10)]
        # user 2: constant 7.25  ->  slope 0, r²=1 by convention
        + [(100 + i, hour(i), 2, "view", 7.25) for i in range(5)]
        # user 3: sloped with one off-line point  ->  0 < r² < 1
        + [(200 + i, hour(i), 3, "buy", [1.0, 2.0, 9.0, 4.0][i]) for i in range(4)]
        # user 4: two events only -> excluded
        + [(300, hour(0), 4, "x", 1.0), (301, hour(1), 4, "x", 2.0)]
    )
    got = {
        r["user_id"]: r
        for r in user_value_trend({"events": _ev(spark, rows)}).collect()
    }
    assert set(got) == {1, 2, 3}
    assert math.isclose(got[1]["slope_per_day"], 5.76, rel_tol=1e-12)
    assert math.isclose(got[1]["intercept"], 20.0, rel_tol=1e-12)
    assert math.isclose(got[1]["r2"], 1.0, rel_tol=1e-12)
    assert got[2]["slope_per_day"] == 0.0
    assert got[2]["r2"] == 1.0
    assert 0.0 < got[3]["r2"] < 1.0


def test_state_intervals_island_semantics(spark):
    """Semantic golden for gaps-and-islands: A A B A collapses to THREE
    intervals (the second A-run is separate — islands are maximal
    CONSECUTIVE runs, not per-type groups), ties on ts break by
    event_id, and interval bounds are the run's min/max ts."""
    from mapreduce_rs_spark.operators.events import state_intervals

    rows = [
        (1, _t(0), 1, "a", 0.0),
        (2, _t(10), 1, "a", 0.0),
        (3, _t(20), 1, "b", 0.0),
        (4, _t(30), 1, "a", 0.0),
        # user 2: same-ts tie — event_id order makes it a,b -> 2 islands
        (10, _t(0), 2, "a", 0.0),
        (11, _t(0), 2, "b", 0.0),
    ]
    got = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in state_intervals({"events": _ev(spark, rows)}).collect()
    )
    assert got == [
        (1, "a", _t(0), _t(10), 2),
        (1, "a", _t(30), _t(30), 1),
        (1, "b", _t(20), _t(20), 1),
        (2, "a", _t(0), _t(0), 1),
        (2, "b", _t(0), _t(0), 1),
    ]


def test_hll_estimate_accuracy_and_corrected_path(spark):
    """HLL semantics: (a) on a cardinality well above the small-range
    regime the raw estimate lands within the standard-error envelope
    (sigma = 1.04/sqrt(64) = 13%; assert 3 sigma); (b) corrected=True
    applies linear counting m*ln(m/V) in the small-range regime and
    matches math.log computed in pure Python; (c) the estimate only
    depends on the distinct user set (duplicates don't move registers)."""
    from mapreduce_rs_spark.operators.events import HLL_M, hll_distinct_users

    big = [(i, _t(0), i, "click", 1.0) for i in range(2000)]
    row = hll_distinct_users({"events": _ev(spark, big)}).collect()[0]
    assert row["n_distinct_exact"] == 2000
    assert abs(row["hll_estimate"] - 2000) / 2000 < 3 * 1.04 / math.sqrt(HLL_M)

    small = [(i, _t(0), i % 7, "click", 1.0) for i in range(50)]
    srow = hll_distinct_users({"events": _ev(spark, small)}, corrected=True).collect()[0]
    v_empty = HLL_M - srow["n_nonzero_buckets"]
    assert v_empty > 0
    assert srow["hll_estimate"] == HLL_M * math.log(HLL_M / v_empty)

    dup = big + [(100000 + i, _t(1), i, "view", 2.0) for i in range(2000)]
    drow = (
        hll_distinct_users({"events": _ev(spark, dup)})
        .where("event_type = 'click'")
        .collect()[0]
    )
    assert drow["indicator_s"] == row["indicator_s"]


def test_hourly_bands_approx_rank_error(spark):
    """The 100 TB configuration of hourly_percentile_bands (r05 verdict
    #8): percentile_approx(accuracy=HOURLY_BANDS_100TB_ACCURACY) must
    satisfy the sketch's contract against the EXACT per-group
    distribution at sf0.1 — for each (hour, type) group of size n, the
    returned value's rank interval must intersect
    [(q - 1/acc)·n, (q + 1/acc)·n]. Verified, not assumed."""
    from mapreduce_rs_spark.operators.events import (
        HOURLY_BANDS_100TB_ACCURACY,
        hourly_percentile_bands,
    )
    from mapreduce_rs_spark.sources.catalog import load_tables

    t = load_tables(spark, "/root/testdata/sf0.1")
    approx = {
        (r["bucket_ts"], r["event_type"]): r
        for r in hourly_percentile_bands(
            t, approx_accuracy=HOURLY_BANDS_100TB_ACCURACY
        ).collect()
    }
    # group values exactly (sf0.1 events = 100k rows: collectable)
    from pyspark.sql import functions as F

    groups = {
        (r["bucket_ts"], r["event_type"]): sorted(r["vals"])
        for r in t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    assert set(approx) == set(groups)
    eps = 1.0 / HOURLY_BANDS_100TB_ACCURACY
    checked = 0
    for key, vals in groups.items():
        n = len(vals)
        row = approx[key]
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            v = row[col]
            lo = sum(1 for x in vals if x < v)  # ranks (1-based) (lo, hi]
            hi = sum(1 for x in vals if x <= v)
            assert lo < hi, f"{key} {col}: approx value {v} not in group"
            lo_bound = (q - eps) * n
            hi_bound = (q + eps) * n + 1  # +1: rank vs 0-based index slack
            assert lo <= hi_bound and hi >= lo_bound, (
                f"{key} {col}: rank interval ({lo},{hi}] misses "
                f"[{lo_bound},{hi_bound}] for n={n}"
            )
            checked += 1
    assert checked >= 3 * 100  # sf0.1 has hundreds of (hour,type) groups
