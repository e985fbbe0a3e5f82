"""Approximate/sketch aggregates: the 100 TB substitutes for exact
count-distinct and percentiles. Not oracle-checked (sketch internals
differ across engines by design) — instead accuracy-bound tests against
the exact answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_hll_count_distinct_within_bounds(orders):
    exact = orders.select(F.countDistinct("o_custkey").alias("d")).collect()[0]["d"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("d")
    ).collect()[0]["d"]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_close_to_exact(orders):
    row = orders.select(
        F.percentile("o_totalprice", 0.5).alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_kmv_estimate_accuracy(spark, sf_dir):
    from mapreduce_rs_spark.operators.events import kmv_distinct_users
    from mapreduce_rs_spark.sources.catalog import load_tables

    rows = kmv_distinct_users(load_tables(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        # KMV with k=64 has ~1/sqrt(62) ≈ 12.7% relative stderr; allow 3σ.
        assert abs(r["kmv_estimate"] - r["n_distinct_exact"]) <= max(
            0.4 * r["n_distinct_exact"], 2
        ), r


def test_sketches_are_mergeable_across_partitions(orders):
    # The property that makes sketches scale: value is identical no
    # matter how the input was partitioned (merge-based combine).
    a = orders.repartition(1).select(F.approx_count_distinct("o_custkey").alias("d")).collect()[0]["d"]
    b = orders.repartition(13).select(F.approx_count_distinct("o_custkey").alias("d")).collect()[0]["d"]
    assert a == b


def test_minhash_digest_projection_equals_h32_lane(spark, sf_dir):
    """minhash_signatures projects the md5 digests once per shingle for
    speed; values must stay bit-identical to the canonical h32_lane
    family the oracle SQL mirrors (h32_lane_sql). If this drifts, the
    oracle silently tests a different hash family."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.functions.hashing import h32_lane
    from mapreduce_rs_spark.operators.dedup import _shingles, minhash_signatures
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select("doc_id", F.explode(_shingles()).alias("shingle"))
    lane = (
        shingled.groupBy("doc_id")
        .agg(*[
            F.min(h32_lane("shingle", lane=i % 4, seed_group=i // 4)).alias(f"mh{i}")
            for i in range(8)
        ])
        .orderBy("doc_id")
        .collect()
    )
    # minhash_signatures is unsorted (presentation ordering is a
    # registry concern since round 3) — align rows by doc_id.
    fast = minhash_signatures(docs).orderBy("doc_id").collect()
    assert [tuple(r) for r in lane] == [tuple(r) for r in fast]


def test_misra_gries_heavy_hitters_guarantees(spark):
    """Mergeable Misra-Gries guarantees on a skewed random corpus,
    under different partitionings: estimates never exceed true counts,
    undercount is bounded by N/(k+1), and every true heavy hitter
    (count > N/(k+1)) is reported."""
    import random
    from collections import Counter

    from mapreduce_rs_spark.operators.text_analysis import heavy_hitters_mg

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(400)]
    # Zipf-ish weights: a few dominant tokens, long tail.
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    docs = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=40))) for i in range(300)
    ]
    exact = Counter()
    for _, t in docs:
        exact.update(t.split())
    n_total = sum(exact.values())

    k = 32
    err_bound = n_total / (k + 1)
    heavy = {w for w, c in exact.items() if c > err_bound}
    assert heavy, "fixture must contain true heavy hitters"

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for parts in (1, 7, 32):
        got = {
            r["word"]: r["est_count"]
            for r in heavy_hitters_mg(df.repartition(parts), k).collect()
        }
        assert len(got) <= k
        for w, est in got.items():
            assert est <= exact[w], (parts, w, est, exact[w])
            assert exact[w] - est <= err_bound, (parts, w, est, exact[w])
        missing = heavy - set(got)
        assert not missing, (parts, missing)


def test_percentile_approx_swap_is_rank_accurate(spark, sf_dir):
    """The documented 100 TB swap for the SLO bands — exact percentile →
    percentile_approx — verified, not assumed: for every (hour, type)
    group, the approx pX must be an actual group value whose RANK is
    within 1/accuracy of the target quantile (the percentile_approx
    contract), at accuracy=1000 over the real event data."""
    from mapreduce_rs_spark.operators.events import hourly_percentile_bands
    from mapreduce_rs_spark.sources.catalog import load_tables

    t = load_tables(spark, sf_dir)
    acc = 1000
    approx = {
        (r["bucket_ts"], r["event_type"]): (r["p50"], r["p95"], r["p99"])
        for r in hourly_percentile_bands(t, approx_accuracy=acc).collect()
    }
    groups: dict = {}
    for r in t["events"].select("ts", "event_type", "value").collect():
        key = (r["ts"].replace(minute=0, second=0, microsecond=0), r["event_type"])
        groups.setdefault(key, []).append(r["value"])
    assert set(approx) == set(groups)
    for key, (a50, a95, a99) in approx.items():
        vals = sorted(groups[key])
        n = len(vals)
        for q, a in ((0.5, a50), (0.95, a95), (0.99, a99)):
            assert a in groups[key], f"{key}: approx p{q} not a group value"
            # rank window: target quantile +- 1/accuracy (plus one index
            # slot for duplicates at the boundary)
            lo = max(0, int((q - 1.0 / acc) * n) - 1)
            hi = min(n - 1, int((q + 1.0 / acc) * n) + 1)
            assert vals[lo] <= a <= vals[hi], f"{key} p{q}: {a} outside rank window"


def test_cms_matches_pure_python_sketch_and_never_undercounts(spark):
    """cms_word_counts must equal a transparent pure-Python CMS built
    with the same 4-lane md5 hashing — including nonzero overcounts
    from forced collisions (w=4 over a 40-word vocabulary) — and the
    defining CMS guarantee must hold: estimates never undercount."""
    import collections
    import hashlib

    from mapreduce_rs_spark.operators.text_analysis import cms_word_counts

    words = [f"w{i:02d}" for i in range(40)]
    text = " ".join(w for i, w in enumerate(words) for _ in range(1 + i))
    df = spark.createDataFrame([(1, text, "en", "s", 0)],
                               ["doc_id", "text", "lang", "source", "n_chars"])
    got = {
        r["word"]: (r["true_cnt"], r["est_cnt"], r["overcount"])
        for r in cms_word_counts(df, w=4, top=10).collect()
    }

    def lanes(word: str) -> list[int]:
        dg = hashlib.md5(word.encode()).hexdigest()
        return [int(dg[8 * l : 8 * l + 8], 16) % 4 for l in range(4)]

    true = collections.Counter(text.split())
    sketch = [[0] * 4 for _ in range(4)]
    for w_, c in true.items():
        for lane, col in enumerate(lanes(w_)):
            sketch[lane][col] += c
    top10 = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = {}
    for w_, c in top10:
        est = min(sketch[lane][col] for lane, col in enumerate(lanes(w_)))
        expected[w_] = (c, est, est - c)
    assert got == expected
    assert all(over >= 0 for _, _, over in got.values())
    assert any(over > 0 for _, _, over in got.values()), "no collision exercised"


def test_theta_daily_overlap_exact_branch_at_sf0001(spark, sf_dir):
    """At sf0.001 every daily cohort is smaller than k: theta must be
    the full hash range and every estimate must COLLAPSE to the exact
    value (the sketch-is-the-set regime)."""
    from mapreduce_rs_spark.operators.events import THETA_RANGE, theta_daily_overlap
    from mapreduce_rs_spark.sources.catalog import load_tables

    rows = theta_daily_overlap(load_tables(spark, sf_dir)).collect()
    assert rows, "no consecutive-day pairs in fixture"
    for r in rows:
        assert r["theta"] == THETA_RANGE
        assert r["inter_est"] == float(r["n_inter_exact"])
        assert r["union_est"] == float(r["n_union_exact"])


def test_theta_daily_overlap_estimator_bounds_at_sf001(spark):
    """At sf0.01 the cohorts EXCEED k — the proper-sketch regime must
    actually be exercised (non-vacuous-check discipline) and every
    estimate must land inside the standard KMV error envelope
    (~1/sqrt(k-1) relative; asserted at 4 sigma, plus the +-1-hash
    discretization floor for the small intersection counts)."""
    import math

    from mapreduce_rs_spark.operators.events import (
        THETA_K,
        THETA_RANGE,
        theta_daily_overlap,
    )
    from mapreduce_rs_spark.sources.catalog import load_tables

    rows = theta_daily_overlap(load_tables(spark, "/root/testdata/sf0.01")).collect()
    assert rows
    rel = 4.0 / math.sqrt(THETA_K - 1)
    for r in rows:
        assert r["theta"] < THETA_RANGE, "proper-sketch regime never exercised"
        assert 0 <= r["jacc_bp"] <= 10000
        # one hash in/out of the intersection moves the estimate by RANGE/theta
        slack = THETA_RANGE / r["theta"]
        assert abs(r["inter_est"] - r["n_inter_exact"]) <= rel * r["n_inter_exact"] + slack
        assert abs(r["union_est"] - r["n_union_exact"]) <= rel * r["n_union_exact"] + slack


def test_join_size_estimate_accuracy_and_regime(spark):
    """Correlated KMV sampling must actually sample common keys (the
    property uniform row sampling lacks) in the proper-sketch regime,
    and the estimate must land inside the KMV error envelope."""
    import math

    from mapreduce_rs_spark.operators.relational import (
        JOIN_SKETCH_K,
        join_size_estimate,
    )
    from mapreduce_rs_spark.sources.catalog import load_tables

    row = join_size_estimate(load_tables(spark, "/root/testdata/sf0.01")).collect()[0]
    assert row["theta"] < (1 << 32), "proper-sketch regime never exercised"
    assert row["n_common_sampled"] > JOIN_SKETCH_K // 2  # correlated, not missed
    rel = 4.0 / math.sqrt(JOIN_SKETCH_K - 1)
    assert abs(row["est_join_rows"] - row["exact_join_rows"]) <= rel * row["exact_join_rows"]
