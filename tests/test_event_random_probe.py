"""Randomized three-way probe for the ENTIRE event-family registry:
Spark and DuckDB run the same registry query + oracle SQL over a
RANDOM events table (seeded), with the hazards fixed corpora undercover
deliberately injected — duplicate (user, ts) pairs, same-second
neighbors, sub-second components, empty hours, single-event users, and
constant-value users. Random-input probes catch dialect divergences the
checked-in testdata can't (precedent: the \\x0B whitespace divergence
found by test_properties.py's random text probe).

The random events.parquet is written to a temp catalog dir whose other
nine tables are symlinks into the real sf0.001 testdata, so the full
load_tables/run_oracle machinery runs unmodified.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pandas as pd
import pytest

from mapreduce_rs_spark.plans.registry import QUERIES, queries
from tests.parity import assert_frames_match, run_oracle

EVENT_QUERIES = (
    "tumbling_window",
    "sliding_window",
    "sessionize",
    "session_window_stats",
    "json_props_agg",
    "asof_last_click_before_purchase",
    "multi_resolution_rollup",
    "kmv_distinct_users",
    "hll_distinct_users",
    "hll_rollup_merge",
    "theta_daily_overlap",
    "out_of_order_stats",
    "user_value_trend",
    "state_intervals",
    "value_histogram",
    "user_activity_stats",
    "range_window_revenue",
    "funnel_conversion",
    "cohort_retention",
    "latest_event_state",
    "event_paths",
    "value_anomalies",
    "time_weighted_value",
    "ohlc_bars",
    "gapfill_hourly",
    "zorder_locality",
    "hourly_percentile_bands",
    "event_transition_matrix",
    "ewma_value",
    "zone_map_pruning",
    "robust_value_anomalies",
    "seasonality_profile",
    "burst_hours",
    "multitouch_attribution",
    "inter_event_gaps",
    "abandoned_clicks",
    "log2_value_histogram",
    "compaction_plan",
    "state_snapshot_diff",
    "erasure_plan",
    "ab_test_conversion",
    "kmv_quantile_sketch",
    "kmv_quantile_rollup_merge",
    "value_drift_chi2",
    "dp_noisy_counts",
    "rollup_incremental_refresh",
    # probe-coverage completion (r08 second batch): the fitted literal
    # cutpoints must bucket RANDOM values identically in both engines
    "equi_depth_histogram",
)

SEED = 20260813
N_EVENTS = 600


def _random_events() -> pd.DataFrame:
    rng = random.Random(SEED)
    types = ["click", "view", "purchase", "error", "cart"]
    base = dt.datetime(2024, 3, 1)
    rows = []
    for event_id in range(N_EVENTS):
        user = rng.randint(1, 20)
        # Cluster timestamps to force same-second and same-microsecond
        # collisions AND leave whole hours empty (gapfill's edge).
        hour = rng.choice([0, 1, 5, 6, 7, 30, 31])
        ts = base + dt.timedelta(
            hours=hour,
            seconds=rng.randint(0, 600),
            microseconds=rng.choice([0, 0, 125000, 999999]),
        )
        rows.append(
            (
                event_id,
                ts,
                user,
                rng.choice(types),
                round(rng.uniform(0, 100), 2),
                '{"k": %d}' % rng.randint(0, 9),
            )
        )
    # Hazard injection: an exact-duplicate (user, ts) pair differing
    # only in event_id; a single-event user; a constant-value user.
    rows.append((N_EVENTS, rows[0][1], rows[0][2], "view", 1.23, '{"k": 1}'))
    rows.append((N_EVENTS + 1, base + dt.timedelta(hours=2), 21, "click", 9.99, '{"k": 2}'))
    for i in range(4):
        rows.append(
            (N_EVENTS + 2 + i, base + dt.timedelta(hours=3, minutes=i), 22, "click", 5.0, '{"k": 3}')
        )
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


@pytest.fixture(scope="module")
def random_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("random_catalog")
    src = os.path.abspath("/root/testdata/sf0.001")
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        os.symlink(os.path.join(src, f"{t}.parquet"), d / f"{t}.parquet")
    events = _random_events()
    events.to_parquet(d / "events.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_random_events(spark, random_sf_dir, name):
    spdf = queries()[name](spark, random_sf_dir).toPandas()
    oracle_pdf = run_oracle(QUERIES[name].oracle, random_sf_dir)
    assert_frames_match(spdf, oracle_pdf, f"{name}[random-events]")
