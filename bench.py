#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + write to the noop sink)
after a warm-up pass of the session. The noop sink executes the FULL
plan — all projected columns, every exchange — where a bare .count()
would let Catalyst prune projections and delete sorts, systematically
under-measuring the suite (the round-1 harness bug).

What is timed is the OPERATOR form (QuerySpec.fn): since round 3 the
deterministic presentation orderBy each registry query carries for the
driver contract lives in the queries() wrapper (QuerySpec.sort), not in
the operator — at 100 TB results stream to a sink and a global total
sort is a sink concern, so benching it would charge every operator an
extra boundary-sampling job + range exchange it would never pay in
production. word_count keeps its total sort INSIDE the operator (it is
reference op 12, part of the semantics) and is benched with it. The
headline metric is total wall time — the number BENCH_r{N}.json records
and BASELINE.md's gate applies to; BASELINE.md records the harness A/B
history that keeps rounds comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Headline queries: one per operator family, weighted toward the
# shuffle-heavy paths that dominate at scale.
HEADLINE = (
    "wordcount",                 # flagship: scan→explode→agg→sort
    "q1_pricing_summary",        # scan-heavy filter+agg
    "join_revenue_by_nation",    # multi-join + broadcast dims
    "window_top_orders_per_customer",  # window top-k
    "dedup_exact",               # hash fingerprint dedup
    "minhash_signatures",        # shingle explode + 8-way min agg
    "knn_bruteforce",            # vector cosine + per-query top-k
    "sessionize",                # stateful-ish window chains
    "tumbling_window",           # event-time windows
    # round-4 suite extension (BASELINE.md): the LLM-pipeline
    # centerpiece ops get a round-over-round perf signal. The first 9
    # queries remain the r01-r03-comparable core; compare totals only
    # within the same suite definition.
    "minhash_lsh_pairs",         # banded LSH self-join over checkpointed sigs
    "knn_ivf",                   # IVF nprobe=1 over the KMV query sample
    "curation_yield",            # gate→dedup→yield capstone
    # round-4 second extension (BASELINE.md): the session's new operator
    # families. The 9-query core and 12-query r04 suite remain
    # comparable prefixes; compare totals only within one definition.
    "session_window_stats",      # native MergingSessions aggregation
    "bloom_prefilter_stats",     # narrow bloom probe + broadcast truth join
    "gif_frame_stats",           # Python codec stage: LZW encode+decode, 1:N
    # round-4 third extension (BASELINE.md): the session's additions.
    # Prior suite definitions (9 / 12 / 15 queries) remain comparable
    # PREFIXES; compare totals only within one definition.
    "q9_profit_by_nation",       # largest multi-join of the TPC-H battery
    "dsir_importance_weights",   # hashed-ngram curation scoring, 2-agg chain
    "jpeg_decode_stats",         # Python codec stage: Huffman+IDCT per block
    # round-4 fourth extension (BASELINE.md): the fifth-session
    # operators. Prior definitions (9 / 12 / 15 / 18) remain comparable
    # PREFIXES; compare totals only within one definition.
    "theta_daily_overlap",       # theta sketch: distinct agg + day top-k + pair joins
    "bigram_surprisal_scores",   # bigram LM: pair tf + shuffle-joined model
    "join_size_estimate",        # correlated KMV join-cardinality sketch
    # round-4 fifth extension (BASELINE.md): the seventh-session
    # operator families. Prior definitions (9 / 12 / 15 / 18 / 21)
    # remain comparable PREFIXES; compare totals only within one
    # definition.
    "state_snapshot_diff",       # two user-window snapshots + co-keyed join
    "erasure_plan",              # flag window + membership shuffle join + day rollup
    "pq_reconstruction_error",   # PQ encode + integer error vector math
    # round-5 extension (BASELINE.md): the r04-added analytics families
    # gain a round-over-round perf signal (r04 verdict #8). Prior
    # definitions (9 / 12 / 15 / 18 / 21 / 24) remain comparable
    # PREFIXES; compare totals only within one definition.
    "embedding_outliers",        # quantized label-centroid dists + per-partition heaps
    "bm25_scores",               # tf/df aggs + broadcast model scoring join
    "weighted_shortest_paths",   # bounded-round Bellman-Ford over materialized edges
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark("bench", **{"spark.sql.shuffle.partitions": cpus})

    def run_full_plan(name: str) -> None:
        # noop datasource: full execution (sorts, projections, Python
        # stages) with zero write cost — the honest end-to-end timer.
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm up the JVM / codegen / parquet footer cache so per-query times
    # measure the plans, not first-touch overheads.
    run_full_plan("wordcount")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        run_full_plan(name)
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
