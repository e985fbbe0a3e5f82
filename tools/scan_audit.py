#!/usr/bin/env python
"""Subtree-clone audit: count parquet scans in every registry query's
FINAL executed plan and flag queries that re-read inputs more often
than they declare.

Why this exists (SCALE.md rounds 7-8): Catalyst expands a DataFrame
DAG into a TREE — any frame consumed by two downstream branches is
silently recomputed per branch unless materialized. Both finds so far
were exactly this shape:

* r07: dsir's un-materialized 512-row bucket model cloned the
  corpus-sized tf aggregation (3 reads instead of 2; 16.8 -> 12.5 s
  at sf1.0);
* r08: incremental_ingest_neardup's un-materialized admission ledger
  cloned the fingerprint join chain (14 scans / 42 md5 sites; ~3x the
  sf1.0 wall).

Byte counters can't see this (Spark 4's vectorized reader ticks
neither stage inputBytes nor FS statistics) — the executed plan's scan
operators are the ground truth. Checkpoint-time subplans execute at
plan BUILD for materialize()-based queries, so their heavy legs
disappear from the final plan — this audit bounds what's LEFT, which
is exactly the part Catalyst may clone freely.

Each query declares its expected ceiling in EXPECTED_MAX_SCANS when it
deliberately reads an input more than once (bigram families: one scan
per gram family is the right trade vs persisting a corpus-sized token
intermediate). Everything else is held to
  scans <= number of distinct tables the query loads.

Usage:
    python tools/scan_audit.py                  # audit all, report
    python tools/scan_audit.py --queries a,b    # subset
Exit 1 if any query exceeds its ceiling.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Queries allowed to exceed the distinct-input-table bound, with the
# documented reason. Keep this list SHORT — every entry is a standing
# claim that the extra read is cheaper than the materialization.
EXPECTED_MAX_SCANS: dict[str, int] = {
    # one scan per gram family (unigram + bigram / the two skip grains):
    # persisting the corpus-sized token intermediate costs more than the
    # second columnar scan (r07 executed-plan audit, SCALE.md)
    "bigram_pmi": 2,
    "bigram_surprisal_scores": 2,
    "skipgram_pmi": 2,
}


def audit(names: list[str] | None = None, sf_dir: str = "/root/testdata/sf0.001") -> list[dict]:
    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark("scan_audit")
    names = names or list(QUERIES)
    out = []
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = plan.count("Scan parquet")
        # distinct table files referenced by the final plan's scans
        files = {
            m
            for m in re.findall(r"file:[^\s,\]]*?/(\w+)\.parquet", plan)
        }
        ceiling = EXPECTED_MAX_SCANS.get(name, max(len(files), 1) if scans else 0)
        rec = {
            "query": name,
            "scans": scans,
            "distinct_tables_in_plan": sorted(files),
            "ceiling": ceiling,
            "over": scans > ceiling,
        }
        if rec["over"]:
            print(json.dumps(rec), flush=True)
        out.append(rec)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else None
    records = audit(names, args.sf_dir)
    over = [r for r in records if r["over"]]
    print(
        json.dumps(
            {
                "metric": "scan_audit_over_ceiling",
                "queries_run": len(records),
                "flagged": sorted(r["query"] for r in over),
            }
        )
    )
    sys.exit(1 if over else 0)


if __name__ == "__main__":
    main()
