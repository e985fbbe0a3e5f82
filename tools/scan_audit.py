#!/usr/bin/env python
"""Subtree-clone regression audit: per-table parquet-scan multiplicity
of every registry query's FINAL executed plan, diffed against a
committed baseline.

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
disappear from the final plan; this audit bounds what's LEFT — the
part Catalyst may clone freely.

Why a BASELINE, not an absolute ceiling: many queries read a table
more than once BY DESIGN — the knn family probes the corpus with a
bounded query sample (2 reads of embeddings per leg, ann_ranking's
four legs = 12), TPC-H shapes self-join lineitem/nation, the
sketch-rollup proofs read events twice to pin merged == direct. An
absolute rule either blesses clones or flags designs. The committed
baseline (tools/scan_baseline.json) records each query's reviewed
multiplicity; the audit fails ONLY on an increase — i.e. a refactor
that introduced a NEW clone — and reports decreases so the baseline
can be ratcheted down.

Usage:
    python tools/scan_audit.py                    # diff vs baseline
    python tools/scan_audit.py --write-baseline   # re-record (review the diff first!)
    python tools/scan_audit.py --queries a,b      # subset diff
Exit 1 on any regression (or any new query missing from the baseline).
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

BASELINE_PATH = os.path.join(_REPO_ROOT, "tools", "scan_baseline.json")


def measure(names: list[str] | None = None, sf_dir: str = "/root/testdata/sf0.001") -> dict[str, dict[str, int]]:
    """query -> {table: scan count} from the final executed plan."""
    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark("scan_audit")
    names = names or list(QUERIES)
    out: dict[str, dict[str, int]] = {}
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts: dict[str, int] = {}
        for m in re.findall(r"file:[^\s,\]]*?/(\w+)\.parquet", plan):
            counts[m] = counts.get(m, 0) + 1
        out[name] = dict(sorted(counts.items()))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--write-baseline", action="store_true")
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else None
    got = measure(names, args.sf_dir)

    if args.write_baseline:
        baseline = {}
        if os.path.exists(BASELINE_PATH):
            baseline = json.load(open(BASELINE_PATH))
        baseline.update(got)
        json.dump(
            dict(sorted(baseline.items())), open(BASELINE_PATH, "w"), indent=0
        )
        print(f"baseline written: {len(baseline)} queries -> {BASELINE_PATH}")
        return

    baseline = json.load(open(BASELINE_PATH)) if os.path.exists(BASELINE_PATH) else {}
    regressions, improvements, missing = [], [], []
    for name, counts in got.items():
        if name not in baseline:
            missing.append(name)
            continue
        base = baseline[name]
        for table, n in counts.items():
            b = base.get(table, 0)
            if n > b:
                regressions.append(
                    {"query": name, "table": table, "baseline": b, "now": n}
                )
            elif n < b:
                improvements.append(
                    {"query": name, "table": table, "baseline": b, "now": n}
                )
    for r in regressions:
        print(json.dumps({"REGRESSION": r}), flush=True)
    print(
        json.dumps(
            {
                "metric": "scan_audit",
                "queries_run": len(got),
                "regressions": len(regressions),
                "improvements": improvements,
                "missing_from_baseline": sorted(missing),
            }
        )
    )
    sys.exit(1 if regressions or missing else 0)


if __name__ == "__main__":
    main()
