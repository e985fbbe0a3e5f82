#!/usr/bin/env python
"""Full-registry Spark-vs-DuckDB parity sweep at an arbitrary SF.

The per-round standing claim (SCALE.md) is "every registry query is
value-exact vs the oracle at sf1.0"; until now the sweep backing it was
an ad-hoc script pasted into each session. This commits it as the
third leg of the regression toolbox (one_task_sweep = stage health,
scan_audit = clone health, parity_sweep = value health).

Method: the driver's own comparison, at scale — run each registry
query's driver form (operator + presentation sort) on a get_spark
session (16 g heap: vanilla 1 g sessions OOM or crawl at sf1.0 —
BASELINE.md's poisoned-A/B lesson; values are session-independent),
toPandas, replay the oracle SQL in DuckDB over the same parquet, and
assert row counts, schemas, and values via tests/parity's
sort-and-compare (bit-exact on non-floats, 1e-9 rel on floats — the
driver's own hash gate is stricter on floats, which is why money/value
sums are DECIMAL-accumulated on both sides by construction).

Usage:
    python tools/parity_sweep.py --sf-dir /root/repo/.localdata/sf1.0
    python tools/parity_sweep.py --queries nn_descent_recall,knn_pq
    python tools/parity_sweep.py --sf-dir /root/testdata/sf0.01
    python tools/parity_sweep.py --sf-dir .localdata/sf3.0 --resume run.jsonl

Prints OK/FAIL per query, then one JSON summary line; exit 1 on any
failure. Rows-only queries (no oracle) are run and counted.

``--resume <path>`` makes the sweep RESUMABLE (r10 verdict #3: the
whole-registry sf3.0 sweep is hours-scale and environment-bound — a
loud co-tenant window shouldn't throw away a half-finished run): every
per-query verdict appends to the JSONL ledger as it lands, and a rerun
with the same ledger skips queries already recorded OK there — a quiet
window finishes what a loud one started. FAILed queries re-run (a
contention-killed query is not a parity failure). The summary line
counts ledger-skipped queries separately so the standing claim can
cite one ledger = one complete sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1.0")
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument(
        "--resume",
        default=None,
        help="JSONL ledger path: append per-query verdicts; skip prior OKs",
    )
    args = ap.parse_args()

    from mapreduce_rs_spark.plans.registry import QUERIES, queries
    from mapreduce_rs_spark.session import get_spark
    from tests.parity import assert_frames_match, run_oracle

    done_ok: set[str] = set()
    if args.resume and os.path.exists(args.resume):
        with open(args.resume) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("ok") and rec.get("sf_dir") == args.sf_dir:
                    done_ok.add(rec["query"])

    spark = get_spark("parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    driver_form = queries()
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in driver_form]
        if unknown:
            # A typo must be an argument error, not a recorded parity
            # failure backing a standing claim (review finding).
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
    else:
        names = sorted(driver_form)
    ledger = open(args.resume, "a") if args.resume else None
    t0 = time.time()
    bad: list[str] = []
    rows_only = 0
    skipped = 0
    for name in names:
        if name in done_ok:
            skipped += 1
            print(f"SKIP {name} (ledger OK)", flush=True)
            continue
        tq = time.time()
        try:
            sp = driver_form[name](spark, args.sf_dir).toPandas()
            spec = QUERIES[name]
            if spec.oracle is not None:
                assert_frames_match(
                    sp, run_oracle(spec.oracle, args.sf_dir), name
                )
            else:
                rows_only += 1
            print(f"OK {name} rows={len(sp)}", flush=True)
            rec = {
                "query": name,
                "sf_dir": args.sf_dir,
                "ok": True,
                "rows": len(sp),
                "rows_only": spec.oracle is None,
                "sec": round(time.time() - tq, 1),
            }
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"FAIL {name} {str(e)[:200]}", flush=True)
            rec = {
                "query": name,
                "sf_dir": args.sf_dir,
                "ok": False,
                "err": str(e)[:300],
                "sec": round(time.time() - tq, 1),
            }
        if ledger:
            ledger.write(json.dumps(rec) + "\n")
            ledger.flush()
    if ledger:
        ledger.close()
    print(
        json.dumps(
            {
                "metric": "parity_sweep",
                "sf_dir": args.sf_dir,
                "queries_run": len(names) - skipped,
                "ledger_skipped": skipped,
                "rows_only": rows_only,
                "failures": bad,
                "wall_min": round((time.time() - t0) / 60, 1),
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
