#!/usr/bin/env python
"""One-task-stage sweep: find registry queries that serialize CPU-heavy
work onto a single core.

The failure signature this hunts (SCALE.md round 7) is a completed
stage with ``numTasks == 1`` whose ``executorRunTime`` exceeds a
threshold — work running on one core while the other 31 idle. Two
distinct root causes produce it, and both are silent in correctness
tests and in small-SF benches:

* **single-split input**: one small parquet file is one input split,
  so a narrow tokenize/gram/hash leg and its partial aggregates run as
  one task (the reference's own map_n == file-count trap,
  ``src/bin/mrcoordinator.rs:13-16``). Fix: ``ensure_parallelism``
  at the operator (plan-time no-op at real scale).
* **AQE coalesce on a cheap-bytes/expensive-CPU exchange**: AQE sizes
  post-shuffle partitions by BYTES; a ~1 MB exchange feeding a 53 M-row
  expansion coalesces to ONE task (entity_match, 147 s single-task
  stage). Fix: a pinned-N repartition (REPARTITION_BY_NUM is exempt
  from AQE coalescing) keyed so the planner cannot elide it.

Method: run each query end-to-end to the noop sink, then read the
Spark UI REST API (``/api/v1/applications/{app}/stages``) and
attribute the stages that completed during that query's window. Byte
counters are useless here — Spark 4's vectorized parquet reader ticks
neither stage inputBytes nor Hadoop FS statistics — but task counts
and executor run time are exact.

Usage (sf1.0 is where the signal lives; small SFs rarely cross 3 s):

    python tools/one_task_sweep.py --sf-dir /root/repo/.localdata/sf1.0
    python tools/one_task_sweep.py --queries entity_match_customers,dsir_importance_weights
    python tools/one_task_sweep.py --threshold-sec 1.0   # lower bar

Prints one JSON line per query with its flagged stages, then a summary
JSON line; exit code 1 if anything was flagged (CI-friendly).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _rest_stages(ui_url: str, app_id: str) -> list[dict]:
    url = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.load(resp)


def sweep(
    sf_dir: str,
    names: list[str] | None = None,
    threshold_sec: float = 3.0,
) -> list[dict]:
    """Run the named queries (default: whole registry) and return one
    record per query: {query, wall_sec, flagged: [stage records]}."""
    # get_spark, NOT a vanilla builder: ad-hoc sessions default to a
    # 1 g driver heap and OOM/crawl at sf1.0 (SCALE.md r07 gotcha).
    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    # the engine default disables the UI (costs a port + startup time
    # per session); the sweep IS the UI's REST consumer, so re-enable
    # it — static conf, must land before the JVM exists
    spark = get_spark("one_task_sweep", **{"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui_url, app_id = sc.uiWebUrl, sc.applicationId
    if not ui_url:
        raise RuntimeError("Spark UI disabled — the sweep needs the REST API")

    names = names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: list[dict] = []
    seen_stage_ids = {s["stageId"] for s in _rest_stages(ui_url, app_id)}
    for name in names:
        start = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - start, 2)
        stages = _rest_stages(ui_url, app_id)
        new = [s for s in stages if s["stageId"] not in seen_stage_ids]
        seen_stage_ids.update(s["stageId"] for s in new)
        flagged = [
            {
                "stage_id": s["stageId"],
                "run_time_sec": round(s["executorRunTime"] / 1000.0, 2),
                "name": s.get("name", "")[:120],
            }
            for s in new
            if s["numTasks"] == 1
            and s["executorRunTime"] > threshold_sec * 1000
        ]
        rec = {"query": name, "wall_sec": wall, "flagged": flagged}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma-separated names (default: all)")
    ap.add_argument("--threshold-sec", type=float, default=3.0)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else None
    records = sweep(args.sf_dir, names, args.threshold_sec)
    hot = [r for r in records if r["flagged"]]
    print(
        json.dumps(
            {
                "metric": "one_task_stages_flagged",
                "sf_dir": args.sf_dir,
                "threshold_sec": args.threshold_sec,
                "queries_run": len(records),
                "queries_flagged": sorted(r["query"] for r in hot),
            }
        )
    )
    sys.exit(1 if hot else 0)


if __name__ == "__main__":
    main()
