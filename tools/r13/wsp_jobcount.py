#!/usr/bin/env python
"""Count Spark jobs + wall for one weighted_shortest_paths run (noop sink).

Evidence tool for r12 verdict #4 (fuse the per-round isEmpty probe into
the round's own materialization via observe()): the win is jobs-per-run,
which explain() cannot show. Reads the local UI REST API after the run.

Usage: python tools/r13/wsp_jobcount.py <label>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark(
        "wsp_jobcount",
        **{
            "spark.sql.shuffle.partitions": os.environ["SPARK_GRAFT_CPUS"],
            "spark.ui.enabled": "true",
        },
    )
    sc = spark.sparkContext

    # warm: one full run so the jobs we count are steady-state
    QUERIES["weighted_shortest_paths"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
    n0 = len(json.load(urllib.request.urlopen(base)))
    t0 = time.monotonic()
    QUERIES["weighted_shortest_paths"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    wall = time.monotonic() - t0
    jobs = json.load(urllib.request.urlopen(base))
    n1 = len(jobs)
    print(
        json.dumps(
            {
                "label": label,
                "jobs_per_run": n1 - n0,
                "wall_sec": round(wall, 3),
                "job_names": sorted(
                    {j.get("name", "?").split(" ")[0] for j in jobs[: n1 - n0]}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
