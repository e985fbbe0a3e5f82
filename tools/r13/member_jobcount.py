#!/usr/bin/env python
"""Count Spark jobs + wall for one warmed noop run of a member (UI REST)
— the wsp_jobcount evidence pattern, generalized to any member.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r13/member_jobcount.py <member> [label]
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
    name = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark(
        "member_jobcount",
        **{
            "spark.sql.shuffle.partitions": os.environ["SPARK_GRAFT_CPUS"],
            "spark.ui.enabled": "true",
        },
    )
    sc = spark.sparkContext

    def run() -> float:
        t0 = time.monotonic()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.monotonic() - t0

    run()  # warm
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
    n0 = len(json.load(urllib.request.urlopen(base)))
    w1 = run()
    w2 = run()
    n1 = len(json.load(urllib.request.urlopen(base)))
    print(
        json.dumps(
            {
                "member": name,
                "label": label,
                "jobs_per_run": (n1 - n0) // 2,
                "wall_sec_best_of_2": round(min(w1, w2), 3),
                "walls": [round(w1, 3), round(w2, 3)],
            }
        )
    )


if __name__ == "__main__":
    main()
