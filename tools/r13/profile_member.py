#!/usr/bin/env python
"""One warmed noop run of a member with the UI on; dump per-stage wall,
task count and executor CPU from the REST API (guide §7.1 evidence).

Usage: SPARK_GRAFT_SF_DIR=... python tools/r13/profile_member.py <member>
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
    warm = "--cold" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark(
        "profile_member",
        **{
            "spark.sql.shuffle.partitions": cpus,
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

    if warm:
        run()
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    j0 = {j["jobId"] for j in json.load(urllib.request.urlopen(f"{api}/jobs"))}
    s0 = {
        s["stageId"]
        for s in json.load(urllib.request.urlopen(f"{api}/stages"))
    }
    wall = run()
    jobs = [
        j
        for j in json.load(urllib.request.urlopen(f"{api}/jobs"))
        if j["jobId"] not in j0
    ]
    stages = [
        s
        for s in json.load(urllib.request.urlopen(f"{api}/stages"))
        if s["stageId"] not in s0 and s["status"] != "SKIPPED"
    ]
    rows = []
    for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0)):
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "runTime_ms": s.get("executorRunTime"),
                "cpuTime_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "sched_ms": s.get("schedulerDelay", None),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "shuffle_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "gc_ms": s.get("jvmGcTime"),
                "deser_ms": s.get("executorDeserializeTime"),
            }
        )
    job_wall = sum(
        (
            time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            - time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
        )
        for j in jobs
        if j.get("completionTime")
    )
    print(
        json.dumps(
            {
                "member": name,
                "wall_sec": round(wall, 3),
                "n_jobs": len(jobs),
                "approx_sum_job_wall_sec": round(job_wall, 1),
                "stages_by_runtime": rows[:25],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
