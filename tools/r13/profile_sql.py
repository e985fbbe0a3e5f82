#!/usr/bin/env python
"""One warmed noop run of a member with the UI on; dump the SQL plan
node metrics (guide §7.1 — SQL tab, machine-readable).

Usage: SPARK_GRAFT_SF_DIR=... python tools/r13/profile_sql.py <member>
"""

from __future__ import annotations

import json
import os
import re
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from mapreduce_rs_spark.plans.registry import QUERIES
    from mapreduce_rs_spark.session import get_spark

    spark = get_spark(
        "profile_sql",
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

    run()
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    q0 = {
        e["id"]
        for e in json.load(urllib.request.urlopen(f"{api}/sql?length=10000"))
    }
    wall = run()
    execs = [
        e
        for e in json.load(
            urllib.request.urlopen(f"{api}/sql?details=true&planDescription=false&length=10000")
        )
        if e["id"] not in q0
    ]
    print(f"member={name} wall={wall:.2f}s n_sql_execs={len(execs)}")
    rows = []
    for e in execs:
        for node in e.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            tot = 0.0
            for k, v in mets.items():
                if "total time" in k or "time in aggregation" in k or "time to" in k:
                    m = re.search(r"total (?:\(min, med, max[^)]*\))?", k)
                    # parse "total (min, med, max ...)" strings: value like
                    # "12.3 s (1 ms, 380 ms, 1.2 s ...)" — take the first part
                    first = v.split("(")[0].strip()
                    mul = (
                        3600000 if first.endswith(" h")
                        else 60000 if first.endswith(" m")
                        else 1000 if first.endswith(" s")
                        else 1 if first.endswith(" ms")
                        else None
                    )
                    if mul:
                        try:
                            tot = max(tot, float(first.split()[0]) * mul)
                        except ValueError:
                            pass
            rows.append((tot, e["id"], node["nodeName"], {k: v.split("(")[0].strip() for k, v in mets.items() if "time" in k}))
    rows.sort(reverse=True)
    for tot, eid, nname, mets in rows[:20]:
        print(f"{tot/1000:9.2f}s  exec={eid}  {nname}  {mets}")


if __name__ == "__main__":
    main()
