"""Memory-pressure demonstration: big sort completes by SPILLING.

The reference holds whole input files and whole reduce partitions in
memory (``src/mr/worker.rs:96-98, 113-115, 193-197``) — a workload
larger than RAM simply dies; SURVEY.md §4 calls spill "a required
upgrade". This test closes the claim with evidence: a global sort of
the full sf0.1 lineitem table (600 k rows, all 11 columns) under a
deliberately tiny execution-memory budget (``spark.memory.fraction=
0.05`` ≈ 50 MB for execution+storage) must spill — asserted via the
status API's memoryBytesSpilled/diskBytesSpilled, not assumed — and
still completes with the right row count and aggregate checksum.

Runs in a subprocess: memory confs are read at SparkContext creation,
and the suite's shared session must not be torn down.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

_PROBE = textwrap.dedent(
    """
    import json, urllib.request
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("spill-probe")
        .config("spark.memory.fraction", "0.05")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    checksum = li.agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]

    # Global range-partitioned sort of the wide table: execution memory
    # is ~25x smaller than the data, so UnsafeExternalSorter must spill.
    out = li.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    out.write.format("noop").mode("overwrite").save()

    # The same squeezed session must also produce correct values, not
    # just survive: re-aggregate THROUGH the sort.
    after = out.agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]

    url = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId + "/stages"
    stages = json.load(urllib.request.urlopen(url))
    print(json.dumps({
        "n": checksum["n"], "s": checksum["s"],
        "n_after": after["n"], "s_after": after["s"],
        "memSpilled": sum(st.get("memoryBytesSpilled", 0) for st in stages),
        "diskSpilled": sum(st.get("diskBytesSpilled", 0) for st in stages),
    }))
    spark.stop()
    """
)


def test_big_sort_spills_and_completes():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["n"] == 600_000
    assert r["n_after"] == r["n"]
    assert r["s_after"] == r["s"]
    # The evidence: the engine actually spilled rather than OOMing
    # (observed ~50 MB memory / ~20 MB disk under this squeeze).
    assert r["memSpilled"] > 0
    assert r["diskSpilled"] > 0
