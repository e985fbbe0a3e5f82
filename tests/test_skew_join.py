"""AQE skew-join demonstration: a hot key splits at runtime.

The engine's skew story has two tools: deterministic salting
(``operators/partitioning.py``, property-tested) for aggregations you
control, and AQE's runtime skew-join split for joins — claimed
throughout the docs, demonstrated here. A 2M-row join where ONE key
holds 90% of the rows executes as a SortMergeJoin whose skewed
partition AQE splits into advisory-sized chunks
(``SortMergeJoin(skew=true)`` + ``AQEShuffleRead coalesced and
skewed`` in the executed plan, read back via the SQL status API), and
the values come out exactly right. ``forceOptimizeSkewedJoin`` lifts
AQE's "no extra shuffle" guard so the split applies regardless of
downstream distribution requirements — the setting a 100 TB job with a
known-hot key runs with.

Runs in a subprocess: AQE/threshold confs must exist before the join
plans, and the suite's shared session must not be torn down.
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
        .appName("skew-join-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    # key 0: 1.8M rows (90%); keys 1..99: ~2k rows each
    left = spark.range(0, 2_000_000).select(
        F.when(F.col("id") < 1_800_000, 0)
         .otherwise((F.col("id") % 99) + 1).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    joined = left.join(right, "k")
    joined.write.format("noop").mode("overwrite").save()
    got = joined.agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    ).collect()[0]

    url = (sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
           + "/sql?details=true&planDescription=true&length=50")
    execs = json.load(urllib.request.urlopen(url))
    skew = any(
        "SortMergeJoin(skew=true)" in (e.get("planDescription") or "")
        for e in execs
    )
    print(json.dumps({"n": got["n"], "sw": got["sw"], "skew_split": skew}))
    spark.stop()
    """
)


def test_aqe_splits_the_hot_key():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    # exact values through the skewed join
    expected_sw = 1_800_000 * 0 + sum(
        ((i % 99) + 1) * 10 for i in range(1_800_000, 2_000_000)
    )
    assert r["n"] == 2_000_000
    assert r["sw"] == expected_sw
    # and the executed plan really split the hot partition
    assert r["skew_split"] is True
