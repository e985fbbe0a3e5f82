"""Partitioning utilities: parallelism rescue and skew salting.

The reference fixes parallelism at argv time (map_n == file count,
``src/bin/mrcoordinator.rs:13-16``) — one small file means one task no
matter how many workers. Spark inherits a milder version of the same
trap: a single small parquet file is one input split, so a CPU-heavy
narrow stage (per-token md5, per-vector cosine) runs on one core while
31 idle. ``ensure_parallelism`` widens exactly that case and is a
plan-time no-op whenever the scan already has enough splits — at 100 TB
inputs arrive in thousands of splits and no extra shuffle is added.

``salted_group_count`` is the standard two-phase aggregation for skewed
keys: shuffle on (key, salt) first so one hot key spreads over N
reducers, then merge the partials. AQE's skew handling covers joins;
this covers the hot-key aggregate case it doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _estimated_scan_splits(df: DataFrame, target: int) -> int | None:
    """Estimate how many input splits the file scan under ``df`` will
    produce, from the FILE INDEX alone — no physical planning, no RDD
    conversion (ADVICE r07: ``df.rdd.getNumPartitions()`` at every call
    site eagerly planned the upstream subtree and baked a build-time
    count into the plan).

    Mirrors ``FilePartition.maxSplitBytes``: each file pads
    ``openCostInBytes``; the split size is
    ``min(maxPartitionBytes, max(openCost, totalPadded/target))`` and
    files pack greedily. Two consequences this relies on:

    * ``len(files) >= target`` alone implies >= ~target partitions (the
      per-file open cost stops small files collapsing into one split),
      so the common at-scale case short-circuits before any size lookup;
    * otherwise the handful of file sizes come from one Hadoop
      ``getFileStatus`` each — metadata the driver's file index has
      already touched to plan the scan at all.

    Returns None when the plan has no file source (in-memory ranges,
    streaming) — callers fall back to the RDD count.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= target:
        return len(files)
    try:
        spark = df.sparkSession
        conf = spark._jsc.hadoopConfiguration()
        jvm = spark._jvm
        sizes = []
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            sizes.append(p.getFileSystem(conf).getFileStatus(p).getLen())
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        total = sum(sizes) + open_cost * len(sizes)
        split = min(max_pb, max(open_cost, total // max(target, 1)))
        return max(1, -(-total // split))  # ceil division
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, *cols: str, min_partitions: int | None = None) -> DataFrame:
    """Repartition only if the scan under ``df`` will produce fewer
    splits than the cluster has cores — the 'one small file' rescue.
    ``cols`` keys the redistribution (keeps later groupBys on the same
    keys local); without cols, round-robin.

    The split count is read from the scan's file index (sizes +
    open-cost packing, ``_estimated_scan_splits``), not from
    ``df.rdd`` — so the check neither forces physical planning of the
    subtree nor bakes a runtime-dependent partition count into the
    plan; non-file sources fall back to the RDD count."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    splits = _estimated_scan_splits(df, target)
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)


def with_salt(df: DataFrame, n_salts: int, *, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a stable
    hash of the FULL row — NOT rand(), so retried tasks produce
    identical output (Spark may recompute partitions after failures;
    nondeterministic salting breaks exactly-once semantics).

    Only spreads a hot KEY if the rows carrying it differ in other
    columns; for key-only rows use a partition-id salt (see
    ``salted_group_count``)."""
    stable = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(stable, F.lit(n_salts)))


# Skew findings measured on a 10M-row table with 50% of rows on ONE key
# (SCALE.md "Skew rescue A/B", round 5):
# * algebraic aggregates: plain groupBy().count() == salted two-phase
#   (0.45 s both) — map-side combine bounds reducer input to one row per
#   (partition, key), exactly as this module documents;
# * exact countDistinct needs NO rescue on Spark 4: the planner already
#   pair-shuffles (partial dedup keyed on (key, value), then an
#   algebraic per-key count) — verified in the physical plan;
# * HOLISTIC aggregates (collect_list/collect_set) are where the salted
#   two-phase pattern genuinely rescues: 0.68 -> 0.41 s (1.69x) at 10M;
# * skewed JOINS are AQE's job (2.8x measured), BUT OptimizeSkewedJoin
#   only matches SMJ whose children are BARE shuffle stages — an
#   aggregate between the exchange and the join (output partitioning
#   already satisfies the join) defeats the rule silently. When the
#   probe side of a big join is skewed, join the RAW shuffled relations
#   and aggregate after, or salt explicitly.


def salted_group_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation.

    The salt is the input partition id (mod n_salts) — deterministic
    under task retry, and it spreads a hot key across reducers by
    construction, because the hot key's rows live in many input
    partitions (a row-hash or key-hash salt would collapse to one value
    for identical hot-key rows and provide no relief). Phase 2 merges
    the ≤ n_salts partials per key. Result identical to a plain
    groupBy().count() (property-tested).

    Note: for algebraic aggregates Spark's map-side partial aggregation
    already bounds reducer skew to one row per (partition, key); the
    two-phase pattern matters for holistic aggregates
    (collect_list/exact distinct) and is exposed here in its simplest
    verifiable form."""
    salted = df.select(key).withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias("cnt"))
