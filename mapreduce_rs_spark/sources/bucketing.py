"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a big-big join (e.g. lineitem ⋈ orders)
is shuffling both sides on the key every time the join runs. Writing
both tables bucketed by the join key moves that shuffle to write time,
once: every subsequent join reads co-located buckets and the plan shows
NO Exchange above either scan. This is the Spark-native analog of the
reference's hash-partitioned intermediate files
(``src/mr/worker.rs:133-164``) — except persistent, reusable across
queries, and planned automatically once declared.

Bucket count rule of thumb: total_size / bucket_count ≈ 100-200 MB per
bucket per table; both sides must agree on count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int, *, sort: bool = True
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) table.
    The write repartitions on the bucket column first (repartition and
    bucketBy share the Murmur3 hash, so each write task holds exactly
    one bucket → one file per bucket, no small-file sprawl) — this is
    the write-time shuffle the whole pattern exists to pay once.

    Honest Spark-4 note: bucketed-scan OUTPUT ORDERING was removed in
    Spark 3.1+ (the legacy conf is gone in 4.x), so a merge join still
    inserts per-partition in-memory sorts above the scans even with
    sortBy — what bucketing eliminates is the EXCHANGE (the network
    cost that dominates at 100 TB); the residual local sorts are
    in-memory per bucket. sortBy is still worthwhile for row-group
    min/max skipping on the key."""
    src = df.repartition(n_buckets, bucket_col) if sort else df
    writer = src.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name, format="parquet")


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_equal: tuple[str, str]
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys —
    planned as a shuffle-free sort-merge join when bucket specs line
    up."""
    lk, rk = key_equal
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[lk] == right[rk])
