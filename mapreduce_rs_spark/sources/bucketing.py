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
    Sorting within buckets additionally enables merge-join without a
    sort step."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
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
