"""Sinks.

The reference's sink is ``"{key} {value}\\n"`` lines appended to
``mr-{reduce_id}.txt`` followed by a shell ``cat mr-* | sort`` merge
(reference ``src/mr/worker.rs:201-215``, ``src/Makefile:8-10``).
``write_sorted_text`` reproduces that final artifact with a total order
via Spark's range-partitioned sort instead of a single-process shell sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_text(
    df: DataFrame, path: str, *, key: str = "key", value: str = "value", mode: str = "overwrite"
) -> None:
    """Write ``"{key} {value}"`` lines, globally ordered by key.

    ``orderBy`` uses range partitioning (sampled split points), so the
    total order is distributed — each output part file is a contiguous
    key range, and ``cat part-*`` reproduces the reference's
    ``final.txt`` without a driver-side sort.
    """
    (
        df.select(F.concat_ws(" ", F.col(key).cast("string"), F.col(value).cast("string")).alias("value"))
        .orderBy(key)
        .write.mode(mode)
        .text(path)
    )


def write_parquet(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Parquet sink; ``partition_by`` gives downstream partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink — same partitioning semantics as the parquet sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    df: DataFrame,
    path: str,
    *,
    target_file_rows: int,
    mode: str = "overwrite",
) -> None:
    """Small-file compaction — the maintenance job every streaming/
    incremental sink eventually needs: micro-batches and per-task
    writers leave thousands of KB-sized files, and at 100 TB the
    resulting scan-planning and open() overhead dominates (the classic
    small-files problem; NameNode/listing pressure on real storage).

    Two controls compose: ``repartition(ceil(n / target))`` bounds the
    number of write tasks (one file each here), and
    ``maxRecordsPerFile`` caps rows per file so a future append-heavy
    caller can't silently produce monster files either. The count() to
    size the repartition is one cheap parquet-metadata job.
    """
    n = df.count()
    n_files = max(1, -(-n // target_file_rows))
    (
        df.repartition(n_files)
        .write.option("maxRecordsPerFile", target_file_rows)
        .mode(mode)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Z-ordered parquet sink (Delta/Iceberg OPTIMIZE ZORDER as a write
    path): interleave the bits of two integer columns into a Morton
    key, range-partition the data into ``n_files`` z-ranges and sort
    within each — so every output file's min/max footer statistics are
    tight on BOTH columns and a reader's zone-map pruning works for
    predicates on either (the layout zorder_locality/zone_map_pruning
    EVALUATE, turned into an actual sink).

    Both dimensions are normalized to the full 16-bit range with exact
    integer min/max scaling (one 1-row broadcast — without it a small
    key domain leaves the interleave's high bits dead and the curve
    degenerates to one file); the scaling product is lifted into
    DECIMAL(38,0) so arbitrarily wide integer domains (snowflake-style
    ids) cannot wrap int64 and silently corrupt the layout. The z key
    is dropped before writing.
    """
    from mapreduce_rs_spark.functions.morton import morton_sql, normalize16_sql

    bounds = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_za", F.expr(normalize16_sql(col_a, "_amin", "_amax"))
    ).withColumn(
        "_zb", F.expr(normalize16_sql(col_b, "_bmin", "_bmax"))
    ).withColumn(
        "_z", F.expr(morton_sql("_za", "_zb"))
    ).drop("_amin", "_amax", "_bmin", "_bmax", "_za", "_zb")
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
