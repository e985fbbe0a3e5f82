"""Source connectors: text, csv, json, parquet, orc.

The reference supports exactly one source — whole UTF-8 text files read
into memory (reference ``src/mr/worker.rs:88-99``). ``read_text`` is its
Spark equivalent (line-per-row, splittable, never whole-file-in-memory);
the others generalize the surface the way any Spark user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text(
    spark: SparkSession, path: str, *, whole_file: bool = False, with_filename: bool = False
) -> DataFrame:
    """Read text file(s) into a DataFrame.

    Default: one row per line (column ``value``) — Spark computes its own
    splits, so a 100 GB file becomes hundreds of parallel tasks instead of
    the reference's one-file-one-task rule (``src/bin/mrcoordinator.rs:13-16``).

    ``whole_file=True`` reproduces the reference's exact per-file
    semantics (column ``value`` holds the entire file) — only safe for
    bounded file sizes, same caveat as the reference's ``read_to_string``.

    ``with_filename=True`` adds an ``input_file`` column, the analog of
    the reference's map-task-id ↔ filename identity.
    """
    df = spark.read.text(path, wholetext=whole_file)
    if with_filename:
        df = df.withColumn("input_file", F.input_file_name())
    return df


def _with_corrupt_col(schema: StructType | str, corrupt_col: str) -> StructType | str:
    """Spark only populates columnNameOfCorruptRecord if that column is
    part of the schema — append it (DDL strings get a string append)."""
    if isinstance(schema, str):
        return f"{schema}, {corrupt_col} STRING"
    from pyspark.sql.types import StringType, StructField

    return StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """CSV source. Prefer an explicit schema: inference scans the data
    twice, and at 100 TB the inference pass alone is a full job.

    Malformed-record policy (at 100 TB some records WILL be malformed;
    the job must quarantine them, not die): PERMISSIVE (default) nulls
    the unparseable fields and, when ``corrupt_col`` is set (requires an
    explicit schema), preserves the raw line there for a quarantine
    sink; DROPMALFORMED silently drops; FAILFAST turns the first bad
    record into a loud job failure for contract-critical feeds.
    """
    reader = spark.read.option("header", header).option("sep", sep).option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        schema = _with_corrupt_col(schema, corrupt_col)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines source; same explicit-schema and malformed-record
    guidance as :func:`read_csv`."""
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        schema = _with_corrupt_col(schema, corrupt_col)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(
    spark: SparkSession, path: str, *, merge_schema: bool = False
) -> DataFrame:
    """Parquet source — the primary format: columnar, splittable, with
    predicate pushdown and column pruning reaching the scan.

    ``merge_schema=True`` unions the footer schemas of every file in
    the path (Spark's schema-evolution read): columns added by newer
    writers surface as nullable, old files fill them with NULL. Off by
    default because footer merging is an extra per-file metadata pass —
    a long-lived 100 TB table should evolve through an explicit catalog
    schema instead, but an append-only landing zone written by multiple
    producer versions needs exactly this."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — the other columnar format with full pushdown/pruning
    support in Spark's native reader; interchangeable with parquet for
    every operator in this engine (the catalog is format-agnostic above
    the reader)."""
    return spark.read.orc(path)
