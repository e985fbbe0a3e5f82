"""Table catalog over the driver-provided parquet test data.

The reference's only "catalog" is a filename convention — one text file per
map task, ``resource/pg-{map_task_id}.txt`` (reference
``src/bin/mrcoordinator.rs:13-16``, ``src/mr/worker.rs:88-99``). Here the
catalog is the TPC-H-ish star schema plus LLM-pipeline tables described in
TESTDATA.md, loaded as parquet DataFrames with real typed schemas.

Parquet scans go through Spark's DataSource V2 path: column pruning and
predicate pushdown reach the file scan (check ``ReadSchema`` /
``PushedFilters`` in ``.explain``), which is the 100 TB-scale reason to
keep sources declarative rather than whole-file reads like the reference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions that stay broadcast-size at any realistic scale factor.
# region/nation are fixed-cardinality; supplier/part grow slowly vs fact
# tables. Used by operators to hint broadcast joins explicitly.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


# Columns that have shipped as parquet TIMESTAMP(NANOS) in some testdata
# generations, which Spark's reader rejects outright. For those files we
# read the column as raw nanosecond longs (legacy conf below) and rebuild a
# microsecond timestamp with exact integer division — `div`, not `/`,
# because 1.7e18 exceeds double's 2^53 exact-integer range. Other
# generations store the same column as TIMESTAMP(MICROS), which the legacy
# conf leaves untouched — so the rebuild below is TYPE-CONDITIONAL: it
# inspects what the scan actually produced instead of assuming a physical
# type the data files may no longer use.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    # Defensive: the caller may hand us a vanilla session (the driver
    # does). Timestamp semantics must be UTC to match the DuckDB oracle,
    # and this is a dynamic conf, safe to set per-session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        # Scope the legacy conf to THIS read: it's consulted only at
        # schema resolution (verified: execution succeeds after
        # restore), and leaving it on session-wide would make any
        # later-added table with a nanos column silently read as raw
        # BIGINT instead of failing loudly at load time.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        for col in nano_cols:
            dtype = df.schema[col].dataType.typeName()
            if dtype in ("long", "bigint"):
                # Parquet NANOS generation: raw nanos long → micros ts.
                df = df.withColumn(
                    col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
                )
            elif dtype == "timestamp_ntz":
                # Parquet MICROS (isAdjustedToUTC=false) generation: Spark
                # reads TIMESTAMP_NTZ. Cast to session-local TIMESTAMP —
                # the session is pinned UTC above, so wall values are
                # unchanged and downstream operators/oracles see the same
                # type every generation.
                df = df.withColumn(col, F.col(col).cast("timestamp"))
            # plain "timestamp": already what every operator expects.
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full catalog as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, text: str):
    """Run an arbitrary SQL statement against the catalog: every table
    registered as a temp view, then ``spark.sql(text)`` — the engine's
    ad-hoc SQL surface (also reachable as
    ``python -m mapreduce_rs_spark sql "..."``). Catalyst plans the
    text exactly like the DataFrame registry queries — same pushdown,
    pruning, AQE."""
    register_views(spark, sf_dir)
    return spark.sql(text)
