"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (word count with the reference's
exact semantics, ``/root/reference/src/mr/function.rs:9-20``) over the
sf0.001 documents table. ``queries()`` / ``oracle_sql()`` expose the full
operator registry from ``mapreduce_rs_spark.plans.registry`` — every
implemented operator from SURVEY.md §2 plus the beyond-reference dedup /
similarity / text-analysis / events surface, each paired with the DuckDB
oracle SQL the driver hash-compares against at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The driver may import this file from any cwd; make the package
# resolvable relative to this file.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rs_spark.operators.text_analysis import word_count
from mapreduce_rs_spark.plans import registry
from mapreduce_rs_spark.sources.catalog import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return word_count(load_table(spark, SMOKE_SF_DIR, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north-star ops)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return registry.oracle_sql()
