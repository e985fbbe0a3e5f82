"""mapreduce_rs_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``xzhseh/MapReduce-rs`` (a Rust MapReduce framework in the
MIT-6.824 style: map → hash-shuffle → sort → reduce over text files, with
word count as its single application).

Instead of porting the reference's coordinator/worker/RPC machinery
(reference ``src/mr/coordinator.rs``, ``src/bin/mr{coordinator,worker}.rs``),
this engine declares logical plans with the DataFrame/SQL API and lets
Catalyst + Tungsten pick physical strategies; Spark's DAG scheduler, task
retry, and shuffle service subsume the reference's scheduler, lease-based
failure detection, and intermediate-file shuffle (SURVEY.md §2 ops 13-18).

Layout:
    sources/    — readers (parquet/text/csv/json) and writers
    functions/  — column-expression helpers (text, hashing, vectors),
                  each portable to an ANSI-SQL (DuckDB) oracle form
    operators/  — dataflow operators: the generalized map/reduce surface,
                  relational queries, text analysis, dedup, similarity,
                  event/time-series ops, multimodal plumbing
    plans/      — the query registry: every operator exposed as a named
                  (spark_fn, oracle_sql) pair for the correctness gate
    streaming/  — Structured Streaming variants (watermarks, windows,
                  stateful ops)
"""

__version__ = "0.1.0"

from mapreduce_rs_spark.session import get_spark  # noqa: F401
