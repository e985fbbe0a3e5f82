"""Deterministic, engine-portable sampling.

``df.sample`` / ``sampleBy`` seed their RNG per partition, so their
output CHANGES with partitioning — useless for an oracle contract and
dangerous at scale (a repartition silently changes your training
sample). The portable alternative: hash-based systematic sampling —
a row is in the p% sample iff ``h(key) % m < p·m/100`` with the
md5-derived portable hash (functions/hashing.py). Properties a 100 TB
pipeline needs:

* deterministic under any partitioning, executor count, or retry;
* consistent across runs AND engines (the DuckDB oracle reproduces the
  exact sample, not just its statistics);
* stratification is free: the predicate is per-row, so per-stratum
  rates just vary the threshold;
* coordinated samples: the same key hashes identically in other tables,
  so joins of samples stay consistent (the "consistent sampling" trick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_rs_spark.functions.hashing import h32

SAMPLE_MOD = 100


def in_sample(key: Column, pct: int) -> Column:
    """True for the deterministic ``pct``% sample of rows by key."""
    return h32(key.cast("string")) % SAMPLE_MOD < pct


def stratified_sample_summary(df: DataFrame, pct: int = 10) -> DataFrame:
    """Per-language accounting of a deterministic ``pct``% document
    sample: totals, sampled counts, sampled char volume, and the
    realized rate (hash-systematic sampling is close to but not exactly
    pct% — the realized-rate column is the sanity check a pipeline
    monitors)."""
    sampled = F.when(in_sample(F.col("doc_id"), pct), 1).otherwise(0)
    return (
        df.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sampled).cast("long").alias("n_sampled"),
            F.sum(F.when(sampled == 1, F.col("n_chars")).otherwise(0)).cast("long").alias("sampled_chars"),
            (F.sum(sampled).cast("double") / F.count(F.lit(1))).alias("realized_rate"),
        )
    )
