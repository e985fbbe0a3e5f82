"""Micro-bench: interpreted HOF dot/argmax kernels vs Arrow-vectorized
pandas_udf equivalents (r12 verdict item #3).

The r12 round measured 2.5x headroom on the HOF kernels in isolation but
proved naive SQL unrolling a dead end (JIT method limits). This probes the
OTHER named design: move ONLY the argmax/dot kernel to a vectorized
pandas_udf (guide §4.3), with arithmetic constructed to be bit-identical:

* BIGINT family (`_dkm_argmax_cid` shape): int64 matmul is exact — any
  summation order gives the same wrapping int64 result.
* DOUBLE family (`_centroid_scores_sql` shape): per-dimension vectorized
  accumulate (acc += Q[:,d] * C[:,d], d ascending) reproduces the SQL
  left-fold rounding sequence op-for-op (multiply then add, one rounding
  each, no FMA in either engine).

Prints one JSON line with per-variant wall seconds and exactness counts.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_rs_spark.session import get_spark  # noqa: E402
from mapreduce_rs_spark.operators.similarity import (  # noqa: E402
    _dkm_argmax_cid,
    _dkm_argmax_vec,
    _init_struct_arr,
    _nearest_centroid_expr,
    _nearest_centroid_vec,
    _rolled_state,
)

N_ROWS = 2_000_000
K = 16
DIM = 64


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    _noop(df)
    t = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return t


def main() -> None:
    spark = get_spark("kernel-microbench")
    rng = np.random.RandomState(20260817)
    cents_f = [[round(float(x), 6) for x in rng.normal(size=DIM)] for _ in range(K)]
    cents_q = [[int(round(x * 1e6)) for x in c] for c in cents_f]

    # Deterministic synthetic corpus: qv[d] = pmod(xxhash64(id, d), 2e6+1) - 1e6
    qv_sql = (
        "transform(sequence(0, 63), d -> "
        "pmod(xxhash64(id, d), 2000001L) - 1000000L)"
    )
    base = (
        spark.range(N_ROWS, numPartitions=64)
        .select(
            "id",
            F.expr(qv_sql).alias("qv"),
        )
        .select(
            "id",
            "qv",
            F.expr("transform(qv, x -> CAST(x AS DOUBLE) / 1.0e6)").alias("embd"),
        )
        .localCheckpoint()
    )

    # ---- BIGINT argmax variants --------------------------------------
    cent_df = (
        spark.range(1)
        .select(F.explode(F.expr(_init_struct_arr(cents_q))).alias("c"))
        .select(F.col("c.cid").alias("cid"), F.col("c.cq").alias("cq"))
    )
    hof_int = base.crossJoin(F.broadcast(_rolled_state(cent_df))).select(
        "id", _dkm_argmax_cid().alias("cid")
    )

    udf_int = base.select(
        "id",
        _dkm_argmax_vec(list(enumerate(cents_q)))("qv").alias("cid"),
    )

    # ---- DOUBLE argmax variants --------------------------------------
    hof_dbl = base.select(
        "id", _nearest_centroid_expr("embd", cents_f).alias("cid")
    )
    udf_dbl = base.select(
        "id", _nearest_centroid_vec(cents_f)(F.col("embd")).alias("cid")
    )

    results: dict[str, float] = {}
    # Warm both paths once (worker pool, codegen), then time best-of-2.
    for label, df in [
        ("hof_int", hof_int),
        ("udf_int", udf_int),
        ("hof_dbl", hof_dbl),
        ("udf_dbl", udf_dbl),
    ]:
        _timed(spark, f"warm:{label}", df)
        results[label] = min(
            _timed(spark, f"{label}:p1", df), _timed(spark, f"{label}:p2", df)
        )

    # Exactness: every row's cid must agree between HOF and UDF forms.
    mism_int = (
        hof_int.alias("a")
        .join(udf_int.alias("b"), "id")
        .where(F.expr("a.cid <> b.cid"))
        .count()
    )
    mism_dbl = (
        hof_dbl.alias("a")
        .join(udf_dbl.alias("b"), "id")
        .where(F.expr("a.cid <> b.cid"))
        .count()
    )

    print(
        json.dumps(
            {
                "n_rows": N_ROWS,
                "k": K,
                "dim": DIM,
                "sec": {k: round(v, 3) for k, v in results.items()},
                "speedup_int": round(results["hof_int"] / results["udf_int"], 2),
                "speedup_dbl": round(results["hof_dbl"] / results["udf_dbl"], 2),
                "mismatch_int": mism_int,
                "mismatch_dbl": mism_dbl,
            }
        )
    )


if __name__ == "__main__":
    main()
