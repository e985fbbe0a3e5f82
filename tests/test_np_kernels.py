"""The Arrow-vectorized argmax kernels (similarity.py kernel block) must
be BIT-IDENTICAL to the interpreted HOF forms they twin — the exactness
contract that makes the at-scale flip of a call site a safe one-line
change (r13; the integration itself is a measured rejection at bench
SFs, OPTIMIZATION_r13.md)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.similarity import (
    _dkm_argmax_cid,
    _dkm_argmax_vec,
    _init_struct_arr,
    _nearest_centroid_expr,
    _nearest_centroid_vec,
    _rolled_state,
)

N_ROWS = 4000
K = 16
DIM = 64


def _base(spark):
    # Deterministic synthetic corpus with REPEATED rows (ties exercised:
    # every centroid also appears as a corpus row, so score ties between
    # scaled copies hit the tie-break rule).
    qv_sql = (
        "transform(sequence(0, 63), d -> "
        "pmod(xxhash64(pmod(id, 1000), d), 2000001L) - 1000000L)"
    )
    return (
        spark.range(N_ROWS, numPartitions=8)
        .select("id", F.expr(qv_sql).alias("qv"))
        .select(
            "id",
            "qv",
            F.expr("transform(qv, x -> CAST(x AS DOUBLE) / 1.0e6)").alias(
                "embd"
            ),
        )
    )


def _cents():
    rng = np.random.RandomState(20260817)
    cents_f = [
        [round(float(x), 6) for x in rng.normal(size=DIM)] for _ in range(K)
    ]
    cents_q = [[int(round(x * 1e6)) for x in c] for c in cents_f]
    return cents_f, cents_q


def test_dkm_argmax_vec_matches_hof(spark):
    _, cents_q = _cents()
    base = _base(spark)
    cent_df = (
        spark.range(1)
        .select(F.explode(F.expr(_init_struct_arr(cents_q))).alias("c"))
        .select(F.col("c.cid").alias("cid"), F.col("c.cq").alias("cq"))
    )
    hof = base.crossJoin(F.broadcast(_rolled_state(cent_df))).select(
        "id", _dkm_argmax_cid().alias("cid")
    )
    vec = base.select(
        "id", _dkm_argmax_vec(list(enumerate(cents_q)))("qv").alias("cid")
    )
    mism = (
        hof.alias("a")
        .join(vec.alias("b"), "id")
        .where(F.expr("a.cid <> b.cid"))
        .count()
    )
    assert mism == 0


def test_nearest_centroid_vec_matches_hof(spark):
    cents_f, _ = _cents()
    base = _base(spark)
    hof = base.select(
        "id", _nearest_centroid_expr("embd", cents_f).alias("cid")
    )
    vec = base.select(
        "id", _nearest_centroid_vec(cents_f)(F.col("embd")).alias("cid")
    )
    mism = (
        hof.alias("a")
        .join(vec.alias("b"), "id")
        .where(F.expr("a.cid <> b.cid"))
        .count()
    )
    assert mism == 0


def test_dkm_argmax_vec_tie_breaks_to_higher_cid(spark):
    # Duplicate centroid vectors -> exact score ties; the struct-max rule
    # (and therefore the kernel) must pick the HIGHER cid.
    cq = [[7] * DIM, [7] * DIM]
    df = spark.range(4).select(
        F.expr("transform(sequence(0, 63), d -> 5L)").alias("qv")
    )
    out = df.select(_dkm_argmax_vec(list(enumerate(cq)))("qv").alias("cid"))
    assert [r["cid"] for r in out.collect()] == [1, 1, 1, 1]
