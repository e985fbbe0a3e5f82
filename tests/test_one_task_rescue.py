"""Regression pins for the round-7 one-task-stage rescues.

The sf1.0 REST-metrics sweep (SCALE.md r07; committed as
``tools/one_task_sweep.py``) found 16 queries serializing CPU-heavy
narrow legs onto one core because a single small parquet file is one
input split. Each got an ``ensure_parallelism`` rescue AT THE OPERATOR
(never in shared helpers — wordcount's plan is the bench calibration
reference and must stay byte-stable).

These tests pin the rescues against helper-refactor regression: the
plan guards elsewhere ALLOW the extra local exchange but don't require
it, so a refactor that silently dropped a rescue would stay green
everywhere and only resurface as a one-core stage at sf1.0. Here each
rescued operator must RETAIN its user-initiated repartition locally —
visible as a ``REPARTITION_BY_COL`` / ``REPARTITION_BY_NUM`` shuffle
origin in the executed plan (planner-inserted exchanges print
``ENSURE_REQUIREMENTS`` instead, so the marker is unambiguous).

The two checkpoint-based operators (dsir, bigram surprisal) rescue a
subtree that is localCheckpoint-ed at build time, so the marker never
reaches the final plan — for those the materialize() input is spied on
instead.
"""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.plans.registry import QUERIES
from mapreduce_rs_spark.sources.catalog import load_table

# (query, minimum user-initiated repartition markers in the final
# executed plan). Minimums, not exact counts: Catalyst may legally
# clone a rescued subtree (raising the count), but dropping the rescue
# entirely would take the count to zero. entity_match pins >= 2: the
# scan rescue AND the AQE coalesce-exempt pinned-N repartition must
# both survive (each guards a different 100 TB failure, SCALE.md r07).
_FINAL_PLAN_RESCUES = [
    ("entity_match_customers", 2),
    ("bigram_pmi", 1),
    ("bigrams", 1),
    ("boilerplate_ngrams", 1),
    ("cdc_chunk_dedup", 1),
    ("chunk_documents", 1),
    ("curation_yield_signals", 1),
    ("duplicate_spans", 1),
    ("feature_hashing_stats", 1),
    ("lsh_dedup_eval", 1),
    ("pack_sequences", 1),
    ("repetition_signals", 1),
    ("skipgram_pmi", 1),
    ("wordcount_mapreduce_udf", 1),
]


@pytest.mark.parametrize("name,min_markers", _FINAL_PLAN_RESCUES)
def test_rescue_survives_in_final_plan(spark, sf_dir, name, min_markers):
    plan = (
        QUERIES[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    got = plan.count("REPARTITION_BY")
    assert got >= min_markers, (
        f"{name}: expected >= {min_markers} user-initiated repartition "
        f"exchanges (the one-task rescue), found {got} — a refactor "
        f"dropped the rescue; at sf1.0 this re-serializes the narrow "
        f"leg onto one core (SCALE.md r07)"
    )


@pytest.mark.parametrize(
    "opname", ["dsir_importance_weights", "bigram_surprisal_scores"]
)
def test_rescue_survives_upstream_of_checkpoint(spark, sf_dir, opname, monkeypatch):
    """dsir / bigram surprisal checkpoint their tokenize leg at build
    time, so the rescue exchange executes inside materialize() and
    never appears in the final plan — spy on the frames handed to
    materialize and require the marker in at least one of them."""
    import mapreduce_rs_spark.operators.materialize as mat
    import mapreduce_rs_spark.operators.text_analysis as ta

    captured: list[str] = []
    real = mat.materialize

    def spy(df, *args, **kwargs):
        captured.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        return real(df, *args, **kwargs)

    # the operators bind materialize at call time (function-local
    # import), so patching the defining module intercepts every call
    monkeypatch.setattr(mat, "materialize", spy)
    docs = load_table(spark, sf_dir, "documents")
    getattr(ta, opname)(docs)
    assert captured, "materialize() was never called — operator restructured?"
    assert any("REPARTITION_BY" in p for p in captured), (
        f"{opname}: no user-initiated repartition upstream of any "
        f"checkpoint — the one-task rescue was dropped"
    )


def test_rdd_twin_spreads_single_split(spark, sf_dir):
    """rdd_wordcount: one input file = one RDD partition = one flatMap
    task (the reference's map_n == file-count trap verbatim). The
    rescue must leave the flatMap input spread across the default
    parallelism even when the scan is a single split."""
    from mapreduce_rs_spark.operators.partitioning import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    spread = ensure_parallelism(docs.select("text"))
    assert (
        spread.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
