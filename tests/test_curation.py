"""Curation capstone: quality → language → exact dedup → near-dup
cluster dedup → yield accounting."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.operators.curation import (
    curated_documents,
    curation_yield,
    curation_yield_neardup,
)
from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_neardup_yield_never_exceeds_exact_yield(docs):
    exact = {r["lang"]: r for r in curation_yield(docs).collect()}
    near = {r["lang"]: r for r in curation_yield_neardup(docs).collect()}
    assert set(exact) == set(near)
    for lang in exact:
        # The near-dup pass only removes further documents.
        assert near[lang]["n_docs_kept"] <= exact[lang]["n_docs_kept"]
        assert near[lang]["n_tokens_kept"] <= exact[lang]["n_tokens_kept"]
        # Input accounting identical.
        assert near[lang]["n_docs_in"] == exact[lang]["n_docs_in"]


def test_neardup_collapses_planted_cluster(spark):
    # Three near-identical docs (one-token edits, shared shingles) must
    # collapse to ONE survivor; the unrelated doc survives alongside.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "en"),
        (2, base.replace("today", "tonight"), "en"),
        (3, base.replace("lazy", "sleepy"), "en"),
        (50, "entirely different content about databases engines and columnar storage formats", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r["lang"]: r for r in curation_yield_neardup(df).collect()}
    assert got["en"]["n_docs_in"] == 4
    assert got["en"]["n_docs_kept"] == 2  # min of the cluster (1) + doc 50


def test_pack_sequences_respects_budget_shape(docs):
    from mapreduce_rs_spark.operators.curation import PACK_TOKEN_BUDGET, pack_sequences

    bins = pack_sequences(docs).collect()
    assert bins
    per_lang: dict[str, list] = {}
    for r in bins:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        rows.sort(key=lambda r: r["bin"])
        # Bin ids start at 0 and strictly increase (gaps are legal: a
        # doc spanning multiple budgets makes the numbering jump).
        assert rows[0]["bin"] == 0
        assert all(a["bin"] < b["bin"] for a, b in zip(rows, rows[1:]))
        # The defining offset-packing property: cumulative tokens
        # through each non-final bin reach that bin's end boundary —
        # the next doc only opened a new bin because the budget was
        # crossed. (An off-by-one in the cumsum frame would underfill.)
        running = 0
        for r, nxt in zip(rows, rows[1:]):
            running += r["n_tokens"]
            assert running >= (r["bin"] + 1) * PACK_TOKEN_BUDGET, (lang, r)
        # Overshoot accounting consistent.
        for r in rows:
            assert r["overshoot"] == max(r["n_tokens"] - PACK_TOKEN_BUDGET, 0)
    # Token conservation: packed tokens == curated tokens.
    from mapreduce_rs_spark.operators.curation import curated_documents

    total_packed = sum(r["n_tokens"] for r in bins)
    total_curated = sum(r["n_tokens"] for r in curated_documents(docs).collect())
    assert total_packed == total_curated


def test_curated_documents_keep_text_flag(docs):
    with_text = curated_documents(docs, keep_text=True)
    without = curated_documents(docs)
    assert "text" in with_text.columns and "text" not in without.columns
    assert with_text.count() == without.count()


def test_decontaminate_flags_planted_overlap_only(spark):
    """Intent check beyond oracle parity: a planted verbatim 8-gram run
    shared with the eval set flags exactly the overlapping training doc;
    a disjoint doc and a 7-token (sub-n) partial overlap do not flag."""
    from mapreduce_rs_spark.operators.dedup import decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"benchmark question: {leak} answer key", "en", "eval_set", 0),
        (2, f"scraped page quoting {leak} verbatim here", "en", "web", 0),
        (3, "completely unrelated training document text body", "en", "web", 0),
        # shares only the first 7 of the 8 leak tokens -> no full 8-gram
        (4, "prefix alpha beta gamma delta epsilon zeta eta suffix", "en", "web", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {
        r.lang: (r.n_train_docs, r.n_contaminated)
        for r in decontaminate(df, eval_source="eval_set").collect()
    }
    assert out == {"en": (3, 1)}


def test_leakage_safe_splits_components_never_straddle(spark, sf_dir):
    """The invariant the operator exists for, asserted row-by-row:
    every near-dup component lands in exactly one split."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.functions.hashing import h32
    from mapreduce_rs_spark.operators.graph import dedup_components
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    comps = dedup_components(docs)
    labeled = (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("component"))
    )
    draw = h32(F.concat(F.col("component").cast("string"), F.lit("|split"))) % 1000
    split = (
        F.when(draw < 900, "train").when(draw < 950, "val").otherwise("test")
    )
    per_component = labeled.select("component", split.alias("split")).groupBy(
        "component"
    ).agg(F.countDistinct("split").alias("n_splits"))
    assert per_component.where(F.col("n_splits") > 1).count() == 0
    # and clusters exist at this SF, so the guarantee is non-vacuous
    assert comps.groupBy("component").count().where("count > 1").count() > 0


def test_temperature_mixture_boosts_low_resource_langs(spark):
    """alpha=0.5 semantics: a low-mass language's temperature share
    exceeds its natural share (boost > 1) and a high-mass language's
    shrinks (boost < 1); both share columns sum to ~1; shares follow
    sqrt proportions exactly."""
    import math

    from mapreduce_rs_spark.operators.curation import temperature_mixture

    rows = [(1, " ".join(["a"] * 100), "lo", "s", 0),
            (2, " ".join(["b"] * 10000), "hi", "s", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {r["lang"]: r for r in temperature_mixture(df).collect()}
    assert out["lo"]["boost"] > 1 > out["hi"]["boost"]
    assert abs(out["lo"]["natural_share"] + out["hi"]["natural_share"] - 1) < 1e-12
    assert abs(out["lo"]["temp_share"] + out["hi"]["temp_share"] - 1) < 1e-12
    expect_lo = math.sqrt(100) / (math.sqrt(100) + math.sqrt(10000))
    assert abs(out["lo"]["temp_share"] - expect_lo) < 1e-6


def test_duplicate_spans_merges_overlaps_and_ignores_intra_doc_repeats(spark):
    """Span semantics on a hand corpus (n=3, min_docs=2):
    * docs 1 and 2 share an 8-token passage -> ONE maximal span of 8
      tokens in each (overlapping flagged gram positions merge);
    * doc 3 repeats a 3-gram internally but shares nothing -> no span
      (the duplicated grain requires >= 2 DISTINCT docs);
    * doc 4 shares nothing -> zero row preserved with dup_fraction 0;
    * docs 1 and 5 ALSO share a separate isolated 3-gram far from the
      passage -> doc 1 reports TWO spans (no bridge across the gap)."""
    from mapreduce_rs_spark.operators.dedup import duplicate_spans

    passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    iso = "q1 q2 q3"
    rows = [
        (1, f"{passage} x1 x2 x3 x4 {iso}", "en", "s", 0),
        (2, f"y1 y2 {passage} y3", "en", "s", 0),
        (3, "r1 r2 r3 z1 z2 r1 r2 r3", "en", "s", 0),
        (4, "solo tokens only here", "en", "s", 0),
        (5, f"w1 {iso} w2", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["n_tokens"])
        for r in duplicate_spans(df, n=3, min_docs=2).collect()
    }
    assert out[1] == (2, 11, 15)   # 8-token passage + 3-token iso
    assert out[2] == (1, 8, 11)
    assert out[3] == (0, 0, 8)     # intra-doc repeat not flagged
    assert out[4] == (0, 0, 4)
    assert out[5] == (1, 3, 5)
