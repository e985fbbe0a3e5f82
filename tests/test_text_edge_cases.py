"""Edge-case corpus through the text operators: empty strings,
punctuation-only, whitespace-only documents must produce NULL ratios
(never an ANSI division error) and never crash a job."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.operators.dedup import minhash_signatures, simhash_signatures
from mapreduce_rs_spark.operators.text_analysis import doc_stats, quality_score, word_count

EDGE_DOCS = [
    (1, "normal words here", "en"),
    (2, "", "en"),                    # empty
    (3, "!!! ... ;;;", "en"),         # punctuation-only -> zero tokens
    (4, "   ", "en"),                 # whitespace-only
    (5, "x", "en"),                   # single char (no 3-gram shingles)
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_DOCS, ["doc_id", "text", "lang"])


def test_quality_score_survives_empty_docs(edge_df):
    rows = {r["doc_id"]: r for r in quality_score(edge_df).collect()}
    assert len(rows) == 5
    assert rows[2]["punct_ratio"] is None          # 0 chars -> NULL, not error
    assert rows[3]["stopword_ratio"] is None       # 0 tokens -> NULL
    assert rows[1]["n_tokens"] == 3


def test_doc_stats_survives_empty_docs(edge_df):
    rows = {r["doc_id"]: r for r in doc_stats(edge_df).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["avg_token_len"] is None


def test_word_count_ignores_tokenless_docs(edge_df):
    counts = {r["word"]: r["cnt"] for r in word_count(edge_df).collect()}
    assert counts == {"normal": 1, "words": 1, "here": 1, "x": 1}


def test_signatures_skip_docs_without_material(edge_df):
    # MinHash needs >= 3 tokens (shingle width); SimHash needs >= 1 token.
    mh_docs = {r["doc_id"] for r in minhash_signatures(edge_df).collect()}
    assert mh_docs == {1}
    sh_docs = {r["doc_id"] for r in simhash_signatures(edge_df).collect()}
    assert sh_docs == {1, 5}


def test_non_ascii_golden_all_engines_agree(spark):
    """Pin the documented ASCII divergence from the reference
    (functions/text.py module docstring): accented letters are treated
    as punctuation and stripped — "café" → "caf" — IDENTICALLY by all
    three engines (Spark column path, DuckDB oracle, Python UDF
    surface). The Rust reference's Unicode-aware \\w would instead keep
    "café" whole; cross-engine agreement is this repo's contract."""
    import duckdb

    from mapreduce_rs_spark.operators.mapreduce import wc_map

    text = "café déjà vu naïve touché touché 北京 test"
    df = spark.createDataFrame([(1, text, "fr")], ["doc_id", "text", "lang"])

    spark_counts = {r["word"]: r["cnt"] for r in word_count(df).collect()}

    from mapreduce_rs_spark.plans.registry import CLEAN_SQL, SPLIT_SQL

    duck = duckdb.connect().execute(
        f"""
        SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(
                regexp_replace(?, '{CLEAN_SQL}', '', 'g'), '{SPLIT_SQL}')) AS word
        ) t WHERE word <> '' GROUP BY word
        """,
        [text],
    ).fetchall()
    duck_counts = {w: c for w, c in duck}

    py_counts: dict[str, int] = {}
    for w, _ in wc_map(text):
        py_counts[w] = py_counts.get(w, 0) + 1

    golden = {"caf": 1, "dj": 1, "vu": 1, "nave": 1, "touch": 2, "test": 1}
    assert spark_counts == golden
    assert duck_counts == golden
    assert py_counts == golden


def test_unicode_mode_matches_rust_reference_semantics(spark):
    """unicode=True golden: the Rust reference keeps accented letters
    ("café" stays "café" — Unicode \\w in src/mr/function.rs:10-13 and
    Unicode split_whitespace). The expected counts are computed with
    Python's Unicode regex (the Rust-semantics mirror: \\w without
    re.ASCII, str.split() = Unicode whitespace split), NOT hand-written,
    so the golden IS the reference algorithm. ASCII default untouched —
    it remains the cross-engine oracle contract; unicode mode is the
    opt-in reference-parity path (no RE2 equivalent → not oracled)."""
    import re

    text = "café déjà vu naïve touché touché Müller-Straße 北京 test _foo1"
    df = spark.createDataFrame([(1, text, "fr")], ["doc_id", "text", "lang"])

    got = {r["word"]: r["cnt"] for r in word_count(df, unicode=True).collect()}

    expected: dict[str, int] = {}
    for w in re.sub(r"[^\w\s]", "", text).split():  # Unicode by default in Python
        expected[w] = expected.get(w, 0) + 1

    # sanity on the golden itself: accents and CJK survived, the
    # ASCII-mode mutilations did not happen
    assert "café" in expected and "touché" in expected and "北京" in expected
    assert "caf" not in expected and "MüllerStraße" in expected
    assert got == expected


def test_unicode_mode_whitespace_is_unicode(spark):
    """Unicode split: NBSP (U+00A0, White_Space=Yes) separates tokens in
    unicode mode exactly as Rust's split_whitespace does; ASCII mode
    treats it as a word-adjacent non-word char (stripped)."""
    text = "alpha beta"  # the separator is an explicit NBSP, not a plain space
    df = spark.createDataFrame([(1, text, "en")], ["doc_id", "text", "lang"])
    uni = {r["word"]: r["cnt"] for r in word_count(df, unicode=True).collect()}
    assert uni == {"alpha": 1, "beta": 1}
    ascii_mode = {r["word"]: r["cnt"] for r in word_count(df).collect()}
    assert ascii_mode == {"alphabeta": 1}


def test_bigram_surprisal_separates_word_order_not_word_choice(spark):
    """A document with the SAME token multiset as fluent twins but
    shuffled order must score (a) identically under the unigram model
    (order-blind by construction) and (b) strictly higher under the
    bigram model — word ORDER is exactly what the bigram context adds."""
    from mapreduce_rs_spark.operators.text_analysis import (
        bigram_surprisal_scores,
        unigram_surprisal_scores,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    words = fluent.split()
    # deterministic adjacency-destroying permutation of the same
    # multiset (a rotation would PRESERVE all but one bigram)
    shuffled = " ".join(sorted(words))
    assert sorted(shuffled.split()) == sorted(words)
    rows = [(i, fluent, "en") for i in range(8)] + [(99, shuffled, "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    uni = {r["doc_id"]: r["mean_surprisal_cn"]
           for r in unigram_surprisal_scores(df).collect()}
    assert uni[99] == uni[0]  # same multiset -> identical unigram score

    bi = {r["doc_id"]: r["mean_surprisal_cn"]
          for r in bigram_surprisal_scores(df).collect()}
    assert bi[99] > bi[0], (bi[99], bi[0])


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """The CDC property fixed-size chunking lacks: inserting one token
    at the FRONT of a document must leave all chunk fingerprints after
    the first boundary intact (boundaries depend only on local pair
    hashes, so they re-synchronize immediately), while fixed-size
    windows would shift every chunk. Asserted structurally: the edited
    doc shares all but at most 2 of the original's chunk fingerprints."""
    from mapreduce_rs_spark.operators.text_analysis import cdc_chunk_dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
            "one two three four five six seven eight nine ten")
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base, "en"), (2, edited, "en")], ["doc_id", "text", "lang"]
    )
    rows = cdc_chunk_dedup(df).collect()
    stats = {r["doc_id"]: r for r in rows}
    n1 = stats[1]["n_chunks"]
    # shared chunks are exactly the dup-counted ones (only 2 docs here)
    shared = stats[1]["n_dup_chunks"]
    assert shared >= n1 - 2, (n1, shared)
    assert stats[2]["n_chunk_tokens"] == stats[1]["n_chunk_tokens"] + 1
