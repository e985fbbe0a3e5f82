"""Hypothesis property tests: the engine's answers must match a pure-
Python reference implementation on arbitrary corpora — the test the
reference repo never had (its manual eyeball check couldn't catch the
dropped-last-group bug; property tests would have, instantly)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_rs_spark.operators.text_analysis import word_count

# Text with tokens, punctuation, unicode-ish noise, whitespace runs.
line = st.text(
    alphabet=st.sampled_from("abc XY1_ ,.!\t"),
    min_size=0,
    max_size=40,
)
corpora = st.lists(line, min_size=1, max_size=8)


def python_word_count(lines: list[str]) -> dict[str, int]:
    counts: Counter[str] = Counter()
    for text in lines:
        counts.update(re.sub(r"[^\w\s]", "", text, flags=re.ASCII).split())
    return dict(counts)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=corpora)
def test_word_count_matches_python_reference(spark, lines):
    df = spark.createDataFrame([(t,) for t in lines], ["text"])
    got = {r["word"]: r["cnt"] for r in word_count(df).collect()}
    assert got == python_word_count(lines)


def test_three_engine_tokenizer_parity_on_random_corpus(spark):
    """Random printable-ASCII corpus (seeded) through all THREE engines
    — Spark column expressions, the DuckDB oracle SQL, and the Python
    UDF surface (wc_map). Fixed test corpora can hide a regex-dialect
    divergence; 200 random docs over the full printable range cannot.
    One batch per engine (not per-example Spark jobs), so it's fast."""
    import random
    import string

    import duckdb

    from mapreduce_rs_spark.operators.mapreduce import wc_map

    rng = random.Random(2024)
    alphabet = string.printable  # letters, digits, punctuation, whitespace
    docs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]

    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    spark_counts = {r["word"]: r["cnt"] for r in word_count(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in docs])
    from mapreduce_rs_spark.plans.registry import CLEAN_SQL, SPLIT_SQL

    duck = con.execute(
        f"""
        SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(
                regexp_replace(text, '{CLEAN_SQL}', '', 'g'), '{SPLIT_SQL}')) AS word
            FROM documents
        ) t WHERE word <> '' GROUP BY word
        """
    ).fetchall()
    duck_counts = {w: c for w, c in duck}

    py_counts: Counter[str] = Counter()
    for t in docs:
        py_counts.update(w for w, _ in wc_map(t))

    assert spark_counts == duck_counts
    assert spark_counts == dict(py_counts)
