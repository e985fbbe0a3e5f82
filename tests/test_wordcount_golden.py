"""Golden word-count test: expected counts computed in pure Python over a
fixed corpus. Guards against reimporting the reference's dropped-last-
key-group bug (reference ``src/mr/worker.rs:203-222`` ends its reduce loop
without flushing the final group — the lexicographically last word of
every reduce partition would be missing)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from mapreduce_rs_spark.operators.mapreduce import word_count_mapreduce
from mapreduce_rs_spark.operators.text_analysis import word_count

CORPUS = [
    "It's a truth universally acknowledged, that a single man",
    "in possession of a good fortune, must be in want of a wife.",
    "zz_last_word appears twice: zz_last_word",  # would be dropped by the reference bug
    "Ties & punct-uation; keep_under_scores and digits 42 42 42",
    "   leading and trailing whitespace   ",
    "",
]


def python_golden() -> dict[str, int]:
    counts: Counter[str] = Counter()
    for line in CORPUS:
        cleaned = re.sub(r"[^\w\s]", "", line, flags=re.ASCII)
        counts.update(cleaned.split())
    return dict(counts)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], ["text"])


def test_word_count_matches_python_golden(corpus_df):
    result = {r["word"]: r["cnt"] for r in word_count(corpus_df).collect()}
    assert result == python_golden()


def test_last_group_not_dropped(corpus_df):
    # The specific regression the reference ships: its reducer never
    # flushes the final key run, so the last word per partition vanishes.
    result = {r["word"]: r["cnt"] for r in word_count(corpus_df).collect()}
    assert result["zz_last_word"] == 2
    assert result["42"] == 3


def test_udf_surface_matches_declarative(corpus_df):
    declarative = {r["word"]: r["cnt"] for r in word_count(corpus_df).collect()}
    via_udf = {
        r["word"]: r["cnt"]
        for r in word_count_mapreduce(corpus_df, input_col="text").collect()
    }
    assert via_udf == declarative
