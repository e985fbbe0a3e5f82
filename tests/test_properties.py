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
