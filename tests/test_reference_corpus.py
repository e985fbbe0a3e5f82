"""The switch-over test: run this engine's word count over the
reference's OWN corpus (the 8 Project Gutenberg books its demo uses,
read-only at /root/reference/src/resource/) and golden-check against a
pure-Python implementation of the reference's documented semantics
(``src/mr/function.rs:9-20``). A user of the reference gets the same
answer from `python -m mapreduce_rs_spark wordcount` — minus the
reference's dropped-last-group defect.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest

from mapreduce_rs_spark.operators.text_analysis import word_count
from mapreduce_rs_spark.sources.readers import read_text

CORPUS_DIR = "/root/reference/src/resource"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS_DIR), reason="reference corpus not present"
)


def python_counts(paths: list[str]) -> dict[str, int]:
    counts: Counter[str] = Counter()
    for p in paths:
        with open(p, encoding="utf-8") as fh:
            # Python's \w is Unicode by default; Spark/Java's is ASCII.
            # re.ASCII pins the golden to the engine's documented
            # (ASCII, reference-equivalent on this corpus) semantics.
            counts.update(re.sub(r"[^\w\s]", "", fh.read(), flags=re.ASCII).split())
    return dict(counts)


def test_engine_matches_python_golden_on_reference_corpus(spark):
    paths = [os.path.join(CORPUS_DIR, f"pg-{i}.txt") for i in range(8)]
    golden = python_counts(paths)
    got = {
        r["word"]: r["cnt"]
        for r in word_count(read_text(spark, CORPUS_DIR), text_col="value").collect()
    }
    assert len(got) == len(golden)
    assert got == golden


def test_reference_corpus_top_words_sane(spark):
    got = word_count(read_text(spark, CORPUS_DIR), text_col="value")
    top = {r["word"] for r in got.orderBy(got.cnt.desc()).limit(5).collect()}
    # Eight English novels: these dominate any of them.
    assert "the" in top and "of" in top
