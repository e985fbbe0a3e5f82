"""Behavior tests for weighted_sample (Efraimidis-Spirakis top-k).

Oracle parity checks the exact output on the real corpus; here the
SEMANTIC properties: selection probability rises with weight, the
sample never repeats a doc, and ranks follow the key order.
"""

from __future__ import annotations

import math

from mapreduce_rs_spark.operators.sampling import weighted_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_weighted_sample_prefers_heavy_docs_and_never_repeats(spark):
    # 10 heavy docs (200 tokens) among 90 light docs (1 token). With
    # k=10, ES keys ln(u)/w concentrate near 0 for heavy docs — the
    # overwhelming majority of the sample must be heavy, and with these
    # fixed hashes the realized outcome is deterministic.
    rows = []
    for i in range(10):
        rows.append((i, " ".join(["heavy"] * 200), "en"))
    for i in range(10, 100):
        rows.append((i, "light", "en"))
    out = weighted_sample(_docs(spark, rows), k=10).collect()
    assert len(out) == 10
    ids = [r["doc_id"] for r in out]
    assert len(set(ids)) == 10  # without replacement
    n_heavy = sum(1 for r in out if r["n_tokens"] == 200)
    assert n_heavy >= 8, f"only {n_heavy} heavy docs in top-10"
    assert sorted(r["rnk"] for r in out) == list(range(1, 11))


def test_weighted_sample_matches_pure_python_es(spark):
    """The exact top-k must equal a transparent pure-Python replica of
    the rule (portable hash -> uniform -> ln(u)/w -> round(.,9) -> top-k
    with doc_id tie-break)."""
    import hashlib

    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 13)), "en") for i in range(60)]
    got = {
        r["doc_id"]: r["rnk"]
        for r in weighted_sample(_docs(spark, rows), k=15).collect()
    }

    def h32_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    keyed = []
    for i, text, _ in rows:
        w = len(text.split())
        u = (h32_py(f"{i}|ws") + 1) / 4294967296.0
        keyed.append((round(math.log(u) / w, 9), i))
    top = sorted(keyed, key=lambda t: (-t[0], t[1]))[:15]
    expected = {doc: rnk for rnk, (_, doc) in enumerate(top, start=1)}
    assert got == expected
