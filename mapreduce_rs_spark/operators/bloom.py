"""Deterministic Bloom-filter join prefiltering — the runtime-filter
pattern as an oracle-checkable operator.

At 100 TB the expensive half of a selective fact⋈dim join is shuffling
fact rows that can never match. Engines fix this with runtime Bloom
filters (Spark: ``spark.sql.optimizer.runtime.bloomFilter.enabled``;
Trino/Presto: dynamic filtering) — build a compact bit set from the
small side, prefilter the big side BEFORE its shuffle, let the exact
join clean up the false positives. The filter is semantically
transparent: it can only drop rows the join would drop anyway.

This module builds that machinery explicitly and DETERMINISTICALLY:
positions come from the portable md5-based ``h32`` family, the bit set
is an integer bit_or aggregate (associative — partition-invariant), so
the DuckDB oracle reproduces the EXACT same filter, bit for bit, and
the false-positive behavior itself becomes an oracle-checked query
result (the dedup/ANN evaluation-harness pattern applied to joins).

Scale shape: the build side is one narrow projection + a ``n_bits/32``-
row bit_or aggregate; the collected bloom is O(n_bits) BOUNDED by
construction (a loud assert, like the k-means/PQ model fits). The probe
is a pure narrow expression on the fact scan — no join, no shuffle —
exactly what a runtime filter must be to sit below a shuffle boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_rs_spark.functions.hashing import h32_lane_from_digest

# Words are 32-bit (stored in longs): every shift stays positive and
# well-defined in BOTH engines (a 1<<63 long would hit engine-specific
# sign/shift semantics).
WORD_BITS = 32
DEFAULT_BITS = 1024
K_HASHES = 3


def bloom_words(keys: DataFrame, key_col: str, n_bits: int = DEFAULT_BITS) -> list[int]:
    """Fit the bloom: k=3 positions per key from the LANES of ONE md5
    digest (the MinHash 4-lane trick — md5 is the dominant cost of the
    probe, so one digest instead of three is a ~3x cut of the hot
    narrow stage), OR-folded into ``n_bits/32`` 32-bit words. Returns
    the dense word list (driver-side, HARD-BOUNDED at n_bits/32 entries
    regardless of key count).

    In production the same aggregation ships as Spark's built-in
    BloomFilterAggregate; this explicit form exists so the filter is
    engine-portable and its effect oracle-checkable.
    """
    if n_bits % WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {WORD_BITS}")
    digest = keys.select(
        F.md5(F.col(key_col).cast("string")).alias("digest")
    )
    contribs = None
    for lane in range(K_HASHES):
        pos = h32_lane_from_digest("digest", lane) % n_bits
        c = digest.select(
            (pos / WORD_BITS).cast("int").alias("word"),
            (pos % WORD_BITS).cast("int").alias("bit"),
        ).select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
        contribs = c if contribs is None else contribs.union(c)
    folded = contribs.groupBy("word").agg(F.expr("bit_or(mask)").alias("mask"))
    rows = folded.collect()
    n_words = n_bits // WORD_BITS
    assert len(rows) <= n_words, "bloom fold exceeded its bound — bug"
    words = [0] * n_words
    for r in rows:
        words[r["word"]] = r["mask"]
    return words


def _probe_pass_sql(key_expr: str, words: list[int], n_bits: int) -> str:
    """One SQL boolean: does ``key_expr`` pass the bloom? The word list
    embeds as a single parsed array literal (the py4j-tax lesson from
    the IVF/PQ centroid families — see SCALE.md round 4)."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    tests = []
    # ONE md5 per probe; lane L = hex digits [8L+1, 8L+8) of the digest
    # (h32_lane_from_digest's scheme, kept in lockstep with the fit).
    digest = f"md5({key_expr})"
    for lane in range(K_HASHES):
        pos = (
            f"(CAST(conv(substring({digest}, {lane * 8 + 1}, 8), 16, 10) "
            f"AS BIGINT) % {n_bits})"
        )
        tests.append(
            f"((element_at({arr}, CAST({pos} div {WORD_BITS} AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % {WORD_BITS} AS INT))) != 0)"
        )
    return "(" + " AND ".join(tests) + ")"


def bloom_prefilter_stats(
    tables: dict[str, DataFrame],
    n_bits: int = DEFAULT_BITS,
    segment: str = "BUILDING",
) -> DataFrame:
    """The runtime-filter evaluation harness: build a bloom over one
    market segment's customers, probe every order with it, and account
    — per order priority — for exactly what the filter did:

    * ``n_orders``      — fact rows probed
    * ``n_bloom_pass``  — rows the prefilter lets through (the shuffle
                          volume a runtime filter would pay for)
    * ``n_match``       — rows the exact join keeps (ground truth)
    * ``n_false_pos``   — bloom passes the exact join then drops
    * ``n_false_neg``   — ALWAYS 0: a Bloom filter admits every true
                          match by construction; emitting the count
                          makes the oracle prove the theorem per group

    ``n_bits`` defaults DELIBERATELY small (1024) so false positives
    exist at test scale and the accounting is non-trivial; production
    sizing is ~10 bits/key for ~1% FP (and at real scale the build side
    stays distributed — only the n_bits/32 words ever reach the driver).
    """
    c, o = tables["customer"], tables["orders"]
    keys = (
        c.where(F.col("c_mktsegment") == segment)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    words = bloom_words(keys, "k", n_bits)
    probed = o.select(
        "o_orderpriority",
        "o_custkey",
        F.expr(
            _probe_pass_sql("CAST(o_custkey AS STRING)", words, n_bits)
        ).alias("bloom_pass"),
    )
    flagged = probed.join(
        F.broadcast(keys.select(F.col("k"), F.lit(1).alias("is_match"))),
        probed.o_custkey == F.col("k"),
        "left",
    )
    m = F.col("is_match").isNotNull()
    p = F.col("bloom_pass")
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(p).alias("n_bloom_pass"),
        F.count_if(m).alias("n_match"),
        F.count_if(p & ~m).alias("n_false_pos"),
        F.count_if(m & ~p).alias("n_false_neg"),
    )
