"""Engine-portable deterministic hashing.

The reference hash-partitions on Rust's SipHash ``DefaultHasher``
(``src/mr/worker.rs:133-137``). The exact function is semantically
irrelevant for partitioning (any stable hash works — Spark's shuffle uses
Murmur3), but our dedup/MinHash/SimHash operators need a hash whose VALUE
is part of the query result, so it must be computable identically in Spark
and in the DuckDB oracle. md5 is the one cryptographic hash both engines
expose with identical output; we derive integer hashes from its hex form.

Spark:   conv(substring(md5(x), 1, 16), 16, 10) → decimal string → cast
DuckDB:  CAST('0x' || substr(md5(x), 1, 16) AS ...)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def h32(col: Column | str, seed: int | None = None) -> Column:
    """Unsigned-32-bit integer hash (as BIGINT) from the first 8 md5 hex
    digits. ``seed`` prefixes the input, giving a cheap family of
    independent hash functions for MinHash permutations."""
    inp = _col(col)
    if seed is not None:
        inp = F.concat(F.lit(f"{seed}|"), inp)
    return F.conv(F.substring(F.md5(inp), 1, 8), 16, 10).cast("long")


def h32_lane_from_digest(digest: Column | str, lane: int) -> Column:
    """Extract lane ``lane`` (0-3) of an md5 HEX DIGEST column as an
    unsigned-32-bit integer. The single definition of the lane scheme —
    both ``h32_lane`` and callers that project the digest once (e.g.
    minhash_signatures) go through here, so the scheme cannot drift
    between the one-shot and per-expression forms."""
    if not 0 <= lane <= 3:
        raise ValueError("lane must be 0..3 (md5 has 32 hex digits)")
    return F.conv(F.substring(_col(digest), lane * 8 + 1, 8), 16, 10).cast("long")


def h32_lane(col: Column | str, lane: int, seed_group: int | None = None) -> Column:
    """One of FOUR independent 32-bit hashes from a single md5: the
    128-bit digest is split into 8-hex-digit lanes (0-3). A k-value
    MinHash family then needs only ceil(k/4) md5 evaluations per input
    instead of k — md5 is the dominant cost of the signature stage, so
    this is a ~4x cut of the hottest narrow stage. ``seed_group``
    prefixes the input to extend the family beyond 4 functions."""
    inp = _col(col)
    if seed_group is not None:
        inp = F.concat(F.lit(f"{seed_group}|"), inp)
    return h32_lane_from_digest(F.md5(inp), lane)


def h64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit integer hash (first 15 md5 hex digits). 15 digits — not
    16 — so the unsigned value always fits signed BIGINT in both engines
    with no masking arithmetic to keep in sync."""
    inp = _col(col)
    if seed is not None:
        inp = F.concat(F.lit(f"{seed}|"), inp)
    return F.conv(F.substring(F.md5(inp), 1, 15), 16, 10).cast("long")


def text_fingerprint(col: Column | str) -> Column:
    """Exact-duplicate fingerprint: md5 over whitespace-normalized,
    lowercased text. Whitespace is the explicit ASCII class (see
    functions/text.py WS_CLASS: RE2's \\s excludes \\x0B), so the
    normalization is identical in Spark and the DuckDB oracle."""
    normalized = F.regexp_replace(F.trim(_col(col)), r"[ \t\n\x0B\f\r]+", " ")
    return F.md5(F.lower(normalized))


# --- oracle-side fragment builders (kept adjacent so they stay in sync) ---

def h32_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB fragment equivalent to ``h32``."""
    inp = f"('{seed}|' || {expr})" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({inp}), 1, 8)) AS BIGINT)"


def h32_lane_sql(expr: str, lane: int, seed_group: int | None = None) -> str:
    """DuckDB fragment equivalent to ``h32_lane``."""
    inp = f"('{seed_group}|' || {expr})" if seed_group is not None else expr
    return f"CAST(('0x' || substr(md5({inp}), {lane * 8 + 1}, 8)) AS BIGINT)"


def h64_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB fragment equivalent to ``h64``."""
    inp = f"('{seed}|' || {expr})" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({inp}), 1, 15)) AS BIGINT)"


def text_fingerprint_sql(expr: str) -> str:
    """DuckDB fragment equivalent to ``text_fingerprint``."""
    return f"md5(lower(regexp_replace(trim({expr}), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
