"""Morton (z-order) key fragments — ONE definition shared by the
layout-evaluation queries (events.zorder_locality / zone_map_pruning),
their DuckDB oracles, and the z-ordered parquet sink (writers.
write_zordered), so the curve cannot drift between evaluator and sink.

Portability contract (scoped precisely — an earlier docstring
over-claimed and an oracle author hit a DuckDB parse error):
``spread_bits_sql`` and ``morton_sql`` emit dialect-neutral BIGINT
expressions — the same text parses in Spark SQL and DuckDB.
``normalize16_sql`` CANNOT be dialect-neutral: the overflow-safe lift
needs DECIMAL(38,0) + infix ``div`` on Spark but HUGEINT + ``//`` on
DuckDB (DuckDB rejects ``div`` and caps DECIMAL width at 38, which the
x65536 product exceeds), so it takes a ``dialect`` argument and every
caller — evaluator, sink, oracle — goes through this one function.
"""

from __future__ import annotations


def spread_bits_sql(col: str) -> str:
    """16-bit -> 32-bit Morton spread (portable bit magic)."""
    s = col
    s = f"(({s} | ({s} << 8)) & 16711935)"       # 0x00FF00FF
    s = f"(({s} | ({s} << 4)) & 252645135)"      # 0x0F0F0F0F
    s = f"(({s} | ({s} << 2)) & 858993459)"      # 0x33333333
    s = f"(({s} | ({s} << 1)) & 1431655765)"     # 0x55555555
    return s


def normalize16_sql(
    col: str, min_col: str, max_col: str, dialect: str = "spark"
) -> str:
    """Exact integer min/max scaling of ``col`` onto the full 16-bit
    range — the product is lifted into a 128-bit-capable type BEFORE
    the x65536 (a span wider than 2^47, e.g. snowflake-style ids,
    would silently wrap int64 on Spark and raise OutOfRange on DuckDB
    — review finding), then the <=65535 quotient drops back to BIGINT.
    Without the normalization a small key domain leaves the
    interleave's high bits dead.

    ``dialect``: "spark" (DECIMAL(38,0) + ``div``) or "duck"
    (HUGEINT + ``//``) — same floor-division values on both engines
    (operands are non-negative, so floor == trunc).
    """
    span = f"({max_col} - {min_col} + 1)"
    if dialect == "spark":
        return (
            f"CAST(CAST(({col} - {min_col}) AS DECIMAL(38,0)) * 65536"
            f" div {span} AS BIGINT)"
        )
    if dialect == "duck":
        return (
            f"CAST(CAST(({col} - {min_col}) AS HUGEINT) * 65536"
            f" // {span} AS BIGINT)"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def morton_sql(a16: str, b16: str) -> str:
    """Interleave two 16-bit-normalized values into one 32-bit z key."""
    return f"({spread_bits_sql(a16)} | ({spread_bits_sql(b16)} << 1))"
