"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in ``__spark_entry__.py``: row count + column names
+ order-insensitive value comparison (float-tolerant). Rows are aligned
by sorting on the non-float columns, which every registry query keeps
unique by construction (deterministic tie-broken keys).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from mapreduce_rs_spark.sources.catalog import TABLES

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-9


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _is_float_col(s: pd.Series) -> bool:
    return s.dtype.kind == "f"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Non-float columns lead (exact, engine-portable ordering); float
    # columns follow as a FINAL tie-break so rows that tie on every
    # non-float key (e.g. value_histogram's float bucket_lo with equal
    # counts) still align deterministically. Money/decimal-derived
    # floats are bit-identical across engines by construction, so the
    # tie-break sorts consistently.
    sort_cols = [c for c in df.columns if not _is_float_col(df[c])] + [
        c for c in df.columns if _is_float_col(df[c])
    ]
    if sort_cols and len(df):
        df = df.sort_values(sort_cols, kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for col in s.columns:
        if _is_float_col(s[col]) or _is_float_col(o[col]):
            for i, (a, b) in enumerate(zip(s[col], o[col])):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                assert not (a_nan or b_nan), f"{name}.{col}[{i}]: {a!r} vs {b!r}"
                assert math.isclose(a, b, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL), (
                    f"{name}.{col}[{i}]: {a!r} vs {b!r}"
                )
        else:
            sa = s[col].astype(object).where(pd.notna(s[col]), None)
            ob = o[col].astype(object).where(pd.notna(o[col]), None)
            mism = [
                (i, x, y) for i, (x, y) in enumerate(zip(sa, ob)) if _coerce(x) != _coerce(y)
            ]
            assert not mism, f"{name}.{col}: first mismatches {mism[:5]}"


def _coerce(v: object) -> object:
    """Width-insensitive scalar comparison (int32 vs int64, date vs
    midnight timestamp, arrays vs lists)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_coerce(x) for x in v)
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    return v
