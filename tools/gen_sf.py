#!/usr/bin/env python
"""Generate a schema-identical synthetic dataset at an arbitrary scale
factor for LOCAL scaling experiments (SCALE.md's sf1.0 sweep — the r05
verdict's #6 ask).

The driver ships sf{0.001,0.01,0.1} read-only and no generator; this
produces the SAME ten tables (schemas, value domains, and the
invariants the oracles rely on: ASCII-only document text, exact
2-decimal money doubles, µs timestamps, 64-dim float embeddings,
'{"k": N}' props JSON) at any sf. Distributions mirror the shipped
data's shapes (zipf-ish text, uniform dims, one-month event window) but
are NOT bit-compatible with the driver's generator — scaling sweeps
compare Spark vs DuckDB on the SAME generated files, so cross-engine
parity is still exact.

Usage: python tools/gen_sf.py 1.0 /root/repo/.localdata/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
VOCAB = (
    "spark line column order small sort fast value scan hash slow part "
    "batch query agg table key group the a filter customer stream vector"
).split()
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]


def money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    # exact 2-decimal doubles (the repo-wide money invariant)
    return np.round(rng.uniform(lo, hi, n), 2)


def write(df: pd.DataFrame, out_dir: str, name: str) -> None:
    df.to_parquet(
        os.path.join(out_dir, f"{name}.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    print(f"{name}: {len(df)} rows", flush=True)


def main(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(pd.DataFrame({
        "r_regionkey": pd.array(range(5), dtype="int32"),
        "r_name": REGIONS,
    }), out_dir, "region")

    write(pd.DataFrame({
        "n_nationkey": pd.array(range(25), dtype="int32"),
        "n_name": NATIONS,
        "n_regionkey": pd.array([i % 5 for i in range(25)], dtype="int32"),
    }), out_dir, "nation")

    write(pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": money(rng, n_cust, -999.99, 9999.99),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }), out_dir, "customer")

    write(pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": money(rng, n_supp, -999.99, 9999.99),
    }), out_dir, "supplier")

    write(pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"part {i % 97} {i % 31}" for i in range(n_part)],
        "p_brand": [f"Brand#{(i % 5) + 1}{(i // 5) % 5 + 1}" for i in range(n_part)],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": money(rng, n_part, 900.0, 2100.0),
    }), out_dir, "part")

    day = np.timedelta64(86_400_000_000, "us")
    d0 = np.datetime64("1995-01-01T00:00:00", "us")
    odate = d0 + rng.integers(0, 2405, n_ord) * day
    write(pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(STATUSES, n_ord, p=[0.49, 0.49, 0.02]),
        "o_totalprice": money(rng, n_ord, 850.0, 500_000.0),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }), out_dir, "orders")

    sdate = d0 + rng.integers(0, 2405, n_li) * day
    write(pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": money(rng, n_li, 900.0, 105_000.0),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": sdate,
    }), out_dir, "lineitem")

    e0 = np.datetime64("2024-01-01T00:00:00", "us")
    ets = e0 + rng.integers(0, 30 * 86_400_000_000, n_ev).astype("timedelta64[us]")
    write(pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ets,
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": rng.choice(EVENT_TYPES, n_ev, p=[0.45, 0.3, 0.1, 0.05, 0.1]),
        "value": money(rng, n_ev, 0.0, 560.0),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }), out_dir, "events")

    # Head/tail word mix: the shipped sf corpora use a ~30-word soup,
    # which is fine at 5k docs but makes EVERY pair a near-duplicate at
    # 50k+ (LSH banding then quadratically explodes by construction —
    # observed: curation_yield_neardup ran >10 min at sf1.0 on the
    # first-cut corpus). Real corpora have a long tail; mixing ~60%
    # head words with a 10k-word zipf tail keeps shingle space sparse
    # so candidate pairs stay near-linear, while word-frequency shapes
    # (vocab_coverage, BPE, tf-idf) stay realistic.
    head_probs = 1.0 / np.arange(1, len(VOCAB) + 1)
    head_probs /= head_probs.sum()
    n_tail = 10_000
    tail_probs = 1.0 / np.arange(1, n_tail + 1)
    tail_probs /= tail_probs.sum()
    lens = rng.integers(10, 40, n_docs)
    texts = []
    for ln in lens:
        ln = int(ln)
        n_head = rng.binomial(ln, 0.6)
        words = list(rng.choice(VOCAB, n_head, p=head_probs)) + [
            f"tok{int(j)}" for j in rng.choice(n_tail, ln - n_head, p=tail_probs)
        ]
        rng.shuffle(words)
        texts.append(" ".join(words))
    # controlled duplicate structure so dedup families have real
    # candidates at every sf: ~1% exact dups, ~1% one-token-appended
    # near-dups (the random-probe recipe)
    n_exact = max(1, n_docs // 100)
    for i in range(n_exact):
        texts[n_docs - 2 * n_exact + i] = texts[i]
    for i in range(n_exact):
        texts[n_docs - n_exact + i] = texts[n_exact + i] + " omega"
    write(pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=[0.41, 0.15, 0.15, 0.14, 0.15]),
        "source": [f"src{int(s)}" for s in rng.integers(1, 21, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), out_dir, "documents")

    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0, 1, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.5, (n_emb, 64))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {n_emb} rows", flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
