"""Custom stateful streaming sessionization (applyInPandasWithState) and
the built-in session_window variant, both driven through the real
streaming engine and cross-checked against batch sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.events import sessionize
from mapreduce_rs_spark.sources.catalog import load_table, load_tables
from mapreduce_rs_spark.streaming.pipeline import EVENT_SCHEMA
from mapreduce_rs_spark.streaming.stateful import session_window_counts, stateful_sessionize


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    inp = str(base / "in")
    load_table(spark, sf_dir, "events").write.parquet(inp)
    return inp


def _drain(spark, df, out, ckpt):
    (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out)


def test_stateful_sessionize_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(event_stream_dir)
    got = _drain(
        spark,
        stateful_sessionize(stream),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # In a single availableNow drain only gap-closed sessions emit (the
    # final open session per user stays in state awaiting timeout).
    batch = sessionize(load_tables(spark, sf_dir))
    batch_keys = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    emitted = got.collect()
    assert emitted, "no sessions emitted"
    for r in emitted:
        key = (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
        assert key in batch_keys, f"streamed session {key} not found in batch result"
    # Emitted = all but the trailing open session per user.
    n_users = batch.select("user_id").distinct().count()
    assert len(emitted) == batch.count() - n_users


def test_session_window_builtin(spark, event_stream_dir, tmp_path):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(event_stream_dir)
    got = _drain(
        spark,
        session_window_counts(stream),
        str(tmp_path / "out2"),
        str(tmp_path / "ckpt2"),
    )
    rows = got.collect()
    assert rows
    assert all(r["session_end"] >= r["session_start"] for r in rows)
