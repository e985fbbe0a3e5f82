"""Structured Streaming pipeline: real streaming engine (file source,
availableNow trigger), checked against the batch tumbling-window query
and for exactly-once restart semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.sources.catalog import load_table
from mapreduce_rs_spark.streaming import run_windowed_stream


@pytest.fixture(scope="module")
def stream_dirs(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, outp, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    load_table(spark, sf_dir, "events").write.parquet(inp)
    run_windowed_stream(spark, inp, outp, ckpt)
    return inp, outp, ckpt


def test_stream_matches_batch_for_closed_windows(spark, sf_dir, stream_dirs):
    _, outp, _ = stream_dirs
    streamed = spark.read.parquet(outp)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    s = {(r["window_start"], r["event_type"]): r["n_events"] for r in streamed.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # Append mode withholds windows newer than the watermark; every
    # emitted window must match batch exactly, and most windows emit.
    assert s
    assert all(b[k] == v for k, v in s.items())
    assert len(s) >= len(b) - 10


def test_stream_restart_is_exactly_once(spark, stream_dirs):
    inp, outp, ckpt = stream_dirs
    before = spark.read.parquet(outp).count()
    run_windowed_stream(spark, inp, outp, ckpt)  # same checkpoint: no-op
    assert spark.read.parquet(outp).count() == before
