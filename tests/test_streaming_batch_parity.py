"""Streaming <-> batch parity as ONE parametrized, hash-compared
family (round-4 verdict #5): every streaming/pipeline.py dataflow op is
drained through the real streaming engine (file source, availableNow,
checkpoint) and its output hashed against the IDENTICAL transformation
run in batch over the same input. The hash is bit-exact — floats are
compared by their IEEE bytes (struct.pack), not tolerance — which is
why the ops follow the repo's decimal-accumulation money rule: exact
sums are order-independent, so micro-batch boundaries cannot flip a
bit. Complements the op-specific behavior tests in test_streaming.py
(restart exactly-once, watermark late-data drops, replay dedup) and the
stateful trio's drain tests in test_stateful_streaming.py.
"""

from __future__ import annotations

import datetime
import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.relational import money, stable_sum
from mapreduce_rs_spark.sources.catalog import load_table
from mapreduce_rs_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    run_foreach_batch_upsert,
    streaming_click_purchase_join,
    streaming_dedup,
    streaming_ohlc,
    streaming_sessions,
    streaming_tumbling_counts,
)


def frame_hash(df) -> str:
    """Order-insensitive bit-exact hash: rows sorted by their full
    repr, every float contributing its IEEE-754 bytes — a tolerance-free
    twin of the driver's value hash."""
    cols = sorted(df.columns)

    def cell(v):
        if isinstance(v, float):
            return struct.pack("<d", v).hex()
        return repr(v)

    rows = sorted(
        "|".join(cell(r[c]) for c in cols) for r in df.select(*cols).collect()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _drain(df_stream, outp: str, ckpt: str, mode: str = "append") -> None:
    (
        df_stream.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _finalized_windows(events, hours: int = 1, wm_hours: int = 2):
    """Append mode emits exactly the windows finalized at the terminal
    watermark (max event time - watermark): window_start + size <= wm.
    Derived from the data, not a magic slack."""
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - datetime.timedelta(hours=wm_hours)
    return final_wm - datetime.timedelta(hours=hours)


def _tumbling_case(spark, events, inp, tmp):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    outp, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(streaming_tumbling_counts(stream), outp, ckpt)
    got = spark.read.parquet(outp)
    cutoff = _finalized_windows(events)
    batch = (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            stable_sum(money("value")).alias("sum_value"),
        )
        .where(F.col("window_start") <= F.lit(cutoff))
    )
    return got, batch


def _dedup_case(spark, events, inp, tmp):
    # the input was written TWICE (source replay); the batch twin is
    # plain exact dedup over the doubled input
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    outp, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(streaming_dedup(stream), outp, ckpt)
    got = spark.read.parquet(outp)
    batch = spark.read.parquet(inp).dropDuplicates(["event_id"])
    return got, batch


def _join_case(spark, events, inp, tmp):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    outp, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(
        streaming_click_purchase_join(
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"),
        ),
        outp,
        ckpt,
    )
    got = spark.read.parquet(outp)
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    batch = (
        events.where(F.col("event_type") == "purchase")
        .join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("click_ts") <= F.col("ts"))
            & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "click_id",
            "click_ts",
            "value",
        )
    )
    return got, batch


def _upsert_case(spark, events, inp, tmp):
    tgt, ckpt = str(tmp / "tgt"), str(tmp / "ckpt")
    run_foreach_batch_upsert(spark, inp, tgt, ckpt)
    got = spark.read.parquet(tgt)
    # update mode + idempotent key merge reaches EVERY window (no
    # append-mode holdback)
    batch = events.groupBy(
        F.window("ts", "1 hour").start.alias("window_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        stable_sum(money("value")).alias("sum_value"),
    )
    return got, batch


def _sessions_case(spark, events, inp, tmp):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    outp, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(streaming_sessions(stream), outp, ckpt)
    got = spark.read.parquet(outp)
    cutoff = _finalized_windows(events, hours=0)
    batch = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            stable_sum(money("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        # a session is finalized when the watermark passes its
        # gap-extended end (session_window.end == last event + gap)
        .where(F.col("session_end") <= F.lit(cutoff))
    )
    return got, batch


def _ohlc_case(spark, events, inp, tmp):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    outp, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(streaming_ohlc(stream), outp, ckpt)
    got = spark.read.parquet(outp)
    cutoff = _finalized_windows(events)
    order_key = F.struct("ts", "event_id")
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window").start.alias("bucket_ts"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
        .where(F.col("bucket_ts") <= F.lit(cutoff))
    )
    return got, batch


CASES = {
    "tumbling": (_tumbling_case, False),
    "dedup": (_dedup_case, True),  # input written twice (replay)
    "stream_stream_join": (_join_case, False),
    "foreach_batch_upsert": (_upsert_case, False),
    "sessions": (_sessions_case, False),
    "ohlc": (_ohlc_case, False),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_streaming_op_hash_matches_batch_twin(spark, sf_dir, tmp_path, case):
    build, replay = CASES[case]
    events = load_table(spark, sf_dir, "events")
    inp = str(tmp_path / "in")
    events.write.parquet(inp)
    if replay:
        events.write.mode("append").parquet(inp)
    got, batch = build(spark, events, inp, tmp_path)
    assert got.count() > 0, f"{case}: stream emitted nothing"
    assert sorted(got.columns) == sorted(batch.columns)
    assert frame_hash(got) == frame_hash(batch), f"{case}: hash mismatch"
