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


def _batch_latest(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return {
        r.user_id: (r.ts, r.event_id, r.event_type)
        for r in events.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    }


def _compact(rows):
    """Newest emission per user — monotone emissions make max() the
    compaction."""
    state = {}
    for r in rows:
        cand = (r.ts, r.event_id, r.event_type)
        if r.user_id not in state or cand[:2] > state[r.user_id][:2]:
            state[r.user_id] = cand
    return state


def test_stateful_latest_state_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    from mapreduce_rs_spark.streaming.stateful import stateful_latest_state

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(event_stream_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    streamed = _drain(spark, stateful_latest_state(stream), out, ckpt)
    assert _compact(streamed.collect()) == _batch_latest(spark, sf_dir)


def test_stateful_latest_state_across_micro_batches(spark, sf_dir, tmp_path):
    """One file per trigger: state must carry the maximum across
    micro-batches, the newest emission per user must equal batch, and
    re-draining a finished stream must emit nothing (idempotent
    restart — the recovery behavior the reference stubbed)."""
    from mapreduce_rs_spark.streaming.stateful import stateful_latest_state

    inp = str(tmp_path / "in")
    load_table(spark, sf_dir, "events").repartition(5).write.parquet(inp)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    streamed = _drain(spark, stateful_latest_state(stream), out, ckpt)
    emitted = streamed.count()
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert emitted >= n_users  # later batches re-emit advanced users
    assert _compact(streamed.collect()) == _batch_latest(spark, sf_dir)
    # restart on the SAME checkpoint with no new files: nothing re-emits
    again = _drain(
        spark,
        stateful_latest_state(
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        ),
        out,
        ckpt,
    )
    assert again.count() == emitted


def test_stateful_quantile_sketch_matches_batch(spark, sf_dir, tmp_path):
    """The streaming k-smallest-hash quantile sketch, drained one file
    per trigger, must end (newest emission per type = max monotone
    n_seen) EXACTLY equal to the batch kmv_quantile_sketch estimates —
    the mergeable-sketch property under real micro-batch boundaries."""
    from mapreduce_rs_spark.operators.events import kmv_quantile_sketch
    from mapreduce_rs_spark.streaming.stateful import stateful_quantile_sketch

    inp = str(tmp_path / "in")
    load_table(spark, sf_dir, "events").repartition(5).write.parquet(inp)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    streamed = _drain(spark, stateful_quantile_sketch(stream), out, ckpt)
    final = {}
    for r in streamed.collect():
        if r.event_type not in final or r.n_seen > final[r.event_type][0]:
            final[r.event_type] = (
                r.n_seen,
                r.est_p50_cents,
                r.est_p95_cents,
                r.est_p99_cents,
            )
    batch = kmv_quantile_sketch(load_tables(spark, sf_dir))
    want = {}
    for r in batch.collect():
        cents = int(round(r.est_value * 100))
        want.setdefault(r.event_type, {})[r.q_bp] = cents
    n_events = load_table(spark, sf_dir, "events").count()
    assert final, "stream emitted nothing"
    total_seen = sum(v[0] for v in final.values())
    assert total_seen == n_events
    for etype, (_, p50, p95, p99) in final.items():
        assert (p50, p95, p99) == (
            want[etype][5000],
            want[etype][9500],
            want[etype][9900],
        ), etype


def test_stateful_latest_state_recovers_across_runs(spark, sf_dir, tmp_path):
    """The op-18 recovery story made concrete: drain an initial batch
    of files, STOP, land a new file, re-drain on the SAME checkpoint —
    the second run must reload per-user state from the store, fold
    ONLY the new file, and the compacted result must equal the batch
    answer over ALL data. (The reference's WAL recovery was a stub,
    coordinator.rs:202-224; the state-store checkpoint is the real
    implementation of the same contract.)"""
    import pyspark.sql.functions as SF
    from mapreduce_rs_spark.streaming.stateful import stateful_latest_state

    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(SF.max("ts")).collect()[0][0]
    import datetime

    split_ts = cutoff - datetime.timedelta(hours=12)
    inp = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    events.where(SF.col("ts") < SF.lit(split_ts)).coalesce(2).write.parquet(inp)

    def drain():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
        return _drain(spark, stateful_latest_state(stream), out, ckpt)

    first = drain().count()
    # land the tail as ONE new file into the same source directory
    events.where(SF.col("ts") >= SF.lit(split_ts)).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    streamed = drain()
    second = streamed.count() - first
    # the second run emitted only users advanced by the tail file
    tail_users = (
        events.where(SF.col("ts") >= SF.lit(split_ts))
        .select("user_id")
        .distinct()
        .count()
    )
    assert 0 < second <= tail_users
    assert _compact(streamed.collect()) == _batch_latest(spark, sf_dir)


def test_stateful_quantile_sketch_recovers_across_runs(spark, sf_dir, tmp_path):
    """Same cross-run recovery for the quantile sketch: the re-drained
    stream's final emission must equal the batch sketch over ALL data —
    the k-smallest sample reloaded from the state store and merged with
    only the new file's rows."""
    import datetime

    import pyspark.sql.functions as SF
    from mapreduce_rs_spark.operators.events import kmv_quantile_sketch
    from mapreduce_rs_spark.streaming.stateful import stateful_quantile_sketch

    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(SF.max("ts")).collect()[0][0]
    split_ts = cutoff - datetime.timedelta(hours=12)
    inp = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    events.where(SF.col("ts") < SF.lit(split_ts)).coalesce(2).write.parquet(inp)

    def drain():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
        return _drain(spark, stateful_quantile_sketch(stream), out, ckpt)

    drain()
    events.where(SF.col("ts") >= SF.lit(split_ts)).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    streamed = drain()
    final = {}
    for r in streamed.collect():
        if r.event_type not in final or r.n_seen > final[r.event_type][0]:
            final[r.event_type] = (
                r.n_seen,
                r.est_p50_cents,
                r.est_p95_cents,
                r.est_p99_cents,
            )
    want = {}
    for r in kmv_quantile_sketch(load_tables(spark, sf_dir)).collect():
        want.setdefault(r.event_type, {})[r.q_bp] = int(round(r.est_value * 100))
    assert sum(v[0] for v in final.values()) == events.count()
    for etype, (_, p50, p95, p99) in final.items():
        assert (p50, p95, p99) == (
            want[etype][5000],
            want[etype][9500],
            want[etype][9900],
        ), etype


def test_stateful_latest_state_late_arrival_cannot_regress(spark, sf_dir, tmp_path):
    """LATE data for the custom-state compactor (r07 verdict #7): the
    NEWER half of the events arrives first; the OLDER half lands in a
    later micro-batch (out-of-order at the batch grain). The op has no
    watermark — latest-wins state must FOLD late rows in silently:

    * a late row older than a user's held state emits nothing (the
      monotone guarantee — state can never regress);
    * exactly the users whose global latest event lives in the late
      half (= users with no rows in the early half) emit in drain 2;
    * the final compacted state equals the batch twin over ALL data,
      as if arrival order had been chronological.
    """
    import datetime

    import pyspark.sql.functions as SF
    from mapreduce_rs_spark.streaming.stateful import stateful_latest_state

    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(SF.max("ts")).collect()[0][0]
    split_ts = cutoff - datetime.timedelta(hours=36)
    inp = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # NEWER half first...
    events.where(SF.col("ts") >= SF.lit(split_ts)).coalesce(2).write.parquet(inp)

    def drain():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
        return _drain(spark, stateful_latest_state(stream), out, ckpt)

    first_rows = {(r.user_id, r.ts, r.event_id) for r in drain().collect()}
    # ...then the OLDER half arrives late
    events.where(SF.col("ts") < SF.lit(split_ts)).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    all_rows = drain().collect()
    late_emissions = [
        r for r in all_rows if (r.user_id, r.ts, r.event_id) not in first_rows
    ]
    # only users ABSENT from the early half can advance on late data
    expect_late_users = {
        r.user_id
        for r in events.groupBy("user_id")
        .agg(SF.max("ts").alias("mx"))
        .where(SF.col("mx") < SF.lit(split_ts))
        .collect()
    }
    assert {r.user_id for r in late_emissions} == expect_late_users
    # every late emission is itself older than the split (it IS late data)
    assert all(r.ts < split_ts for r in late_emissions)
    # and the compaction equals the batch twin over the full union
    assert _compact(all_rows) == _batch_latest(spark, sf_dir)


def test_stateful_quantile_sketch_arrival_order_invariant(spark, sf_dir, tmp_path):
    """OUT-OF-ORDER arrival for the streaming quantile sketch (r07
    verdict #7): the same three time slices drained chronologically vs
    NEWEST-FIRST (so the two older slices are late) must converge to
    the IDENTICAL final emission per type, equal to the batch
    kmv_quantile_sketch — the mergeable-sketch property is what makes
    the op watermark-free, so arrival order must be provably
    irrelevant, not assumed."""
    import datetime

    import pyspark.sql.functions as SF
    from mapreduce_rs_spark.operators.events import kmv_quantile_sketch
    from mapreduce_rs_spark.streaming.stateful import stateful_quantile_sketch

    events = load_table(spark, sf_dir, "events")
    hi = events.agg(SF.max("ts")).collect()[0][0]
    c1, c2 = (hi - datetime.timedelta(hours=48), hi - datetime.timedelta(hours=24))
    slices = [
        events.where(SF.col("ts") < SF.lit(c1)),
        events.where((SF.col("ts") >= SF.lit(c1)) & (SF.col("ts") < SF.lit(c2))),
        events.where(SF.col("ts") >= SF.lit(c2)),
    ]
    assert all(s.count() > 0 for s in slices)

    def run(order, tag):
        inp = str(tmp_path / f"in_{tag}")
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}")
        final = {}
        for s in order:
            s.coalesce(1).write.mode("append").parquet(inp)
            stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
            got = _drain(spark, stateful_quantile_sketch(stream), out, ckpt)
            for r in got.collect():
                if r.event_type not in final or r.n_seen > final[r.event_type][0]:
                    final[r.event_type] = (
                        r.n_seen,
                        r.est_p50_cents,
                        r.est_p95_cents,
                        r.est_p99_cents,
                    )
        return final

    fwd = run(slices, "fwd")
    rev = run(list(reversed(slices)), "rev")  # older slices arrive LATE
    assert fwd == rev
    want = {}
    for r in kmv_quantile_sketch(load_tables(spark, sf_dir)).collect():
        want.setdefault(r.event_type, {})[r.q_bp] = int(round(r.est_value * 100))
    assert sum(v[0] for v in fwd.values()) == events.count()
    for etype, (_, p50, p95, p99) in fwd.items():
        assert (p50, p95, p99) == (
            want[etype][5000],
            want[etype][9500],
            want[etype][9900],
        ), etype
