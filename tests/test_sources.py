"""Source/sink round-trips: text, csv, json, parquet, orc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.text_analysis import word_count
from mapreduce_rs_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_orc,
    write_parquet,
    write_sorted_text,
)


def test_text_source_line_mode(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("hello world\nhello\n")
    (p / "b.txt").write_text("world\n")
    df = read_text(spark, str(p))
    assert df.count() == 3
    wc = {r["word"]: r["cnt"] for r in word_count(df, "value").collect()}
    assert wc == {"hello": 2, "world": 2}


def test_text_source_whole_file_mode(spark, tmp_path):
    # The reference's exact per-file semantics (src/mr/worker.rs:88-99).
    p = tmp_path / "corpus2"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    df = read_text(spark, str(p), whole_file=True, with_filename=True)
    rows = df.collect()
    assert len(rows) == 1
    assert "line one\nline two" in rows[0]["value"]
    assert rows[0]["input_file"].endswith("a.txt")


def test_csv_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])
    path = str(tmp_path / "csv_out")
    src.write.option("header", True).csv(path)
    back = read_csv(spark, path, schema="id int, name string")
    assert {(r["id"], r["name"]) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_json_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])
    path = str(tmp_path / "json_out")
    src.write.json(path)
    back = read_json(spark, path, schema="id long, name string")
    assert back.count() == 2


def test_parquet_partitioned_sink_prunes(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(10)], ["id", "lang"]
    )
    path = str(tmp_path / "pq_out")
    write_parquet(src, path, partition_by=["lang"])
    back = read_parquet(spark, path).where(F.col("lang") == "en")
    assert back.count() == 5
    # Partition pruning: the physical scan must be restricted to the
    # lang=en directory, not filter after reading both.
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_parquet_schema_evolution_merge(spark, tmp_path):
    # Schema evolution: a later batch adds a column; mergeSchema unions
    # the schemas and back-fills NULL — the contract a long-lived 100 TB
    # dataset depends on when producers upgrade.
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.mode("append").parquet(path)
    from mapreduce_rs_spark.sources.readers import read_parquet

    back = read_parquet(spark, path, merge_schema=True)
    assert set(back.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_compact_parquet_bounds_file_count(spark, tmp_path):
    # Small-files maintenance: 64 micro-batch-sized files compact to
    # ceil(n/target) files, data byte-identical; maxRecordsPerFile also
    # caps the other direction (one huge partition can't make one huge
    # file).
    import glob

    from mapreduce_rs_spark.sources.writers import compact_parquet

    src_path, out_path = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    df.repartition(64).write.parquet(src_path)
    assert len(glob.glob(src_path + "/part-*")) == 64

    small = spark.read.parquet(src_path)
    compact_parquet(small, out_path, target_file_rows=4_000)
    files = glob.glob(out_path + "/part-*")
    assert len(files) == 3  # ceil(10000/4000)
    back = spark.read.parquet(out_path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id"), F.sum("k")).collect() == df.agg(
        F.sum("id"), F.sum("k")
    ).collect()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(20)], ["id", "name", "score"]
    )
    path = str(tmp_path / "orc_out")
    write_orc(src, path, partition_by=["id"])
    back = read_orc(spark, path).where(F.col("id") == 7).select("name")
    rows = back.collect()
    assert [r["name"] for r in rows] == ["name_7"]
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning reaches the ORC scan too


def test_sorted_text_sink(spark, tmp_path):
    # The reference's final artifact: "key value" lines, totally ordered
    # (src/Makefile:8-10 `cat mr-* | sort`).
    df = spark.createDataFrame([("b", 2), ("a", 1), ("c", 3)], ["key", "value"])
    path = str(tmp_path / "final_txt")
    write_sorted_text(df, path)
    lines = [r["value"] for r in spark.read.text(path).collect()]
    assert lines == ["a 1", "b 2", "c 3"]


def test_json_malformed_record_quarantine(spark, tmp_path):
    """At 100 TB some records WILL be malformed; the three policies must
    behave as documented: PERMISSIVE+corrupt_col preserves the raw line
    for a quarantine sink, DROPMALFORMED drops it, FAILFAST dies loudly."""
    from mapreduce_rs_spark.sources.readers import read_json

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "v": "also ok"}\n'
    )
    schema = "id BIGINT, v STRING"

    quarantined = read_json(
        spark, str(p), schema, corrupt_col="_bad"
    ).cache()
    good = quarantined.where(F.col("_bad").isNull())
    bad = quarantined.where(F.col("_bad").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "{this is not json}" in bad.collect()[0]._bad

    dropped = read_json(spark, str(p), schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]

    with pytest.raises(Exception):
        read_json(spark, str(p), schema, mode="FAILFAST").collect()

    with pytest.raises(ValueError):
        read_json(spark, str(p), corrupt_col="_bad")


def test_csv_malformed_record_quarantine(spark, tmp_path):
    from mapreduce_rs_spark.sources.readers import read_csv

    p = tmp_path / "feed.csv"
    p.write_text("id,v\n1,ok\nnot_a_number,broken\n3,fine\n")
    schema = "id BIGINT, v STRING"

    quarantined = read_csv(
        spark, str(p), schema, corrupt_col="_bad"
    ).cache()
    good = quarantined.where(F.col("_bad").isNull())
    bad = quarantined.where(F.col("_bad").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]._bad

    dropped = read_csv(spark, str(p), schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]

    with pytest.raises(Exception):
        read_csv(spark, str(p), schema, mode="FAILFAST").collect()


def test_load_table_handles_both_events_ts_generations(spark, tmp_path):
    """The driver's testdata has shipped events.ts as TIMESTAMP(NANOS)
    in some generations and TIMESTAMP(MICROS) in others; load_table
    must normalize BOTH to a session-UTC TimestampType with identical
    wall values (the round-5 drift incident, fixed type-conditionally)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_rs_spark.sources.catalog import load_table

    rows = {
        "event_id": [1, 2],
        "user_id": [10, 11],
        "event_type": ["click", "view"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    stamps = [
        dt.datetime(2024, 1, 1, 12, 0, 0, 250000),
        dt.datetime(2024, 1, 2, 3, 4, 5, 6),
    ]
    expected = None
    for unit in ("ns", "us"):
        d = tmp_path / f"gen_{unit}"
        os.makedirs(d)
        table = pa.table(
            {**rows, "ts": pa.array(stamps, type=pa.timestamp(unit))}
        )
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", unit
        got = [r["ts"] for r in df.orderBy("event_id").collect()]
        if expected is None:
            expected = got
        assert got == expected == stamps, unit


def test_zordered_sink_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """The z-ordered sink must produce files whose min/max footers are
    tight on BOTH layout columns: vs a same-file-count time-sorted
    write, the average per-file user span must shrink by a large
    factor while the hour span stays bounded — the physical-layout
    counterpart of the zone_map_pruning evaluation, measured on REAL
    written files via input_file_name."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.sources.catalog import load_table
    from mapreduce_rs_spark.sources.writers import write_zordered

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").alias("hour"),
    )
    zpath, tpath = str(tmp_path / "z"), str(tmp_path / "t")
    write_zordered(ev, zpath, "user_id", "hour", n_files=16)
    ev.repartitionByRange(16, "hour").sortWithinPartitions("hour").write.parquet(
        tpath
    )

    def spans(path):
        df = spark.read.parquet(path).select(
            "user_id", "hour", F.input_file_name().alias("f")
        )
        rows = (
            df.groupBy("f")
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("uspan"),
                (F.max("hour") - F.min("hour")).alias("hspan"),
            )
            .collect()
        )
        n = len(rows)
        return (
            sum(r.uspan for r in rows) / n,
            sum(r.hspan for r in rows) / n,
            n,
        )

    zu, zh, zn = spans(zpath)
    tu, th, tn = spans(tpath)
    assert zn == tn == 16
    total_users = ev.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    total_hours = ev.agg(F.max("hour") - F.min("hour")).collect()[0][0]
    # time layout: every file spans ~all users; z layout must cut that
    assert tu > 0.9 * total_users
    assert zu < 0.5 * total_users
    # and z's hour span must stay a bounded fraction, not the full range
    assert zh < 0.6 * total_hours


def test_zordered_sink_survives_wide_id_domains(spark, tmp_path):
    """Snowflake-scale ids (span >> 2^47) must not wrap the
    normalization: the decimal-lifted scaling keeps every bucket in
    [0, 65535] (an int64 wrap throws negatives into the curve), and
    with enough files the layout still tightens the id span."""
    from pyspark.sql import functions as F

    from mapreduce_rs_spark.functions.morton import normalize16_sql
    from mapreduce_rs_spark.sources.writers import write_zordered

    base = 1_400_000_000_000_000_000  # ~1.4e18
    rows = [(base + i * 10_000_000_000_000, i % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, ["big_id", "small"])
    # the regression target: normalization stays in [0, 65535] even
    # when (id - min) * 65536 would wrap int64
    bounds = df.agg(
        F.min("big_id").alias("_amin"), F.max("big_id").alias("_amax")
    )
    buckets = (
        df.crossJoin(F.broadcast(bounds))
        .select(F.expr(normalize16_sql("big_id", "_amin", "_amax")).alias("b"))
        .agg(F.min("b"), F.max("b"))
        .collect()[0]
    )
    assert 0 <= buckets[0] and buckets[1] <= 65535
    # and the sink still works end to end: 64 files give each dim ~3
    # prefix bits, so per-file id spans must fall well below the domain
    path = str(tmp_path / "z")
    write_zordered(df, path, "big_id", "small", n_files=64)
    out = spark.read.parquet(path).select(
        "big_id", F.input_file_name().alias("f")
    )
    per_file = (
        out.groupBy("f")
        .agg((F.max("big_id") - F.min("big_id")).alias("idspan"))
        .collect()
    )
    total_span = rows[-1][0] - rows[0][0]
    assert out.count() == 2000
    avg_span = sum(r.idspan for r in per_file) / len(per_file)
    assert avg_span < 0.35 * total_span
