"""The r12 fused-Python-stage rewrites must be result-identical to the
unfused attach -> extract compositions they replaced.

Each codec query used to chain two (image_resize_stats: three) Python
nodes; fusing them into one ``mapInPandas`` stage (``_fuse_runs``)
removes the extra worker pools and the payload Arrow round-trips
between them (guide §4), but the SAME generators run in the same order,
so every output row must match byte-for-byte. These tests pin that by
rebuilding each query the old way from the still-public components and
comparing collected row sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_rs_spark.operators import multimodal as mm
from mapreduce_rs_spark.sources.catalog import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _assert_same(fused_df, unfused_df, sort_cols):
    a = [tuple(r) for r in fused_df.orderBy(*sort_cols).collect()]
    b = [tuple(r) for r in unfused_df.orderBy(*sort_cols).collect()]
    assert a == b
    assert len(a) > 0


def test_gif_frame_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.gif_frame_stats(df)
    unfused = mm.extract_gif_frames(mm.attach_gif_payload(df))
    _assert_same(fused, unfused, ["doc_id", "frame_idx"])


def test_jpeg_decode_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.jpeg_decode_stats(df)
    feats = mm.extract_features(mm.attach_jpeg_payload(df))
    n_pixels = F.col("width") * F.col("height")
    unfused = feats.select(
        "doc_id",
        "width",
        "height",
        ((F.col("width") / 8) * (F.col("height") / 8)).cast("int").alias("n_blocks"),
        n_pixels.alias("n_pixels"),
        F.round(F.col("mean_intensity") * n_pixels).cast("long").alias("sum_intensity"),
        "mean_intensity",
    )
    _assert_same(fused, unfused, ["doc_id"])


def test_png_decode_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.png_decode_stats(df)
    feats = mm.extract_features(
        mm.attach_png_payload(df.where(F.col("doc_id") % 2 == 0))
    )
    n_pixels = F.col("width") * F.col("height")
    unfused = feats.select(
        "doc_id",
        "width",
        "height",
        n_pixels.alias("n_pixels"),
        F.round(F.col("mean_intensity") * n_pixels).cast("long").alias("sum_intensity"),
        "mean_intensity",
    )
    _assert_same(fused, unfused, ["doc_id"])


def test_bmp_decode_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.bmp_decode_stats(df)
    feats = mm.extract_features(
        mm.attach_bmp_payload(df.where(F.col("doc_id") % 2 == 1))
    )
    n_bytes_px = F.col("width") * F.col("height") * F.lit(3)
    unfused = feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("width") * F.col("height")).alias("n_pixels"),
        F.round(F.col("mean_intensity") * n_bytes_px).cast("long").alias("sum_intensity"),
        "mean_intensity",
    )
    _assert_same(fused, unfused, ["doc_id"])


def test_wav_decode_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.wav_decode_stats(df)
    unfused = mm.extract_audio_features(mm.attach_wav_payload(df)).select(
        "doc_id", "n_frames", "n_channels", "sample_rate", "n_samples",
        "sum_amplitude", "mean_amplitude", "duration_ms",
    )
    _assert_same(fused, unfused, ["doc_id"])


def test_wav_frame_features_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.wav_frame_features(df)
    unfused = mm.extract_wav_windows(mm.attach_wav_payload(df))
    _assert_same(fused, unfused, ["doc_id", "win_idx"])


def test_video_frame_sample_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.video_frame_sample(df)
    unfused = mm.sample_video_frames(mm.attach_gif_payload(df)).drop("frame")
    _assert_same(fused, unfused, ["doc_id", "sample_idx"])


def test_image_resize_stats_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.image_resize_stats(df)
    feats = mm.resize_images(
        mm.attach_png_payload(df.where(F.col("doc_id") % 2 == 0)),
        out_w=mm.RESIZE_STATS_W,
        out_h=mm.RESIZE_STATS_H,
    )

    def stats(batches):
        import pandas as pd

        for batch in batches:
            sums = [sum(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "width": batch["width"],
                    "height": batch["height"],
                    "n_pixels": pd.array(
                        [int(w) * int(h) for w, h in zip(batch["width"], batch["height"])],
                        dtype="int64",
                    ),
                    "sum_intensity": pd.array(sums, dtype="int64"),
                    "mean_intensity": [
                        s / (int(w) * int(h))
                        for s, w, h in zip(sums, batch["width"], batch["height"])
                    ],
                }
            )

    unfused = feats.mapInPandas(
        stats,
        schema=(
            "doc_id long, width int, height int, n_pixels long, "
            "sum_intensity long, mean_intensity double"
        ),
    )
    _assert_same(fused, unfused, ["doc_id"])


def test_multimodal_features_fusion(spark, sf_dir):
    df = _docs(spark, sf_dir)
    fused = mm.multimodal_features(df)
    even = mm.attach_png_payload(df.where(F.col("doc_id") % 2 == 0))
    odd = mm.attach_bmp_payload(df.where(F.col("doc_id") % 2 == 1))
    feats = mm.extract_features(even.unionByName(odd))
    units = F.col("width").cast("long") * F.col("height") * F.col("n_channels")
    sum_int = F.round(F.col("mean_intensity") * units).cast("long")
    unfused = (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum(sum_int).alias("sum_intensity"),
            F.sum(units).alias("total_units"),
            F.max("width").alias("max_width"),
        )
        .select(
            "modality",
            "n_docs",
            "total_pixels",
            "sum_intensity",
            (F.col("sum_intensity").cast("double") / F.col("total_units")).alias(
                "avg_intensity"
            ),
            "max_width",
        )
    )
    _assert_same(fused, unfused, ["modality"])


def test_multimodal_features_parity_matches_spark_remainder_semantics(spark):
    """Out-of-contract negative doc_ids must route exactly as the
    pre-fusion Spark-side filters did (ADVICE r12): Spark's remainder is
    sign-preserving, so `doc_id % 2 == 0` admits even ids of ANY sign to
    the PNG branch while a negative odd id (remainder -1) matches
    NEITHER branch and is dropped. The fused stage's Python dispatch
    must reproduce that, not Python's floored modulo (which would send
    negative odds to BMP)."""
    df = spark.createDataFrame(
        [(d, f"doc {d} body text") for d in (-3, -2, -1, 0, 1, 2)],
        "doc_id long, text string",
    )
    fused = mm.multimodal_features(df)
    even = mm.attach_png_payload(df.where(F.col("doc_id") % 2 == 0))
    odd = mm.attach_bmp_payload(df.where(F.col("doc_id") % 2 == 1))
    feats = mm.extract_features(even.unionByName(odd))
    units = F.col("width").cast("long") * F.col("height") * F.col("n_channels")
    sum_int = F.round(F.col("mean_intensity") * units).cast("long")
    unfused = (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum(sum_int).alias("sum_intensity"),
            F.sum(units).alias("total_units"),
            F.max("width").alias("max_width"),
        )
        .select(
            "modality",
            "n_docs",
            "total_pixels",
            "sum_intensity",
            (F.col("sum_intensity").cast("double") / F.col("total_units")).alias(
                "avg_intensity"
            ),
            "max_width",
        )
    )
    _assert_same(fused, unfused, ["modality"])
    counts = {r["modality"]: r["n_docs"] for r in fused.collect()}
    # -3 and -1 (negative odd) match neither branch; -2, 0, 2 -> PNG; 1 -> BMP
    assert counts == {"image/png": 3, "image/bmp": 1}
