"""Multimodal binary-column plumbing (stubbed decode kernel)."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.operators.multimodal import (
    attach_fake_payload,
    extract_features,
    multimodal_features,
)
from mapreduce_rs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(50)


def test_payload_schema(docs):
    df = attach_fake_payload(docs)
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<")


def test_feature_extraction_deterministic(docs):
    f1 = {r["doc_id"]: r["mean_intensity"] for r in extract_features(attach_fake_payload(docs)).collect()}
    f2 = {r["doc_id"]: r["mean_intensity"] for r in extract_features(attach_fake_payload(docs)).collect()}
    assert f1 == f2
    assert len(f1) == 50
    assert all(v >= 0 for v in f1.values())


def test_resize_stage_shapes(docs):
    from mapreduce_rs_spark.operators.multimodal import resize_images

    out = resize_images(attach_fake_payload(docs), out_w=8, out_h=6).collect()
    assert len(out) == 50
    assert all(len(r["payload"]) == 8 * 6 * 3 for r in out)
    assert all(r["width"] == 8 and r["height"] == 6 for r in out)


def test_frame_sampling_expands_1_to_n(docs):
    from mapreduce_rs_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(attach_fake_payload(docs), n_frames=4).collect()
    assert len(frames) == 50 * 4
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(sorted(f["frame_idx"] for f in fs) == [0, 1, 2, 3] for fs in by_doc.values())
    assert all(
        f["frame_ts_ms"] == int(f["frame_idx"] * 1000 / 30) for fs in by_doc.values() for f in fs
    )
    assert all(len(f["frame"]) > 0 for fs in by_doc.values() for f in fs)


def test_feature_summary(docs):
    rows = multimodal_features(docs).collect()
    assert len(rows) == 1
    assert rows[0]["modality"] == "image/fake"
    assert rows[0]["n_docs"] == 50
    assert rows[0]["total_bytes"] > 0
