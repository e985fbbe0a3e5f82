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


def test_feature_summary(docs):
    rows = multimodal_features(docs).collect()
    assert len(rows) == 1
    assert rows[0]["modality"] == "image/fake"
    assert rows[0]["n_docs"] == 50
    assert rows[0]["total_bytes"] > 0
