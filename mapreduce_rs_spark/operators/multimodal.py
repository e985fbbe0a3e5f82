"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB multimodal pipeline treats image/audio/video as ``binary``
columns with a metadata struct, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched Python stages (``mapInPandas``) —
the one place imperative Python is the right tool, because codecs aren't
column expressions.

The container has no image/audio codecs, so the decode kernel here is a
clearly-marked deterministic STUB (shape parsing from the payload header
we synthesize) — the Spark-side contract (schema, batch iteration,
partitioning, UDF signature) is real and tested, and swapping the stub
for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode/feature stage. Keeping it flat and typed
# means downstream joins/aggs stay JVM-side.
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, width int, height int, "
    "n_channels int, mean_intensity double"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary column + metadata struct from text
    (deterministic stand-in for real image bytes). Mirrors how a real
    pipeline lands multimodal rows: payload + modality + declared dims."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            (F.length(text_col) % 64 + 1).alias("width"),
            (F.length(text_col) % 48 + 1).alias("height"),
            F.lit(3).alias("n_channels"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, width: int, height: int, n_channels: int) -> float:
    """STUB decode kernel. A real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload)); np.asarray(img).mean()
    Here: a deterministic pseudo-intensity from the payload bytes so
    tests have stable golden values. Raises on empty payloads the way a
    real codec raises on truncated files."""
    if not payload:
        raise NotImplementedError("empty payload: real codec would fail here")
    return (sum(payload[:256]) % 2551) / 10.0


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage over (payload, meta) rows.

    ``mapInPandas`` streams column batches through Python; each batch is
    one Arrow RecordBatch (sized by arrow.maxRecordsPerBatch), so memory
    is bounded regardless of partition size — the property that matters
    when payloads are megabytes each. Narrow: no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            meta = pd.DataFrame(list(batch["meta"]))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "modality": meta["content_type"],
                    "n_bytes": batch["payload"].map(len),
                    "width": meta["width"].astype("int32"),
                    "height": meta["height"].astype("int32"),
                    "n_channels": meta["n_channels"].astype("int32"),
                    "mean_intensity": [
                        _decode_stub(p, w, h, c)
                        for p, w, h, c in zip(
                            batch["payload"], meta["width"], meta["height"], meta["n_channels"]
                        )
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int, n_channels int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame binary"


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 24) -> DataFrame:
    """Resize stage over (payload, meta) rows — Arrow-batched, 1:1.

    STUB kernel: a real implementation is PIL's ``Image.resize``; here
    the output payload is a deterministic byte fold of the input sized
    to out_w·out_h·channels, so tests can assert exact shapes and
    deterministic content. The Spark-side contract (binary in/out,
    bounded batches, schema) is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            meta = pd.DataFrame(list(batch["meta"]))
            resized = []
            for p, ch in zip(batch["payload"], meta["n_channels"]):
                # Output length honors the per-row channel count so the
                # payload-length == w*h*channels contract holds.
                n_out = out_w * out_h * int(ch)
                resized.append(
                    bytes((p * (n_out // max(len(p), 1) + 1))[:n_out]) if p else b"\x00" * n_out
                )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": resized,
                    "width": out_w,
                    "height": out_h,
                    "n_channels": meta["n_channels"].astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, n_frames: int = 4, fps: int = 30) -> DataFrame:
    """Frame-sampling stage: one input 'video' row → n_frames output
    rows (the 1:N expansion shape). STUB kernel slices the payload into
    equal chunks standing in for decoded frames; a real one calls
    ffmpeg/pyav per row. Output stays bounded per Arrow batch because
    expansion happens inside the generator, never materializing a whole
    partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                if not payload:
                    # One bad record must not kill a distributed job:
                    # skip (emit zero frames), as a real pipeline would
                    # route undecodable rows to a quarantine sink.
                    continue
                chunk = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(int(i * 1000 / fps))
                    out["frame"].append(bytes(payload[i * chunk : (i + 1) * chunk] or payload[:chunk]))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def multimodal_features(df: DataFrame) -> DataFrame:
    """End-to-end multimodal stage: attach payloads → decode/extract →
    per-modality feature summary (the JVM-side agg after the Python
    stage). queries() exposes this rows-only (no SQL oracle — the decode
    kernel is not SQL-expressible by design)."""
    feats = extract_features(attach_fake_payload(df))
    return (
        feats.groupBy("modality")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("mean_intensity").alias("avg_intensity"),
            F.max("width").alias("max_width"),
        )
        .orderBy("modality")
    )
