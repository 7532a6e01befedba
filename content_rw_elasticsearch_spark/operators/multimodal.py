"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition-preserving batch iteration,
UDF signatures, metadata extraction) is real and tested; the actual media
decode is STUBBED — the sandbox has no image/audio libraries — behind
``decode_image_stub``: it raises NotImplementedError unless
``deterministic_fake=True``, in which case it produces a seeded fake
"decoded" feature block so the downstream plumbing is exercisable
end-to-end. Swap the stub body for PIL/libav calls in production; nothing
else changes.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); mapInPandas streams Arrow batches so one task never holds
more than spark.sql.execution.arrow.maxRecordsPerBatch blobs; feature
extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic opaque-binary media table derived from documents:
    payload = utf-8 bytes of text (a stand-in blob; at rest this is a real
    image/audio payload). Typed metadata computed columnar-side."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        mime.alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


def decode_image_stub(payload: bytes, deterministic_fake: bool) -> dict:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)). The
    deterministic fake derives (width, height, mean_intensity) from the
    payload bytes so tests pin exact values."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires an image library not present in this "
            "environment; pass deterministic_fake=True for the test fake"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    n = int(b.size)
    width = int(n % 640) + 1
    height = int((n * 7) % 480) + 1
    mean = float(b.mean()) if n else 0.0
    return {"width": width, "height": height, "mean_intensity": round(mean, 4)}


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (the
    decode/resize/frame-sample slot). Batch-shaped: one Python call per
    Arrow batch, numpy inside."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(p if isinstance(p, bytes) else bytes(p),
                                  deterministic_fake)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )

    cols = ["media_id", "media_type", "n_bytes", "payload"]
    return media.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-columnar metadata rollup (no decode): bytes per media type."""
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


def media_metadata_sql() -> str:
    return """
WITH media AS (
  SELECT doc_id AS media_id,
         list_extract(['image','audio','video'], CAST(doc_id % 3 + 1 AS INT)) AS media_type,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT media_type, count(*)::BIGINT AS n, sum(n_bytes)::BIGINT AS total_bytes,
       min(n_bytes)::BIGINT AS min_bytes, max(n_bytes)::BIGINT AS max_bytes
FROM media GROUP BY media_type ORDER BY media_type
"""


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("payload_sha", StringType()),
    ]
)


def resize_images_stub(payload: bytes, w: int, h: int,
                       deterministic_fake: bool) -> bytes:
    """STUB: real impl is PIL Image.resize((w, h)) → re-encode. The
    deterministic fake tiles/truncates the payload to exactly w*h bytes
    (one fake byte per output pixel) so output SIZE behaves like a real
    resize — downstream partition-size planning is exercisable — and the
    bytes are a pure function of (payload, w, h) so tests pin shas."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resize requires an image library not present in this "
            "environment; pass deterministic_fake=True for the test fake"
        )
    n = w * h
    if not payload:
        return b"\x00" * n
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(media: DataFrame, w: int, h: int,
                  deterministic_fake: bool = True) -> DataFrame:
    """Batch resize over binary image payloads (the brief's resize slot):
    mapInPandas, one Python call per Arrow batch, no shuffle — pure map,
    embarrassingly parallel at any corpus size. Output payload size is
    w*h per row, so `spark.sql.files.maxPartitionBytes` sizing for the
    downstream write is computable up front (rows_per_task ≈
    maxPartitionBytes / (w*h)) — the real 100 TB concern this operator's
    plumbing has to get right, independent of the decode library."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_images_stub(
                    p if isinstance(p, bytes) else bytes(p), w, h,
                    deterministic_fake)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": np.full(len(out), w, dtype=np.int32),
                    "height": np.full(len(out), h, dtype=np.int32),
                    "payload": out,
                    "payload_sha": [hashlib.sha256(b).hexdigest() for b in out],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  frame_bytes: int = 256,
                  deterministic_fake: bool = True) -> DataFrame:
    """Frame sampling over video payloads (the brief's frame-sample slot):
    ONE input row fans out to MANY frame rows inside mapInPandas — the
    Spark-side shape that matters (a pandas-UDF cannot change cardinality;
    mapInPandas can), with Arrow batches bounding how many blobs a worker
    holds. Still a pure map: no shuffle, frames inherit the input's
    partitioning, and a downstream repartition by media_id (only if a
    per-video gather is needed) is the caller's explicit choice.

    The decode/demux is STUBBED like the rest of this module (no libav in
    the sandbox): the deterministic fake derives a frame count from the
    payload size (≈ one frame per every_ms-worth of fake 1 KB/s "video")
    and each frame's bytes from (payload, frame_idx), so cardinality and
    shas are test-pinnable. Real impl: av.open → seek/decode keyframes."""
    if not deterministic_fake:
        raise NotImplementedError(
            "frame sampling requires a video library not present in this "
            "environment; pass deterministic_fake=True for the test fake"
        )
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames, shas = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = p if isinstance(p, bytes) else bytes(p)
                # fake duration: 1 byte ≈ 1 ms of video, ≥1 frame per clip
                n_frames = max(1, len(payload) // max(1, every_ms))
                for i in range(n_frames):
                    fb = resize_images_stub(
                        payload[i % max(1, len(payload)):] or b"\x00",
                        frame_bytes, 1, True)
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(fb)
                    shas.append(hashlib.sha256(fb).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                    "frame_sha": shas,
                }
            )

    vids = media.filter(F.col("media_type") == "video")
    return vids.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)
