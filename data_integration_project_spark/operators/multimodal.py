"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step itself (JPEG/PNG/audio codecs) needs libraries not in
this container, so it is STUBBED — ``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic fake features from the bytes. Everything around the stub
is real and tested: the schema contract, ``mapInPandas`` batch
iteration (bounded memory per batch — never a full-partition
materialization), and the partitioning story (binary payloads hash-
partition on the id, metadata joins broadcast).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),      # jpeg|png|wav|...
                    T.StructField("byte_len", T.LongType()),
                    T.StructField("width", T.IntegerType()),      # NULL for audio
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),  # NULL for image
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, byte_len long, sum_bytes long, mean_byte double, head_hex string"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents fixture's text as a binary payload so
    the multimodal plumbing is exercisable with in-container data."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, *, fake: bool = False) -> dict:
    """Placeholder for a real image decode (PIL/libvips not available in
    this container). ``fake=True`` produces deterministic byte-level
    pseudo-features so the distributed plumbing can be tested."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips — not present in this environment"
        )
    total = sum(payload)
    return {
        "byte_len": len(payload),
        "sum_bytes": total,
        "mean_byte": total / len(payload) if payload else 0.0,
        "head_hex": payload[:8].hex(),
    }


def extract_features(media: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, streaming per partition (the iterator yields one
    output frame per input batch — peak memory is one batch of payloads,
    not one partition)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(bytes(p), fake=True) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    # payloads hash-partition on the id so decode work spreads across
    # executors even from a single-file source
    return media.repartition(F.col("media_id")).mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: split the payload into n evenly
    spaced byte slices standing in for decoded frames (the real decoder
    would seek keyframes). Pure built-ins — ``substring`` on binary —
    to show the non-UDF path for slice-style extraction."""
    total = F.length("payload")
    step = F.greatest((total / n_frames).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("payload"), i * step + 1, 16).alias("frame_bytes"),
        ),
    )
    return media.select("media_id", F.explode(frames).alias("frame")).select(
        "media_id", F.col("frame.frame_idx").alias("frame_idx"), F.col("frame.frame_bytes").alias("frame_bytes")
    )
