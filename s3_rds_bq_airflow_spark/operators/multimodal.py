"""Multimodal column handling: opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas
stages over ``mapInPandas``.

Design (per the build spec): image/audio/video payloads are
``binary`` columns; metadata (mime, dimensions, duration) are typed
columns alongside. Decode and feature extraction run in vectorized
pandas batches — the Spark-side plumbing (schema, partitioning, batch
shape) is real and tested; the actual codec call is STUBBED because
image/audio libraries are not in this environment. The stub is
deterministic (byte-level statistics standing in for pixels) so
pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

#: Schema a real image-decode stage would produce per payload.
MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("decode_status", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FEATURE_DIM = 8


def _decode_media(payload: bytes) -> list[float]:
    """STUB decode/feature-extract.

    A real implementation would decode the payload (PIL/ffmpeg/...)
    and emit model features; those libraries are not available here.
    This stand-in derives a deterministic ``FEATURE_DIM``-dim vector
    from byte statistics so the distributed plumbing is fully
    exercisable. Swap the body for the real codec in production.
    """
    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    buckets = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        buckets[i % FEATURE_DIM] += b
    n = len(payload)
    return [round(x / n, 6) for x in buckets]


def extract_media_features(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas``: each partition streams pandas batches through the
    (stubbed) decoder — the production shape for CPU-bound per-item
    decode work. Failures don't poison the batch; they surface as
    ``decode_status = 'error:...'`` rows (dead-letter pattern).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_bytes": [],
                "content_sha256": [],
                "decode_status": [],
                "feature": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(raw))
                out["content_sha256"].append(hashlib.sha256(raw).hexdigest())
                try:
                    out["feature"].append(_decode_media(raw))
                    out["decode_status"].append("ok")
                except NotImplementedError as e:
                    out["feature"].append(None)
                    out["decode_status"].append(f"error:{e}")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_n_seconds: int = 5,
    duration_col: str = "duration_s",
) -> DataFrame:
    """Video frame-sampling *plan*: explode each payload row into the
    frame timestamps a decoder would extract — pure Spark (sequence +
    explode), demonstrating the fan-out stage without the codec."""
    return df.withColumn(
        "frame_ts_s",
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col).cast("long"), F.lit(every_n_seconds))
        ),
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    stride_bytes: int = 128,
) -> DataFrame:
    """Frame sampling over an opaque media payload: slice the binary
    into fixed-size windows every ``stride_bytes`` (the video analogue:
    seek offsets -> decoded frames; here the byte slices THEMSELVES,
    decode being stubbed in this environment).

    Pure JVM expressions: ``sequence`` generates the offsets,
    ``posexplode`` fans out one row per frame, ``substring`` slices
    the payload. Payloads shorter than one frame yield no rows.
    """
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), n - F.lit(frame_bytes), F.lit(stride_bytes))
    return (
        df.where(n >= F.lit(frame_bytes))
        .select(
            F.col(id_col),
            F.posexplode(offsets).alias("frame_idx", "frame_offset"),
            F.col(payload_col),
        )
        .select(
            id_col,
            "frame_idx",
            "frame_offset",
            F.substring(F.col(payload_col), F.col("frame_offset") + 1, F.lit(frame_bytes)).alias(
                "frame"
            ),
        )
    )
