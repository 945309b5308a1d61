"""Multimodal (image/audio/video) column plumbing: opaque binary
payloads + typed metadata, processed with Arrow-batched mapInPandas.

The decode step is a clearly-marked STUB in this environment (no
image/audio libraries in the container): payloads using the
deterministic fake header ``MM1|<kind>|<width>x<height>|`` decode for
real; anything else raises NotImplementedError at the decode boundary.
Everything Spark-side — schema, partition parallelism, Arrow batch
shape, UDF signatures, explode semantics — is real and tested, so
swapping in PIL/ffmpeg later changes only the pure-Python body.

Scale notes: payload bytes ride in parquet binary columns and stream
through Arrow batches sized by spark.sql.execution.arrow.maxRecordsPerBatch;
metadata-only transformations (filtering by width, grouping by kind)
never touch the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MAGIC = b"MM1|"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def fake_payload(kind: str, width: int, height: int, body: bytes = b"") -> bytes:
    """Deterministic stand-in for a real media blob."""
    return FAKE_MAGIC + f"{kind}|{width}x{height}|".encode() + body


def _decode_one(raw: bytes) -> tuple[str, int, int]:
    if raw[:4] != FAKE_MAGIC:
        # STUB: real decoders (PIL / soundfile / ffmpeg) are not in this
        # container; the Spark plumbing is identical once they are.
        raise NotImplementedError(
            "real media decoding unavailable: payload lacks the MM1 fake header"
        )
    _, kind, dims, _rest = raw.split(b"|", 3)
    w, h = dims.split(b"x")
    return kind.decode(), int(w), int(h)


def extract_media_meta(df: DataFrame, id_col: str = "media_id",
                       payload_col: str = "payload") -> DataFrame:
    """binary payload -> typed metadata rows via Arrow-batched
    mapInPandas (one Python stage, then everything downstream is
    relational)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw)
                kind, w, h = _decode_one(raw)
                rows.append((mid, kind, w, h, len(raw)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(decode, META_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 16,
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Video-style frame sampling plumbing: explode each payload into
    fixed-stride chunk rows (stand-in for ffmpeg keyframe extraction).
    Output: (media_id, frame_no, frame: binary)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw)
                for i in range(0, max(len(raw), 1), every_n_bytes):
                    rows.append((mid, i // every_n_bytes, raw[i:i + every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return df.select(id_col, payload_col).mapInPandas(chunk, out_schema)


def media_stats(meta: DataFrame) -> DataFrame:
    """Relational tail of the multimodal pipeline: per-kind profile
    (pure codegen — decode happened exactly once upstream)."""
    return meta.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )


def resize_media(df: DataFrame, width: int, height: int,
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: rewrite each payload to the target dimensions
    (real resamplers slot into the pure-Python body; the fake format
    just rewrites its header). Output schema == input schema, so resize
    composes with decode/frame-sample in either order."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                kind, _w, _h = _decode_one(bytes(raw))
                body = bytes(raw).split(b"|", 3)[3]
                rows.append((mid, fake_payload(kind, width, height, body)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return df.select(id_col, payload_col).mapInPandas(resize, MEDIA_SCHEMA)


FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Feature-extraction plumbing: payload -> fixed-dim float vector
    (deterministic content-hash fake standing in for a vision/audio
    encoder; batch shape and schema are what a real model UDF uses —
    the output feeds operators/knn.py unchanged)."""
    import hashlib

    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # engine-portable arithmetic (lets the kNN query over these
        # features carry an exact SQL oracle): explicit little-endian
        # u16 lanes, the division in float64, HALF_UP rounding (the
        # Spark/DuckDB round convention — numpy's .round is half-even
        # and diverges on boundary values), then one float32 quantize
        # matching the output schema's CAST
        from .knn import _round_half_up

        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.sha256(bytes(raw)).digest()
                u = np.frombuffer(digest[:FEATURE_DIM * 2], dtype="<u2")
                vec = np.asarray(
                    [_round_half_up(float(x)) for x in u.astype(np.float64) / 65535.0],
                    dtype=np.float32,
                )
                rows.append((mid, vec.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return df.select(id_col, payload_col).mapInPandas(featurize, _FEATURE_SCHEMA)
