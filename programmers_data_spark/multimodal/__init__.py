"""Multimodal (image/audio/video) column plumbing (north-star tier).

Design: media travel as opaque `binary` columns with typed metadata
(mime, source, byte length); decode / feature-extraction / resize /
frame-sampling run as Arrow-batched pandas functions over
`mapInPandas`, so each executor processes whole record batches and
the JVM↔Python boundary is columnar.

The container has no image/audio codecs, so `decode_media` is a STUB:
with `fake=True` (default in tests) it produces a deterministic fake
decode (dimensions derived from the payload hash) through the REAL
mapInPandas path — schema, batching, partitioning all exercised;
with `fake=False` it raises NotImplementedError where a codec
(Pillow/ffmpeg) would be invoked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload_md5", T.StringType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, content_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Promote a content column to the opaque media representation."""
    payload = F.encode(F.col(content_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: dimensions from the md5 of
    the payload bytes. Same arithmetic is SQL-expressible, which lets
    the driver oracle-check the whole mapInPandas path."""
    md5s = [hashlib.md5(p).hexdigest() if p is not None else None for p in pdf["payload"]]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "mime": pdf["mime"],
            "n_bytes": pdf["n_bytes"],
            "width": [(n % 640) + 1 for n in pdf["n_bytes"]],
            "height": [(n % 480) + 1 for n in pdf["n_bytes"]],
            "payload_md5": md5s,
        }
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary payloads → metadata + dimensions via mapInPandas
    (Arrow record batches; partition-parallel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires a codec library "
                    "(Pillow/ffmpeg) not present in this environment"
                )
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1000, fake: bool = True) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" offset —
    the explode-shaped output a video pipeline produces. Deterministic
    offsets (every_n_bytes strides over the payload)."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat_idx", T.IntegerType(), False),
        T.StructField("feat_val", T.DoubleType(), True),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM, fake: bool = True) -> DataFrame:
    """Feature-extraction stub: the embedding-model stage of a media
    pipeline as Arrow-batched mapInPandas. With fake=True the
    "features" are a deterministic function of byte length — arbitrary
    but SQL-expressible, so the whole batch path oracle-checks. Output
    is long-form (media_id, feat_idx, feat_val): scalar columns hash
    portably and downstream similarity ops can pivot as needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model"
                )
            n = pdf["n_bytes"].to_numpy()
            out = []
            for j in range(dim):
                out.append(
                    pd.DataFrame(
                        {
                            "media_id": pdf["media_id"],
                            "feat_idx": j,
                            "feat_val": ((n * (j + 1)) % 997) / 997.0,
                        }
                    )
                )
            yield pd.concat(out)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 48, fake: bool = True
) -> DataFrame:
    """Resize stub: binary→binary through the real mapInPandas path.
    With fake=True the "resized" payload is a deterministic truncation
    to width*height bytes (a stand-in for a pixel buffer); with
    fake=False this is where Pillow's resize would run."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires Pillow")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        None if p is None else bytes(p)[:target]
                        for p in pdf["payload"]
                    ],
                    "mime": pdf["mime"],
                    "n_bytes": [
                        0 if p is None else min(len(p), target)
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    return media.mapInPandas(run, schema=schema)
