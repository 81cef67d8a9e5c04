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
