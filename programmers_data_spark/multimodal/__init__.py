"""Multimodal (image/audio/video) column plumbing (north-star tier).

Design: media travel as opaque `binary` columns with typed metadata
(mime, source, byte length); decode / feature-extraction / resize /
frame-sampling run as Arrow-batched pandas functions over
`mapInPandas`, so each executor processes whole record batches and
the JVM↔Python boundary is columnar.

Codec strategy: with `fake=True` (the default, and the oracle path)
decode/resize/frame-sample produce deterministic, SQL-expressible
outputs through the REAL mapInPandas path — schema, batching,
partitioning all exercised. With `fake=False` the real codec runs
when its optional dependency is importable (Pillow for image
decode/resize, ffprobe for video packet sampling) and raises
NotImplementedError otherwise — an honest gate, never a silent
fallback to fake output. Tests for the real paths are skipif-gated
on the same availability probes.
"""

from __future__ import annotations

import hashlib
import importlib.util
import shutil
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


def pillow_available() -> bool:
    """True when the optional Pillow dependency is importable (probe
    used by both the codec dispatch and the skipif test gates)."""
    return importlib.util.find_spec("PIL") is not None


def ffprobe_available() -> bool:
    """True when the ffprobe binary (ffmpeg suite) is on PATH."""
    return shutil.which("ffprobe") is not None


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


def _pillow_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real image decode: Pillow opens each payload from an in-memory
    buffer; width/height come from the actual image header. Runs
    inside the executor's Python worker — payload bytes never leave
    the Arrow batch."""
    import io

    from PIL import Image

    widths: list[int | None] = []
    heights: list[int | None] = []
    md5s: list[str | None] = []
    for p in pdf["payload"]:
        if p is None:
            widths.append(None), heights.append(None), md5s.append(None)
            continue
        raw = bytes(p)
        with Image.open(io.BytesIO(raw)) as im:
            widths.append(im.width), heights.append(im.height)
        md5s.append(hashlib.md5(raw).hexdigest())
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "mime": pdf["mime"],
            "n_bytes": pdf["n_bytes"],
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
            "payload_md5": md5s,
        }
    )


def _builtin_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decode without Pillow: the pure-stdlib PNG reader
    (multimodal.png) parses actual image headers. Non-PNG payloads
    raise NotImplementedError — an honest per-payload gate, never a
    silent fallback to the fake codec."""
    from . import png as _png

    widths: list[int | None] = []
    heights: list[int | None] = []
    md5s: list[str | None] = []
    for p in pdf["payload"]:
        if p is None:
            widths.append(None), heights.append(None), md5s.append(None)
            continue
        raw = bytes(p)
        if not _png.is_png(raw):
            raise NotImplementedError(
                "builtin codec only decodes PNG; other formats need "
                "Pillow (optional dependency not present)"
            )
        w, h, _, _ = _png.read_header(raw)
        widths.append(w), heights.append(h)
        md5s.append(hashlib.md5(raw).hexdigest())
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "mime": pdf["mime"],
            "n_bytes": pdf["n_bytes"],
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
            "payload_md5": md5s,
        }
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary payloads → metadata + dimensions via mapInPandas
    (Arrow record batches; partition-parallel). fake=False dispatches
    to Pillow when importable, else to the pure-stdlib PNG reader
    (multimodal.png) — non-PNG payloads then raise executor-side.
    Never silently fakes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _pillow_decode_batch if pillow_available() else _builtin_decode_batch
        for pdf in batches:
            yield _fake_decode_batch(pdf) if fake else real(pdf)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("byte_offset", T.LongType(), True),
    ]
)


def _ffprobe_frames_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real frame sampling: ffprobe reports video keyframe packet
    positions (pts-ordered `pos` fields) for each payload, read from
    stdin so payloads never touch executor disk. One subprocess per
    media row — the per-row cost is the decode itself, so this stays
    in the partition-parallel Arrow path."""
    import json as _json
    import subprocess

    ids: list[int] = []
    idxs: list[int] = []
    offs: list[int | None] = []
    for media_id, p in zip(pdf["media_id"], pdf["payload"]):
        if p is None:
            continue
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "v",
                "-show_packets", "-print_format", "json", "-",
            ],
            input=bytes(p), capture_output=True, check=True,
        )
        packets = _json.loads(out.stdout or b"{}").get("packets", [])
        key = [pk for pk in packets if "K" in pk.get("flags", "")]
        for i, pk in enumerate(key):
            ids.append(media_id)
            idxs.append(i)
            offs.append(int(pk["pos"]) if "pos" in pk else None)
    return pd.DataFrame(
        {
            "media_id": pd.array(ids, dtype="int64"),
            "frame_idx": pd.array(idxs, dtype="int32"),
            "byte_offset": pd.array(offs, dtype="Int64"),
        }
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling: one row per sampled frame offset — the
    explode-shaped output a video pipeline produces.

    fake=True (oracle path): deterministic offsets, every_n_bytes
    strides over the payload, pure built-in explode/sequence (no
    Python at all). fake=False: ffprobe keyframe packet positions via
    mapInPandas when the binary is on PATH, else raises."""
    if not fake:
        if not ffprobe_available():
            raise NotImplementedError(
                "real frame sampling requires ffprobe (ffmpeg suite) "
                "on PATH; use fake=True for the deterministic strides"
            )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _ffprobe_frames_batch(pdf)

        return media.mapInPandas(run, schema=FRAMES_SCHEMA)
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).cast("long").alias("byte_offset"),
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
    fake=False Pillow resizes when importable, else the pure-stdlib
    PNG codec does a nearest-neighbor resize (non-PNG payloads raise
    executor-side)."""

    def _builtin_resize_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from . import png as _png

        payloads: list[bytes | None] = []
        for p in pdf["payload"]:
            if p is None:
                payloads.append(None)
                continue
            raw = bytes(p)
            if not _png.is_png(raw):
                raise NotImplementedError(
                    "builtin codec only resizes PNG; other formats "
                    "need Pillow (optional dependency not present)"
                )
            payloads.append(_png.resize_nearest(raw, width, height))
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "payload": payloads,
                "mime": "image/png",
                "n_bytes": [0 if p is None else len(p) for p in payloads],
                "width": width,
                "height": height,
            }
        )

    def _pillow_resize_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        import io

        from PIL import Image

        payloads: list[bytes | None] = []
        for p in pdf["payload"]:
            if p is None:
                payloads.append(None)
                continue
            with Image.open(io.BytesIO(bytes(p))) as im:
                buf = io.BytesIO()
                im.resize((width, height)).save(buf, format="PNG")
            payloads.append(buf.getvalue())
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "payload": payloads,
                "mime": "image/png",
                "n_bytes": [0 if p is None else len(p) for p in payloads],
                "width": width,
                "height": height,
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        real = (
            _pillow_resize_batch
            if pillow_available()
            else _builtin_resize_batch
        )
        for pdf in batches:
            if not fake:
                yield real(pdf)
                continue
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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_audio(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio metadata probe through the Arrow mapInPandas path. With
    fake=True (the oracle path) the fields are a deterministic,
    SQL-expressible function of the payload byte length; with
    fake=False the pure-stdlib WAV reader (multimodal.wav) parses the
    real RIFF header — non-WAV payloads raise executor-side, never a
    silent fake."""

    def _fake_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        rates = [8000 + (n % 8) for n in pdf["n_bytes"]]
        frames = list(pdf["n_bytes"])
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "sample_rate": pd.array(rates, dtype="Int32"),
                "n_channels": pd.array(
                    [(n % 2) + 1 for n in pdf["n_bytes"]], dtype="Int32"
                ),
                "bit_depth": pd.array([16] * len(pdf), dtype="Int32"),
                "n_frames": pd.array(frames, dtype="Int64"),
                "duration_ms": pd.array(
                    [f * 1000 // r for f, r in zip(frames, rates)],
                    dtype="Int64",
                ),
            }
        )

    def _real_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from . import wav as _wav

        out = {k: [] for k in (
            "media_id", "sample_rate", "n_channels", "bit_depth",
            "n_frames", "duration_ms",
        )}
        for media_id, p in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(media_id)
            if p is None:
                for k in list(out)[1:]:
                    out[k].append(None)
                continue
            raw = bytes(p)
            if not _wav.is_wav(raw):
                raise NotImplementedError(
                    "builtin probe only reads WAV; other audio formats "
                    "need an external decoder (not present)"
                )
            rate, ch, depth, frames = _wav.read_header(raw)
            out["sample_rate"].append(rate)
            out["n_channels"].append(ch)
            out["bit_depth"].append(depth)
            out["n_frames"].append(frames)
            out["duration_ms"].append(frames * 1000 // rate if rate else None)
        return pd.DataFrame(
            {
                "media_id": out["media_id"],
                "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                "n_channels": pd.array(out["n_channels"], dtype="Int32"),
                "bit_depth": pd.array(out["bit_depth"], dtype="Int32"),
                "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_batch(pdf) if fake else _real_batch(pdf)

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)
