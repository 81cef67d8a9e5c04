"""Minimal pure-stdlib WAV (RIFF/PCM) reader+writer.

Companion to multimodal/png.py: gives the audio modality a REAL
header probe in environments without media libraries. Only `struct`
from the standard library; the RIFF/WAVE format is public (Microsoft
multimedia spec / RFC 2361 registry).

Scope: standard PCM (`fmt ` tag 1) and IEEE-float (tag 3) WAV files,
any sample rate / channel count / common bit depth. Compressed
codecs raise ValueError rather than mis-parse.
"""

from __future__ import annotations

import struct


def is_wav(raw: bytes) -> bool:
    return (
        len(raw) >= 12
        and bytes(raw[:4]) == b"RIFF"
        and bytes(raw[8:12]) == b"WAVE"
    )


def read_header(raw: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bit_depth, n_frames) from the fmt
    and data chunks — header-only, no sample decoding."""
    if not is_wav(raw):
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(raw):
        ctype = bytes(raw[pos : pos + 4])
        (length,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _, block_align, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag not in (1, 3):  # PCM / IEEE float
                raise ValueError(f"compressed WAV (fmt tag {tag}) not supported")
            fmt = (rate, channels, depth, block_align)
        elif ctype == b"data":
            data_len = length
        # chunks are word-aligned: odd lengths carry a pad byte
        pos += 8 + length + (length & 1)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels, depth, block_align = fmt
    if block_align == 0:
        raise ValueError("zero block alignment")
    return rate, channels, depth, data_len // block_align


def encode(
    sample_rate: int,
    n_channels: int,
    bit_depth: int,
    pcm: bytes,
) -> bytes:
    """Write a standard PCM WAV around a raw little-endian sample
    buffer (length must be a whole number of frames)."""
    block_align = n_channels * bit_depth // 8
    if block_align == 0 or len(pcm) % block_align:
        raise ValueError("pcm buffer is not a whole number of frames")
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align,
        bit_depth,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_pcm(raw: bytes) -> bytes:
    """The raw little-endian sample buffer from the data chunk — the
    decode half of the roundtrip (encode → read_header + read_pcm),
    which licenses pre-encode oracles for operators that hash decoded
    samples (the png.decode precedent)."""
    if not is_wav(raw):
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    while pos + 8 <= len(raw):
        ctype = bytes(raw[pos : pos + 4])
        (length,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if ctype == b"data":
            body = raw[pos + 8 : pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated data chunk")
            return bytes(body)
        pos += 8 + length + (length & 1)
    raise ValueError("missing data chunk")
