"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the lake stores media as opaque
``binary`` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — media bytes never pass through
row-at-a-time Python, and each task decodes only its partition's
batches.

The codec tier is a REAL, dependency-free parser for the formats whose
containers are simple enough to decode without Pillow/ffmpeg (neither is
available in this environment): binary PPM (P6, RGB) and PGM (P5,
grayscale) images — full header parse + pixel statistics — and RIFF/WAVE
audio — fmt/data chunk walk + 16-bit sample statistics. Anything else
degrades to metadata-only (`format='unknown'`, NULL dims) instead of
erroring, which is the behavior you want when a 100 TB corpus contains
the odd corrupt blob. Swapping in Pillow/ffmpeg for the exotic formats
changes only `_decode_one`; the mapInPandas contract is untouched.

Reference capability: bytes→binary handling in
/root/reference/src/document_utils.py:59-61 (which only re-encodes;
decode here is the scaled-up version of that hook).
"""

from __future__ import annotations

import hashlib
import struct
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

#: Output schema of the media decode stage. Image rows fill
#: width/height/channels; audio rows fill channels/sample_rate;
#: mean_value is the mean pixel (images) or mean |sample| (audio).
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mean_value", DoubleType()),
    ]
)


def to_binary_column(
    df: DataFrame, src_col: str, out_col: str = "payload", mime: str = "application/octet-stream"
) -> DataFrame:
    """Treat a column as an opaque binary payload + metadata struct.

    Real pipelines read media bytes from object storage; here any column
    is castable to binary, which exercises the identical plumbing.
    """
    payload = F.col(src_col).cast(BinaryType())
    meta = F.struct(
        F.octet_length(payload).alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        F.lit(mime).alias("mime"),
    )
    return df.withColumn(out_col, payload).withColumn("media_meta", meta)


# ---------------------------------------------------------------------------
# Pure-Python codecs (netpbm images, RIFF/WAVE audio)
# ---------------------------------------------------------------------------


def _netpbm_header(buf: bytes) -> tuple[list[int], int]:
    """Parse the three netpbm header integers (width, height, maxval)
    after the magic, honoring ``#`` comments; returns (ints, data offset).
    """
    i, tokens = 2, []
    while len(tokens) < 3:
        while i < len(buf):
            c = buf[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                while i < len(buf) and buf[i : i + 1] != b"\n":
                    i += 1
            else:
                break
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(int(buf[i:j]))
        i = j
    return tokens, i + 1  # exactly one whitespace byte before pixel data


def parse_ppm(payload: bytes) -> dict:
    """Decode a binary PPM (P6) or PGM (P5) image: header + pixel stats.

    Returns format/width/height/channels/mean_value; raises ValueError
    on a malformed or truncated payload (maxval > 255 — two-byte
    samples — is unsupported, like most fast-path decoders).
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    (width, height, maxval), off = _netpbm_header(payload)
    if width <= 0 or height <= 0 or not 0 < maxval <= 255:
        raise ValueError("bad netpbm dimensions")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    pixels = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=off)
    if pixels.size < n:
        raise ValueError("truncated pixel data")
    pixels = pixels[:n]
    return {
        "format": "ppm" if magic == b"P6" else "pgm",
        "width": width,
        "height": height,
        "channels": channels,
        "sample_rate": None,
        "mean_value": float(pixels.mean()),
    }


def parse_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE container: chunk walk + 16-bit sample stats.

    Returns format/channels/sample_rate/mean_value (mean absolute
    amplitude); raises ValueError on malformed chunks or non-PCM-16
    encodings.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1 or bits != 16:
        raise ValueError("only PCM-16 supported")
    samples = np.frombuffer(
        data[: len(data) - (len(data) % 2)], dtype="<i2"
    )
    if samples.size == 0:
        raise ValueError("empty data chunk")
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "channels": int(n_channels),
        "sample_rate": int(sample_rate),
        "mean_value": float(np.abs(samples.astype(np.int32)).mean()),
    }


_UNKNOWN = {
    "format": "unknown",
    "width": None,
    "height": None,
    "channels": None,
    "sample_rate": None,
    "mean_value": None,
}


def _decode_one(payload: bytes | None) -> dict:
    """Dispatch on magic bytes; malformed/unsupported → metadata-only."""
    if payload is None:
        return _UNKNOWN
    try:
        if payload[:2] in (b"P5", b"P6"):
            return parse_ppm(payload)
        if payload[:4] == b"RIFF":
            return parse_wav(payload)
    except ValueError:
        pass
    return _UNKNOWN


def decode_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched media decode: mapInPandas over binary payloads.

    Each pandas batch decodes in one Python call per batch, not per row;
    partition count (hence decode parallelism) follows the input's
    partitioning. Corrupt payloads degrade to ``format='unknown'`` rows
    rather than failing the task — at 100 TB some blobs WILL be bad, and
    a quarantine filter on ``format`` beats a dead job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [
                        len(p) if p is not None else 0
                        for p in pdf[payload_col]
                    ],
                    "content_md5": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf[payload_col]
                    ],
                    "format": [m["format"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [m["channels"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "mean_value": pd.array(
                        [m["mean_value"] for m in metas], dtype="float64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_SCHEMA)



# ---------------------------------------------------------------------------
# Deterministic media synthesis — the harness's object store
# ---------------------------------------------------------------------------


def _synth_payload(doc_id: int, text: str | None) -> bytes:
    """Deterministic media payload for a document: P6 / P5 / WAV round-
    robin by id, content bytes tiled from md5(text) so every engine and
    every partitioning builds bit-identical media.
    """
    seed = hashlib.md5((text or "").encode("utf-8")).digest()
    kind = doc_id % 3
    if kind == 2:  # PCM-16 WAV, one channel
        n = 64 + doc_id % 64
        samples = np.frombuffer(
            (seed * ((2 * n) // len(seed) + 1))[: 2 * n], dtype="<i2"
        )
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
    width, height = 4 + doc_id % 5, 3 + doc_id % 4
    channels = 3 if kind == 1 else 1
    n = width * height * channels
    pixels = (seed * (n // len(seed) + 1))[:n]
    magic = b"P6" if kind == 1 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach a deterministic binary media payload per row (mapInPandas).

    Stand-in for the object-store read of a real pipeline; downstream
    operators see exactly what they would see in production — opaque
    bytes in a ``payload`` column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        _synth_payload(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def frame_sample_plan(
    df: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame-sampling *plan*: expand each media row into the frame
    indices a decoder should materialize (every ``every_n``-th frame).

    The expansion is a native ``sequence``/``explode`` — the expensive
    per-frame decode then runs on the exploded rows with natural
    parallelism instead of one task per video (the skew killer for
    long videos).
    """
    # zero-/NULL-frame media contribute no rows: an unguarded
    # sequence(0, -1, +step) throws 'illegal sequence boundaries' and
    # kills the job on one corrupt metadata row (the module's policy is
    # degrade-don't-error)
    idx = F.explode(
        F.when(
            F.col(n_frames_col) > 0,
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
        )
    ).alias("frame_idx")
    return df.select(F.col(id_col), idx)
