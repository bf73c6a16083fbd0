"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the lake stores media as opaque
``binary`` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — media bytes never pass through
row-at-a-time Python, and each task decodes only its partition's
batches.

The actual codec step is STUBBED here (Pillow/ffmpeg are not available
in this environment): ``decode_image_meta`` derives a deterministic fake
(width, height, channels) from the payload's md5 so the Spark-side
plumbing — schema, batch shape, partitioning, UDF signature — is real
and testable end-to-end. Swap ``_fake_decode`` for a real codec to go to
production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the (stubbed) image decode stage.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
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


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image codec.

    Derives (width, height, channels) from the content hash. A real
    deployment replaces this single function with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — the mapInPandas contract
    is unchanged.
    """
    if payload is None:
        raise NotImplementedError("real codec required for NULL-tolerant decode")
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 4
    return width, height, channels


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched (stub) decode: mapInPandas over binary payloads.

    Each pandas batch decodes vectorized-ish in one Python call per
    batch, not per row; partition count (hence decode parallelism)
    follows the input's partitioning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(len),
                    "content_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "channels": dims.map(lambda d: d[2]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_SCHEMA)


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
    idx = F.explode(
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
    ).alias("frame_idx")
    return df.select(F.col(id_col), idx)
