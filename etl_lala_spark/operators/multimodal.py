"""Multimodal column plumbing (north star: image/audio/video at 100 TB).

Media are opaque ``binary`` columns plus typed metadata structs; the heavy
decode/feature steps run as Arrow-batched pandas over ``mapInPandas`` so each
task streams batches without materializing a partition. The actual codec
calls (PIL/ffmpeg/torchaudio) are NOT available in this environment, so the
decode kernel is pluggable: the default is a clearly-marked deterministic
fake (metadata derived from the byte stream itself), and ``decode_image``
raises NotImplementedError — the Spark-side plumbing (schema, batching,
partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media binary, mime string, n_bytes int"
DECODED_SCHEMA = "doc_id long, n_bytes int, width int, height int, n_channels int, digest string"


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque media column (utf-8 bytes of the text stand in
    for image/audio payloads) + typed metadata — the binaryFile-source shape
    (path/bytes/mime) without needing binary fixtures on disk."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.when(F.substring(text_col, 1, 1) == "{", F.lit("application/json"))
        .otherwise(F.lit("text/plain"))
        .alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def decode_image(data: bytes) -> tuple[int, int, int]:
    """Real image decode — requires an image codec library.

    STUB: PIL/opencv are not installed in this environment. The Spark
    plumbing calls ``fake_decode`` instead; swap this in when a codec is
    available.
    """
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode"
    )


def fake_decode(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: metadata derived from byte length
    (so the full pipeline is testable and oracle-able end to end)."""
    n = len(data)
    return (n % 640, n % 480, 3)


def decode_media(df: DataFrame, kernel=fake_decode) -> DataFrame:
    """Arrow-batched decode over mapInPandas: batches stream through each
    task (constant memory — the reference's T1 requirement), the kernel runs
    per value inside the batch, and output is a typed DataFrame.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["media"].map(kernel)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int32"),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "n_channels": meta.map(lambda m: m[2]).astype("int32"),
                    "digest": pdf["media"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque media: emit one row per sampled offset
    (stand-in for video frame extraction — one-to-many expansion, the S6
    archive-expansion shape). JVM-side: sequence + explode, no Python."""
    return df.select(
        "doc_id",
        "n_bytes",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )
