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
    """Full pixel decode — requires an image codec library.

    STUB: PIL/opencv are not installed in this environment. Header-level
    metadata (dimensions, channels, sample rate) needs NO codec — see
    ``sniff_media`` below, which parses PNG/JPEG/GIF/WAV headers in pure
    Python. Swap this in when a pixel codec is available.
    """
    raise NotImplementedError(
        "pixel codecs unavailable in this environment; use sniff_media for "
        "header metadata or fake_decode for the deterministic stand-in"
    )


def sniff_media(data: bytes) -> tuple[str, int, int, int]:
    """Pure-Python media header sniffing: (kind, width, height, channels)
    for PNG / JPEG / GIF images and (kind, sample_rate, n_channels,
    bits_per_sample) for WAV audio — real metadata extraction with no
    third-party codec, which is all the manifest/partitioning plane of a
    100 TB media pipeline needs (full pixel/sample decode stays pluggable).
    Unknown formats return ("unknown", 0, 0, 0).
    """
    import struct as _struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = _struct.unpack(">II", data[16:24])
        return ("png", w, h, 3)
    if data[:3] == b"GIF" and len(data) >= 10:
        w, h = _struct.unpack("<HH", data[6:10])
        return ("gif", w, h, 3)
    if data[:2] == b"\xff\xd8":  # JPEG: scan for a SOFn marker
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h, data[i + 9])
            i += 2 + seg_len
        return ("jpeg", 0, 0, 0)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) >= 36:
        n_channels, sample_rate = _struct.unpack("<HI", data[22:28])
        bits = _struct.unpack("<H", data[34:36])[0]
        return ("wav", sample_rate, n_channels, bits)
    return ("unknown", 0, 0, 0)


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


SNIFFED_SCHEMA = "doc_id long, kind string, dim1 int, dim2 int, dim3 int"


def sniff_media_df(df: DataFrame) -> DataFrame:
    """Arrow-batched header sniffing over mapInPandas: real (codec-free)
    media metadata per row — (kind, width, height, channels) for images,
    (kind, sample_rate, n_channels, bits) for WAV. Input needs (doc_id,
    media binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sniffed = pdf["media"].map(lambda b: sniff_media(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": sniffed.map(lambda s: s[0]),
                    "dim1": sniffed.map(lambda s: s[1]).astype("int32"),
                    "dim2": sniffed.map(lambda s: s[2]).astype("int32"),
                    "dim3": sniffed.map(lambda s: s[3]).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=SNIFFED_SCHEMA)


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


def sniff_media_df_arrow(df: DataFrame) -> DataFrame:
    """``mapInArrow`` variant of ``sniff_media_df``: RecordBatches pass
    straight from the JVM into pyarrow with zero pandas conversion, so the
    binary column is touched as Arrow buffers, never boxed into Python
    object Series — the preferred boundary when rows carry MB-sized media
    blobs. Same output schema/semantics as the pandas form (agreement is
    pytest-enforced)."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            media = rb.column(rb.schema.get_field_index("media"))
            sniffed = [sniff_media(b.as_py()) for b in media]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("doc_id")),
                    pa.array([s[0] for s in sniffed], pa.string()),
                    pa.array([s[1] for s in sniffed], pa.int32()),
                    pa.array([s[2] for s in sniffed], pa.int32()),
                    pa.array([s[3] for s in sniffed], pa.int32()),
                ],
                names=["doc_id", "kind", "dim1", "dim2", "dim3"],
            )

    return df.mapInArrow(batches, schema=SNIFFED_SCHEMA)
