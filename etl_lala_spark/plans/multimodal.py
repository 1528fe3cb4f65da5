"""Multimodal-column queries (north star: binary media columns).

The fixture corpus has no real image/audio bytes, so utf-8 text bytes stand
in as the opaque payload; what is verified is the Spark-side plumbing —
binary columns, Arrow-batched mapInPandas decode, one-to-many frame
expansion — with metadata derived deterministically from the bytes so the
DuckDB oracle can replay it from the varchar side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lala_spark.io import load_table
from etl_lala_spark.operators import multimodal as mm
from etl_lala_spark.plans import register


@register(
    "multimodal_binary_stats",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       md5(text) AS digest,
       CASE WHEN left(text, 1) = '{' THEN 'application/json' ELSE 'text/plain' END AS mime
FROM documents
ORDER BY doc_id
""",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata: byte length, content digest,
    mime sniff (binaryFile-source shape, SURVEY.md §2.12)."""
    d = load_table(spark, sf_dir, "documents")
    media = mm.attach_binary(d)
    return media.select(
        "doc_id",
        "n_bytes",
        F.md5("media").alias("digest"),
        "mime",
    ).orderBy("doc_id")


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       CAST(strlen(text) % 640 AS INT) AS width,
       CAST(strlen(text) % 480 AS INT) AS height,
       3 AS n_channels,
       md5(text) AS digest
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media decode via mapInPandas (deterministic fake kernel
    — real codecs are stubbed, operators/multimodal.py). Verifies the whole
    Python-batch boundary: schema, Arrow transfer, per-batch kernel."""
    d = load_table(spark, sf_dir, "documents")
    decoded = mm.decode_media(mm.attach_binary(d))
    return decoded.select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.lit(3).alias("n_channels"),
        "digest",
    ).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id, count(*) AS n_frames, CAST(max(off) AS BIGINT) AS last_offset
FROM (
  SELECT doc_id, unnest(range(0, greatest(strlen(text) - 1, 0) + 1, 64)) AS off
  FROM documents
)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling over media bytes (explode — the archive-
    expansion S6 shape applied to video-style payloads)."""
    d = load_table(spark, sf_dir, "documents")
    frames = mm.frame_sample(mm.attach_binary(d))
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("frame_offset").cast("long").alias("last_offset"),
        )
        .orderBy("doc_id")
    )
