"""Scalar function surface (reference §2.8) — thin, named wrappers over
``pyspark.sql.functions`` so pipelines read in the domain's vocabulary."""

from etl_lala_spark.functions.scalars import (  # noqa: F401
    basename,
    bytes_to_mb,
    competencia,
    extract_zip_url,
    mes_ano,
    strip_extension,
)
