"""Catalog / manifest discovery as DataFrames (reference S1-S4, P1-P6).

The reference POSTs a 6-dimension filter to the DATASUS catalog per month in
a sequential Bull-job loop (src/datasus/datasus.service.ts:98-158), then
resolves each descriptor to a ZIP URL with a regex over the response
(:160-213). Here the whole discovery plane is a declarative DataFrame:
dimension tables crossed with a month sequence, filtered with pushed-down
predicates, projected with trim/not-empty guards. At 100 TB the manifest is
still metadata-sized — thousands of file descriptors — so it stays
broadcast-able by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lala_spark.io import tiny_df

URL_RE = r'https?://[^"\s\]]+\.zip'

# Control-plane dimensions (reference enums, src/datasus/datasus-arquivo.type.ts:
# 1-146). The reference ships 89 file types across 14 fontes and 3 UFs; the
# default here is a representative subset — callers pass their own dimensions
# for the full surface. Note the reference's FonteType has two wrong literals
# (SINAN/SINASC at :133-134) which we deliberately do not replicate.
DEFAULT_TIPOS = (("PA", "SIASUS"), ("PS", "SIASUS"), ("RD", "SIHSUS"))
DEFAULT_UFS = ("AL", "PE", "PB")


def competence_months(
    spark: SparkSession, anchor: str, n_months: int = 12
) -> DataFrame:
    """Rolling month dimension, one row per competência (reference S2,
    src/datasus/datasus.service.ts:73-97). Returns column ``m`` (date).

    Single-partition on purpose: this is a metadata-sized dimension, and a
    multi-partition seed would multiply through the catalog cross join into
    partitions² scheduling overhead (32×32 = 1024 tasks for 72 rows)."""
    return spark.range(1, numPartitions=1).select(
        F.explode(
            F.sequence(
                F.add_months(F.lit(anchor).cast("date"), -(n_months - 1)),
                F.lit(anchor).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("m")
    )


def build_catalog(
    spark: SparkSession,
    anchor: str,
    n_months: int = 12,
    tipos: tuple[tuple[str, str], ...] = DEFAULT_TIPOS,
    ufs: tuple[str, ...] = DEFAULT_UFS,
) -> DataFrame:
    """Cross the file-type/fonte × UF × competência dimensions into the raw
    catalog of file descriptors with DATASUS-style names ({TYPE}{UF}{YYMM})
    and a download-responder string (stand-in for the remote catalog's
    response body, which S4 regexes the ZIP link out of)."""
    # VALUES-backed LocalRelations (io.tiny_df): RDD-backed createDataFrame
    # dimensions make the CartesianProduct execute partition-product tasks
    # and block constant folding — measured ~13 s vs ~0.2 s for this 3×3.
    tipos_df = tiny_df(spark, list(tipos), "tipo string, fonte string")
    ufs_df = tiny_df(spark, [(u,) for u in ufs], "uf string")
    meses = competence_months(spark, anchor, n_months)
    yymm = F.date_format("m", "yyMM")
    arquivo = F.concat(F.col("tipo"), F.col("uf"), yymm)
    return (
        tipos_df.crossJoin(ufs_df)
        .crossJoin(meses)
        .select(
            "tipo",
            "fonte",
            "uf",
            F.date_format("m", "yyyyMM").alias("competencia"),
            arquivo.alias("arquivo"),
            F.concat(
                F.lit("/dissemin/publicos/"), F.col("fonte"), F.lit("/"), arquivo, F.lit(".dbc")
            ).alias("endereco"),
            F.concat(
                F.lit("resp: https://datasus.gov.br/download/"), arquivo, F.lit(".zip ok")
            ).alias("resposta"),
        )
    )


def build_catalog_manifest(
    spark: SparkSession,
    anchor: str,
    n_months: int = 12,
    fonte: str = "SIASUS",
    ufs_filter: tuple[str, ...] = ("PE", "AL"),
) -> DataFrame:
    """Filtered + projected manifest (S1 pushdown, P1 trim/not-empty, S4 link
    regex, P5 basename/strip-extension). The filter sits directly on the
    dimension cross join so Catalyst prunes partitions before any fan-out."""
    cat = build_catalog(spark, anchor, n_months)
    return (
        cat.filter(
            (F.col("fonte") == fonte)
            & F.col("uf").isin(*ufs_filter)
            & F.col("arquivo").isNotNull()
            & (F.trim(F.col("arquivo")) != "")
        )
        .select(
            "arquivo",
            "fonte",
            "uf",
            "competencia",
            F.trim("endereco").alias("endereco"),
            F.regexp_extract("resposta", URL_RE, 0).alias("link"),
            F.regexp_replace("arquivo", r"\.[^/.]+$", "").alias("nome_sem_ext"),
            F.regexp_extract("endereco", r"[^/]+$", 0).alias("basename"),
        )
        .orderBy("arquivo")
    )


def parse_datasus_filename(df: DataFrame, col: str = "arquivo") -> DataFrame:
    """Split a {TYPE}{UF}{YYMM} DATASUS file name into typed provenance
    columns (the inverse of build_catalog's name construction; the reference
    does this implicitly by carrying the descriptor through the job payload,
    src/datasus/datasus.processor.ts:12-21)."""
    c = F.col(col)
    return df.withColumns(
        {
            "tipo_parsed": F.regexp_extract(c, r"^([A-Z]+?)([A-Z]{2})(\d{4})", 1),
            "uf_parsed": F.regexp_extract(c, r"^([A-Z]+?)([A-Z]{2})(\d{4})", 2),
            "yymm_parsed": F.regexp_extract(c, r"^([A-Z]+?)([A-Z]{2})(\d{4})", 3),
        }
    )
