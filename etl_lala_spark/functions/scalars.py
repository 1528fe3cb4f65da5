"""Named scalar functions for the DATASUS/ETL domain (reference §2.8).

Each cites the hand-rolled TypeScript it replaces; all are JVM built-ins
(codegen'd — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZIP_URL_RE = r'https?://[^"\s\]]+\.zip'


def competencia(date_col: Column) -> Column:
    """YYYYMM competência string (reference month formatting with
    padStart(2,'0'), src/datasus/datasus.service.ts:75,87)."""
    return F.date_format(date_col, "yyyyMM")


def mes_ano(date_col: Column) -> tuple[Column, Column]:
    """(mes '01'..'12', ano) pair — the reference's {mes, ano} DTO fields."""
    return F.lpad(F.month(date_col).cast("string"), 2, "0"), F.year(date_col)


def basename(path: Column) -> Column:
    """Final path segment (reference path.basename, src/datasus/datasus.service.ts:403)."""
    return F.regexp_extract(path, r"[^/]+$", 0)


def strip_extension(name: Column) -> Column:
    """Drop the trailing extension (reference regex replace, :323-324)."""
    return F.regexp_replace(name, r"\.[^/.]+$", "")


def extract_zip_url(resp: Column) -> Column:
    """First ZIP URL in a response body (reference regex fallback, :204-205)."""
    return F.regexp_extract(resp, ZIP_URL_RE, 0)


def bytes_to_mb(n: Column, digits: int = 2) -> Column:
    """Bytes → MB with fixed decimals (reference toFixed(2) MB logging, :267)."""
    return F.round(n / F.lit(1048576), digits)


def pseudonymize(col: Column, pepper: str) -> Column:
    """Deterministic keyed pseudonymization of a PII column: sha2-256 over a
    peppered value. Same input → same token, so equality joins, groupBys,
    and distinct-counts over the pseudonymized column still work (the
    GDPR-pipeline property that plain redaction destroys); without the
    pepper the token is not reversible by rainbow lookup. Pure codegen —
    pseudonymizing 100 TB costs one scan."""
    return F.sha2(F.concat(F.lit(pepper + "::"), col.cast("string")), 256)
