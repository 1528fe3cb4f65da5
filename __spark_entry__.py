"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``etl_lala_spark`` (plans registry); this module
just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from etl_lala_spark.plans import query_fns
    from etl_lala_spark.session import apply_session_confs

    apply_session_confs(spark)
    return query_fns()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star ops."""
    from etl_lala_spark.plans import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; approximate
    operators (MinHash-LSH, SimHash, LSH-ANN) are intentionally omitted →
    rows-only check."""
    from etl_lala_spark.plans import oracle_sqls

    return oracle_sqls()
