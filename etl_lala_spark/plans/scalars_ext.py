"""Extended scalar/aggregate surface: array & map builders, exact
percentiles, date arithmetic (SURVEY.md §2.8/§2.12 completion).

Determinism notes: collect_list order is execution-dependent → always wrapped
in sort_array before comparison; day-of-week numbering differs across engines
→ expressed via a shared ISO formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lala_spark.io import load_table
from etl_lala_spark.plans import register


@register(
    "array_functions",
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses,
       CAST(len(list_distinct(list(o_orderstatus))) AS INT) AS n_distinct_status,
       CAST(len(list(o_orderstatus)) AS INT) AS n_orders
FROM orders
WHERE o_custkey <= 50
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + sort/distinct/join (collect_list wrapped in
    sort_array for determinism)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("o_orderstatus")), ",").alias("statuses"),
            F.size(F.array_distinct(F.collect_list("o_orderstatus"))).alias(
                "n_distinct_status"
            ),
            F.size(F.collect_list("o_orderstatus")).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "map_functions",
    oracle="""
WITH per_status AS (
  SELECT o_custkey, o_orderstatus, count(*) AS n
  FROM orders WHERE o_custkey <= 50
  GROUP BY o_custkey, o_orderstatus
)
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderstatus || ':' || n)), ',') AS status_counts
FROM per_status
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-shaped aggregation rendered as sorted entries (map iteration
    order is unspecified in both engines, so entries are serialized sorted —
    same information, deterministic bytes)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    per_status = o.groupBy("o_custkey", "o_orderstatus").agg(F.count("*").alias("n"))
    return (
        per_status.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.concat("o_orderstatus", F.lit(":"), F.col("n")))
                ),
                ",",
            ).alias("status_counts")
        )
        .orderBy("o_custkey")
    )


@register(
    "exact_percentiles",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       round(min(o_totalprice), 2) AS pmin,
       round(max(o_totalprice), 2) AS pmax
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). The approximate variant (approx_percentile/KLL) is the
    100 TB path but is algorithm-specific → covered rows-only elsewhere."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
            F.round(F.min("o_totalprice"), 2).alias("pmin"),
            F.round(F.max("o_totalprice"), 2).alias("pmax"),
        )
        .orderBy("o_orderstatus")
    )


@register("approx_aggs", doc="rows-only: sketch-based approximate aggregates")
def approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB interactive profiling:
    approx_count_distinct (HLL++) and approx_percentile — algorithm-specific
    results, so no cross-engine oracle; pytest bounds the relative error."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("approx_p50"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "date_arithmetic",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_95,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
""",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic parity: datediff, add_months, last_day, trunc,
    ISO day-of-week (dayofweek numbering differs across engines; ISO form is
    portable)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_epoch_95"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "quarter"), "yyyy-MM-dd").alias("quarter_start"),
        F.dayofweek(F.date_sub(d, 1)).alias("iso_dow"),
    ).orderBy("o_orderkey")
