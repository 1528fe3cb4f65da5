"""Window-function surface (SURVEY.md §2.5/§2.12 — absent in the reference,
whose only positional computation is per-50k progress logging,
NDJSON_IMPLEMENTADO.md:113-117; and the keep-N-most-recent retention O3).

Every window carries a total ordering (explicit tiebreak columns) so results
are deterministic and hash-comparable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_lala_spark.io import load_table
from etl_lala_spark.plans import register


@register(
    "window_topk_per_customer",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (reference O3 keep-N-most-
    recent, ESTRUTURA_DADOS_PROCESSADOS.md:236-239, done relationally)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_orderkey, l_linenumber
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over a fully ordered rows frame."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS price,
       round(lag(o_totalprice)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
FROM orders
WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics with null-coalesced deltas."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice")),
            2,
        ).alias("delta"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_rank_ntile",
    oracle="""
SELECT c_custkey, c_mktsegment,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rnk, c_custkey
""",
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("c_mktsegment", "rnk", "c_custkey")


@register(
    "window_range_frame",
    oracle="""
SELECT s_suppkey, s_acctbal,
       count(*) OVER (ORDER BY s_acctbal
                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500
FROM supplier
ORDER BY s_acctbal, s_suppkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering (value-based window).

    Scale note: the frame is GLOBAL (no partition key), so Spark computes
    it in one task — correct here because the windowed relation is a
    dimension-sized table, and the frame scan itself is linear
    (two-pointer). On a fact-sized input the same metric graduates to
    range partitioning: ``repartitionByRange`` on the order key, the
    identical in-partition two-pointer pass, plus one exchange of each
    partition's 500-wide boundary strip to its successor — the standard
    distributed value-window decomposition (see SCALE.md)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal").rangeBetween(-500, W.currentRow)
    return s.select(
        "s_suppkey", "s_acctbal", F.count("*").over(w).alias("n_within_500")
    ).orderBy("s_acctbal", "s_suppkey")


@register(
    "window_analytics_ext",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER w, 6)  AS pct_rank,
       round(cume_dist() OVER w, 6)     AS cume,
       first_value(o_orderkey) OVER w   AS first_ok,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_analytics_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window completion: percent_rank / cume_dist / first_value /
    last_value / nth_value with explicit unbounded frames (last/nth need the
    full-partition frame on both engines to be deterministic)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wf).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_ok"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_percent_of_total",
    oracle="""
WITH per_nation AS (
  SELECT n.n_name, round(sum(c.c_acctbal), 2) AS acctbal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, acctbal,
       round(acctbal / sum(acctbal) OVER (), 6) AS share,
       round(sum(acctbal) OVER (ORDER BY acctbal DESC, n_name)
             / sum(acctbal) OVER (), 6) AS cum_share
FROM per_nation
ORDER BY acctbal DESC, n_name
""",
)
def window_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total and cumulative share (ratio_to_report / Pareto
    analysis): an empty-frame window sum against the grand total plus a
    running share over the descending order. The unpartitioned windows act
    on the small AGGREGATED relation (one row per nation), not the fact
    table — the correct place for a global window at scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("acctbal"))
    )
    total = W.partitionBy()
    running = W.partitionBy().orderBy(F.col("acctbal").desc(), "n_name")
    return per_nation.select(
        "n_name",
        "acctbal",
        F.round(F.col("acctbal") / F.sum("acctbal").over(total), 6).alias("share"),
        F.round(
            F.sum("acctbal").over(running) / F.sum("acctbal").over(total), 6
        ).alias("cum_share"),
    ).orderBy(F.col("acctbal").desc(), "n_name")


_ROLLING_HOUR_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
         AS hour_value
FROM events
ORDER BY event_id
"""


@register("window_interval_range_frame", oracle=_ROLLING_HOUR_SQL)
def window_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval RANGE frame on a timestamp ordering: each event's
    trailing-one-hour value total per user — the time-windowed running
    metric (rolling spend, rate limiting) that rows-frames can't express
    when events are irregularly spaced. The SAME SQL text runs on DuckDB;
    both engines order by µs-precision timestamps, so frame boundaries
    agree exactly. One shuffle on user_id; the frame scan is linear
    (two-pointer) per partition, not quadratic."""
    from etl_lala_spark.io import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_ROLLING_HOUR_SQL)
