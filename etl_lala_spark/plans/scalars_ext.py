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


@register(
    "stats_aggs",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4)                 AS qty_stddev,
       round(var_samp(l_quantity), 4)                    AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
       round(covar_samp(l_discount, l_tax), 8)           AS disc_tax_covar,
       round(CAST(median(l_extendedprice) AS DOUBLE), 4) AS price_median,
       round(min(l_extendedprice), 2)                    AS price_min,
       round(max(l_extendedprice), 2)                    AS price_max
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/correlation/covariance/
    median (absent in the reference — its only moments are sum/avg/max,
    src/scripts/run-etl.ts:26-54; SURVEY.md §2.12 completion). All JVM
    built-ins with partial+final hash aggregation; median is the exact
    percentile path (the 100 TB variant is approx_percentile, covered in
    approx_aggs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
            F.round(F.median("l_extendedprice").cast("double"), 4).alias("price_median"),
            F.round(F.min("l_extendedprice"), 2).alias("price_min"),
            F.round(F.max("l_extendedprice"), 2).alias("price_max"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "text_edit_distance",
    oracle="""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS edit_dist,
       CAST(abs(len(a.text) - len(b.text)) AS INT) AS len_diff
FROM documents a
JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id < 100
ORDER BY doc_a
""",
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive documents (JVM built-in;
    the character-level companion to the token-level Jaccard dedup path).
    Distance is computed on 40-char prefixes — the production guard against
    O(len²) blowup on long documents."""
    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(
                F.substring("text_a", 1, 40), F.substring("text_b", 1, 40)
            ).alias("edit_dist"),
            F.abs(F.length("text_a") - F.length("text_b")).cast("int").alias("len_diff"),
        )
        .orderBy("doc_a")
    )


@register(
    "encoding_functions",
    oracle="""
SELECT doc_id,
       base64(encode(substr(text, 1, 24)))       AS b64,
       decode(from_base64(base64(encode(substr(text, 1, 24))))) AS roundtrip,
       hex(encode(substr(lang, 1, 2)))           AS lang_hex,
       md5(text)                                 AS content_md5,
       CAST(sha256(text) IS NOT NULL AS BOOLEAN) AS has_sha
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
)
def encoding_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding scalar surface: base64/unbase64 round trip (reference decodes
    base64 queue payloads, src/datasus/datasus.processor.ts:52-53), hex,
    md5/sha2 content digests (charset decode per
    OTIMIZACAO_API_PYTHON.md:202)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    prefix = F.substring("text", 1, 24)
    b64 = F.base64(F.encode(prefix, "UTF-8"))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.decode(F.unbase64(b64), "UTF-8").alias("roundtrip"),
        F.hex(F.encode(F.substring("lang", 1, 2), "UTF-8")).alias("lang_hex"),
        F.md5(F.col("text")).alias("content_md5"),
        F.sha2(F.col("text"), 256).isNotNull().alias("has_sha"),
    ).orderBy("doc_id")


@register(
    "null_semantics",
    oracle="""
SELECT o_orderkey,
       coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN')          AS status_or_open,
       CAST(o_orderstatus IS NOT DISTINCT FROM 'P' AS BOOLEAN) AS nullsafe_is_p,
       ifnull(NULLIF(o_orderpriority, o_orderpriority), 'same') AS always_same,
       CASE WHEN o_totalprice > 100000 THEN 'high'
            WHEN o_totalprice > 10000 THEN 'mid'
            ELSE 'low' END                                    AS price_band
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
""",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: nullif/coalesce/ifnull, null-safe equality
    (`<=>` / IS NOT DISTINCT FROM), and multi-branch CASE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.col("o_orderstatus").eqNullSafe("P").alias("nullsafe_is_p"),
        F.ifnull(
            F.nullif("o_orderpriority", F.col("o_orderpriority")), F.lit("same")
        ).alias("always_same"),
        F.when(F.col("o_totalprice") > 100000, "high")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
    ).orderBy("o_orderkey")


@register(
    "events_distinct_rollup_hll",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS BOOLEAN) AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_distinct_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting (DataSketches HLL): build one
    user-id sketch PER DAY with ``hll_sketch_agg``, then merge the daily
    sketches with ``hll_union_agg`` for per-type totals — distinct counts
    roll up without ever touching raw keys twice.

    This is the 100 TB pattern plain ``countDistinct`` can't offer: daily
    sketches are small (~KB), persistable next to the partition, and any
    ad-hoc date range is answered by unioning sketches instead of
    re-scanning the fact table. The sketch estimate itself is
    algorithm-specific, so the oracle pins the exact side instead: per
    type, the day count, the EXACT distinct-user count (computed
    alongside, one extra aggregate), and ``approx_ok`` — the merged
    sketch's estimate must land within 5% of exact (lgK=12 HLL carries
    ~1.6% standard error; 5% is > 3 σ, so a drifting union or a sketch
    built on the wrong column crosses immediately)."""
    from etl_lala_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    # the exact side: its own partial-aggregated scan (never a collected
    # key set — exactness must not cost per-group key hoarding)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "higher_order_arrays",
    oracle="""
WITH arrs AS (
  SELECT o_custkey, list_sort(list(round(o_totalprice, 2))) AS prices
  FROM orders WHERE o_custkey <= 50
  GROUP BY o_custkey
)
SELECT o_custkey,
       round(list_sum(list_transform(prices, p -> p * 0.9)) + 0, 2) AS discounted_total,
       len(list_filter(prices, p -> p > 150000)) AS n_large,
       round(list_reduce(prices, (a, b) -> CASE WHEN b > a THEN b ELSE a END) + 0, 2)
         AS max_via_reduce
FROM arrs
ORDER BY o_custkey
""",
)
def higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — ``transform``/``filter``/``aggregate``
    lambdas run INSIDE codegen on the JVM (SURVEY §2.12 scalar surface), the
    idiomatic replacement for per-row Python when values are nested. The
    DuckDB oracle mirrors each lambda with list_transform/list_filter/
    list_reduce over identically sorted arrays."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    arrs = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list(F.round("o_totalprice", 2))).alias("prices")
    )
    zero = F.lit(0.0)
    return arrs.select(
        "o_custkey",
        F.round(
            F.aggregate(
                F.transform("prices", lambda p: p * 0.9), zero, lambda a, b: a + b
            )
            + zero,
            2,
        ).alias("discounted_total"),
        F.size(F.filter("prices", lambda p: p > 150000)).alias("n_large"),
        F.round(
            F.aggregate(
                "prices", F.lit(float("-inf")), lambda a, b: F.greatest(a, b)
            )
            + zero,
            2,
        ).alias("max_via_reduce"),
    ).orderBy("o_custkey")


@register(
    "ansi_safe_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity - l_quantity = 0 THEN NULL
            ELSE l_extendedprice / (l_quantity - l_quantity) END AS div_by_zero,
       round(l_extendedprice / l_quantity, 4) AS unit_price,
       TRY_CAST(l_returnflag AS INTEGER) AS bad_cast
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
""",
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs in ANSI mode, where division by zero and invalid casts
    are runtime ERRORS; the ``try_*`` family turns them into NULLs — the
    expression-level form of the reference's structured error handling (R5):
    bad values degrade to NULL rows instead of failing a 100 TB job.
    DuckDB mirrors with CASE guards and TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.round(F.try_divide("l_extendedprice", "l_quantity"), 4).alias("unit_price"),
        F.expr("try_cast(l_returnflag AS INT)").alias("bad_cast"),
    ).orderBy("l_orderkey", "l_linenumber")
