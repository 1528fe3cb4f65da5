"""Named-query registry: the engine's public query surface.

Every operator from SURVEY.md §2 (and the LLM-data-pipeline additions) is
exposed as a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus —
whenever the semantics are ANSI-SQL-expressible — an equivalent DuckDB SQL
string used as a correctness oracle. ``__spark_entry__`` re-exports this
registry to the verification driver.

Register with::

    @register("q1_pricing_summary", oracle="SELECT ...")
    def q1(spark: SparkSession, sf_dir: str) -> DataFrame: ...

Column-name discipline: the driver's comparison sorts columns by name before
hashing values, so every computed column MUST carry the same alias in the
Spark plan and in the oracle SQL. Float discipline: double aggregates are
rounded (round(x, 2..6)) identically on both sides so independent summation
orders hash-match.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Submodules that populate the registry on import.
_PLAN_MODULES = (
    "etl_lala_spark.plans.relational",
    "etl_lala_spark.plans.tpch_ext",
    "etl_lala_spark.plans.advanced",
    "etl_lala_spark.plans.scalars_ext",
    "etl_lala_spark.plans.windows",
    "etl_lala_spark.plans.datasus",
    "etl_lala_spark.plans.events",
    "etl_lala_spark.plans.llm_text",
    "etl_lala_spark.plans.llm_dedup",
    "etl_lala_spark.plans.llm_similarity",
    "etl_lala_spark.plans.multimodal",
    "etl_lala_spark.plans.audits",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator adding a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


# --- Driver-rotation ordering -------------------------------------------------
#
# The verification driver materializes a CORRECTNESS row for the FIRST 50
# registered oracle-backed queries each round. With 150+ oracle-backed
# queries, which 50 get the hard driver signal is a choice — so the registry
# is emitted in a rotation order: queries that have NOT yet earned a
# driver-green row come first (the explicitly prioritized window, then the
# backlog in registration order), and queries already verified green by ANY
# previous round's driver run come last. Prior greens are detected
# AUTOMATICALLY from the repo's CORRECTNESS_r*.json files at import time
# (rows_match+schema_match+hash_match all true), so each round the window
# advances over the backlog with no manual list maintenance; a query that
# FAILED a driver round stays in the window for a retry.

# Round 3 window: exactly 50 oracle-backed queries, priority per round-2
# VERDICT — the full events family (event-time windows/watermark parity is a
# §2.12 bar requirement with zero driver rows), the UDF/UDTF surface,
# scalars-ext, multimodal GIF/WAV/sniff, the four remaining audits, the
# embedding_centroids retry (canonicalizer-safe output this round), and the
# remaining window/subquery/SCD2/DQ queries.
_DRIVER_WINDOW = [
    # retry: only red row of r2, now emits a flat string centroid
    "embedding_centroids",
    # events family — tumbling/sliding/session windows, watermark parity,
    # enrichment, anomaly/trend analytics (24 queries incl. behavior topk)
    "events_tumbling_window", "events_sliding_window", "events_sessionization",
    "events_json_props", "events_dedup_exact", "events_tagged_union",
    "events_user_enrichment", "events_gap_detection", "events_resample_minutes",
    "events_session_ids", "events_funnel_conversion", "events_variant_props",
    "events_trending_topk", "events_rate_anomaly", "events_heavy_hitters",
    "events_hourly_active_users", "events_ewma_smoothing",
    "events_seasonal_baseline", "events_peak_concurrency",
    "behavior_similarity_topk",
    # subqueries / advanced relational
    "subquery_scalar_avg", "subquery_correlated", "recursive_cte_chain",
    "join_lateral_topn", "asof_join_cogrouped", "scd2_customer_history",
    "dq_lineitem_expectations", "pseudonymize_customers",
    # UDF / UDAF / UDTF surface
    "udf_pandas_charge", "udaf_pandas_geomean", "udtf_token_positions",
    "udtf_polymorphic_split",
    # scalar-function families still without a driver row
    "date_arithmetic", "encoding_functions", "null_semantics",
    "higher_order_arrays",
    # window-function remainder
    "window_topk_per_customer", "window_running_sum", "window_analytics_ext",
    "window_percent_of_total",
    # multimodal lossless codecs + sniffing
    "multimodal_decode_gif", "multimodal_decode_wav", "multimodal_sniff",
    # audits pairing the remaining iterative/approximate operators
    "audit_bpe_conservation", "audit_jl_distortion", "audit_power_iteration",
    "audit_logistic_training",
    # graph + coreset (plan-audited headline queries without driver rows)
    "graph_triangle_count", "curate_kcenter_coreset",
]


def _driver_green_names() -> set[str]:
    """Names with an all-green row in any CORRECTNESS_r*.json this repo has
    accumulated (the driver's hard verification record)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def all_queries() -> dict[str, Query]:
    _load_all()
    green = _driver_green_names()
    pri = {n: i for i, n in enumerate(_DRIVER_WINDOW)}
    reg_pos = {n: i for i, n in enumerate(_REGISTRY)}

    def key(name: str):
        if name in green:
            return (2, reg_pos[name])
        if name in pri:
            return (0, pri[name])
        return (1, reg_pos[name])

    return {n: _REGISTRY[n] for n in sorted(_REGISTRY, key=key)}


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
