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
    "etl_lala_spark.plans.stream_twins",
    "etl_lala_spark.plans.lifecycle",
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

# Round 5 window: after CORRECTNESS_r04 every oracle-backed query ever
# driver-checked is green and exactly 5 queries (registered late in r4)
# have never had a driver row — they are pinned first so this round closes
# the gap to 203/203 checked. The remaining pins are the highest-value
# re-checks: the 24 TPC-H join shapes (the core relational surface; q1 is
# the flagship `entry()`). The window is deliberately SHORTER than the
# driver's 50-row cap: new round-5 registrations auto-sort into the
# remaining slots (tier 1 below), then the rows-only approximate queries
# get fresh ran-rows (tier 2), then greens rotate in registration order.
_DRIVER_WINDOW = [
    # Never driver-checked (registered after the r4 window filled) — the
    # whole point of the round-5 rotation. Must stay in front.
    "drift_psi_price", "drift_psi_orderstatus", "versioned_table_lifecycle",
    "multimodal_avi_frames", "stream_twin_versioned_ingest",
    # High-value re-checks: the full TPC-H join surface.
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q11_true_grain",
    "q12_shipping_delay", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_parts_supplier_relationship", "q16_true_grain",
    "q17_small_quantity", "q18_large_volume_customers",
    "q19_disjunctive_predicates", "q20_potential_promotion",
    "q21_suppliers_kept_waiting", "q22_sales_opportunity",
]


def _correctness_records() -> tuple[set[str], set[str]]:
    """(checked, green): names with ANY row / with an all-green row in any
    CORRECTNESS_r*.json this repo has accumulated (the driver's hard
    verification record)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    checked: set[str] = set()
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            checked.add(name)
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return checked, green


def _driver_green_names() -> set[str]:
    return _correctness_records()[1]


def all_queries() -> dict[str, Query]:
    _load_all()
    checked, green = _correctness_records()
    pri = {n: i for i, n in enumerate(_DRIVER_WINDOW)}
    reg_pos = {n: i for i, n in enumerate(_REGISTRY)}

    def key(name: str):
        # Tier 0: the explicitly pinned window (may include re-checks).
        # Tier 1: never driver-checked — a freshly registered query can
        #         NEVER silently fall outside the driver's 50-row cap as
        #         long as the pinned window leaves it a slot.
        # Tier 2: checked but not hash-green (rows-only approximates and
        #         any red awaiting retry) — re-run before greens.
        # Tier 3: already green — rotate last, in registration order.
        if name in pri:
            return (0, pri[name])
        if name not in checked:
            return (1, reg_pos[name])
        if name not in green:
            return (2, reg_pos[name])
        return (3, reg_pos[name])

    return {n: _REGISTRY[n] for n in sorted(_REGISTRY, key=key)}


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
