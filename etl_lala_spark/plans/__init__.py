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

# Round 2 window: exactly 50 oracle-backed queries, priority per VERDICT.md —
# north-star LLM-pipeline set, the approximate-operator audits, the real-PNG
# decode, core window functions, and the complete datasus plane (incl. DBC).
_DRIVER_WINDOW = [
    # dedup + decontamination
    "dedup_exact", "dedup_exact_summary", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "decontaminate_corpus",
    # similarity / embeddings / retrieval
    "ann_cosine_topk", "hybrid_retrieval_rerank", "embedding_centroids",
    "embedding_quantize_int8",
    # curation pipeline
    "pipeline_training_data", "curate_token_budget", "curate_sequence_packing",
    "curate_source_mixing", "curate_weighted_sample",
    # text analysis
    "text_stats", "text_quality_score", "text_lang_id", "text_fingerprint",
    "text_token_counts", "text_pii_scrub", "text_term_frequencies",
    "text_bm25_retrieval", "text_model_inference", "text_winsorized_lengths",
    "text_repetition_ratio",
    # audits pairing every rows-only approximate/iterative operator
    "audit_ann_lsh", "audit_ann_ivf", "audit_kmeans", "audit_minhash_planted",
    "audit_simhash_planted", "audit_components_planted",
    "audit_semdedup_planted", "audit_pagerank_mass", "audit_hll_error",
    "audit_approx_aggs", "audit_stratified_sample",
    # real stdlib PNG pixel decode
    "multimodal_decode_png",
    # window-function core
    "window_rank_ntile", "window_lag_lead", "window_range_frame",
    "window_interval_range_frame",
    # datasus ingestion plane (S1-S4, S8, S11 parity)
    "datasus_competence_dim", "datasus_catalog_manifest", "datasus_pa_summary",
    "datasus_incremental_insert", "datasus_run_summary", "datasus_run_by_table",
    "datasus_filename_parse", "datasus_dbc_roundtrip", "datasus_dbc_source",
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
