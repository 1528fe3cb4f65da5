"""Driver-visible audits for the approximate / iterative operators.

The engine's approximate paths (MinHash-LSH, SimHash, LSH/IVF ANN, k-means,
SemDeDup, PageRank, sketches, sampling) are rows-only at the driver: their
outputs are algorithm-specific, so no cross-engine SQL oracle can replay
them. This module pairs EACH of those queries with an oracle-backed audit
that reduces the operator's contract to values DuckDB *can* verify:

- exact quantities both engines compute independently (corpus counts,
  distinct counts, planted-duplicate counts) — a hard hash-matched check;
- deterministic invariant flags (planted recall == 100 %, sketch error
  within bound, recall-vs-exact above floor, Σrank == #nodes) that the
  Spark side computes and the oracle pins to 1 — a regression in the
  operator flips the flag and the driver row goes red.

Planted checks are chosen to be *deterministic*, not statistical: an exact
copy of a document always collides in every MinHash band and at SimHash
hamming 0, identical vectors always share an argmax k-means cell and score
cosine 1.0 — so "all planted duplicates found" is an invariant, not a
tolerance. Reference parity: the reference has no approximate operators at
all (SURVEY §2); these audits guard the additions at the same evidence bar
as the SQL surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lala_spark.io import load_events, load_table
from etl_lala_spark.operators import dedup as dd
from etl_lala_spark.operators import similarity as sim
from etl_lala_spark.plans import register

DIM = 64

def _flag(cond):
    """Invariant flag column: 1 when the condition holds everywhere."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")


# ---------------------------------------------------------------------------
# ANN: recall-vs-exact + score integrity (audits ann_cosine_lsh / ann_cosine_ivf)
# ---------------------------------------------------------------------------


def _ann_audit(spark: SparkSession, sf_dir: str, approx: DataFrame) -> DataFrame:
    """Shared audit body: approx top-k vs the brute-force baseline.

    ``recall_ok``: pair recall vs exact top-5 stays above a conservative
    floor (0.10; the corpus is isotropic synthetic data, where bucketed ANN
    recall is inherently modest — pytest pins a tighter 0.15).
    ``scores_exact``: every (query, neighbor) the approximate index returns
    carries the *exact* rounded cosine for that pair — approximation may
    drop pairs but must never mis-score one.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = sim.brute_force_topk(emb, queries, k=5)

    hits = approx.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    rescored = (
        approx.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "cos_sim",
            F.round(
                sim.dot(F.col("qv"), F.col("cv"))
                / (sim.norm(F.col("qv")) * sim.norm(F.col("cv"))),
                4,
            ).alias("true_sim"),
        )
    )
    mism = rescored.agg(
        F.count(F.when(F.col("cos_sim") != F.col("true_sim"), True)).alias("n_bad")
    )
    return (
        queries.agg(F.count("*").alias("n_queries"))
        .crossJoin(exact.agg(F.count("*").alias("n_exact")))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
        .crossJoin(mism)
        .select(
            "n_queries",
            F.lit(5).alias("k"),
            _flag(F.col("n_bad") == 0).alias("scores_exact"),
            _flag(F.col("n_hit") >= 0.10 * F.col("n_exact")).alias("recall_ok"),
        )
    )


_ANN_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_queries, 5 AS k,
       1 AS scores_exact, 1 AS recall_ok
FROM embeddings WHERE vec_id % 100 = 0
"""


@register("audit_ann_lsh", oracle=_ANN_ORACLE)
def audit_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``ann_cosine_lsh`` (rows-only there)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = sim.lsh_topk(emb, queries, dim=DIM, k=5, n_planes=8)
    return _ann_audit(spark, sf_dir, approx)


@register("audit_ann_ivf", oracle=_ANN_ORACLE)
def audit_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``ann_cosine_ivf`` (rows-only there)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = sim.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4)
    return _ann_audit(spark, sf_dir, approx)


_PQ_ORACLE = """
SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 100 = 0) AS BIGINT)
         AS n_queries,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_encoded,
       5 AS k, 1 AS codes_ok, 1 AS recall_ok
"""


@register("audit_ann_pq", oracle=_PQ_ORACLE)
def audit_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``ann_cosine_pq`` (rows-only there).

    ``n_encoded``: every corpus vector gets a code row — hash-matched
    against the oracle's corpus count. ``codes_ok``: all m codes of every
    row lie in [0, ksub). ``recall_ok``: ADC top-5 pair recall vs the exact
    brute-force top-5 stays above the same conservative 0.10 floor the
    LSH/IVF audits pin (measured ≈0.24 on the isotropic synthetic corpus;
    pytest pins ≥0.15). ADC scores are approximations by construction, so
    unlike ``scores_exact`` in the LSH/IVF audits there is no exactness
    flag — recall and code integrity are the contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = sim.pq_train(emb, dim=DIM, m=8, ksub=16, iters=2)
    # One materialization of the encode scan feeds both the ADC scoring and
    # the integrity aggregate; the code check folds into that aggregate
    # instead of an eager driver-side count (which re-ran the full encode).
    enc = sim.pq_encode(emb, books).cache()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = sim.pq_adc_topk(enc, queries, books, k=5)
    exact = sim.brute_force_topk(emb, queries, k=5)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    enc_stats = enc.agg(
        F.count("*").alias("n_encoded"),
        F.sum(
            F.expr("exists(codes, c -> c < 0 or c >= 16)").cast("long")
        ).alias("n_bad_codes"),
    )
    return (
        queries.agg(F.count("*").alias("n_queries"))
        .crossJoin(enc_stats)
        .crossJoin(exact.agg(F.count("*").alias("n_exact")))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
        .select(
            "n_queries",
            "n_encoded",
            F.lit(5).alias("k"),
            _flag(F.col("n_bad_codes") == 0).alias("codes_ok"),
            _flag(F.col("n_hit") >= 0.10 * F.col("n_exact")).alias("recall_ok"),
        )
    )


_IVFPQ_ORACLE = """
SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 100 = 0) AS BIGINT)
         AS n_queries,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_indexed,
       5 AS k, 1 AS cells_ok, 1 AS codes_ok, 1 AS recall_ok
"""


def _ivfpq_audit_body(
    emb: DataFrame, queries: DataFrame, index: DataFrame, approx: DataFrame
) -> DataFrame:
    """Shared IVFADC audit body (raw + residual variants): one index row
    per corpus vector, cell ids in [0, 16), codes in [0, 16), and top-5
    pair recall vs exact brute force >= the conservative 0.05 floor.
    ``emb``/``queries`` are the caller's OWN corpus and query frames — the
    recall denominator must be computed against exactly the population
    ``approx`` answered for, so the sampling predicate lives in one place
    per audit instead of drifting between caller and body."""
    exact = sim.brute_force_topk(emb, queries, k=5)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    idx_stats = index.agg(
        F.count("*").alias("n_indexed"),
        F.sum(
            ((F.col("cell") < 0) | (F.col("cell") >= 16)).cast("long")
        ).alias("n_bad_cells"),
        F.sum(
            F.expr("exists(codes, c -> c < 0 or c >= 16)").cast("long")
        ).alias("n_bad_codes"),
    )
    return (
        queries.agg(F.count("*").alias("n_queries"))
        .crossJoin(idx_stats)
        .crossJoin(exact.agg(F.count("*").alias("n_exact")))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
        .select(
            "n_queries",
            "n_indexed",
            F.lit(5).alias("k"),
            _flag(F.col("n_bad_cells") == 0).alias("cells_ok"),
            _flag(F.col("n_bad_codes") == 0).alias("codes_ok"),
            _flag(F.col("n_hit") >= 0.05 * F.col("n_exact")).alias("recall_ok"),
        )
    )


@register("audit_ann_ivfpq", oracle=_IVFPQ_ORACLE)
def audit_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``ann_cosine_ivfpq`` (rows-only there).

    ``n_indexed``: the one-pass IVF+PQ index has exactly one row per corpus
    vector (each vector lives in exactly one cell). ``cells_ok`` /
    ``codes_ok``: cell ids in [0, 16) and all m codes in [0, ksub).
    ``recall_ok``: IVFADC top-5 pair recall vs exact brute-force >= 0.05 — a
    deliberately conservative floor since IVFADC compounds the coarse-cell
    miss rate with ADC score distortion (measured 0.12-0.16 on the isotropic
    synthetic corpus; pytest pins >= 0.08)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = sim.pq_train(emb, dim=DIM, m=8, ksub=16, iters=2)
    index, ivf_cb = sim.ivfpq_index(emb, books, n_cells=16)
    index = index.cache()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = sim.ivfpq_topk(index, ivf_cb, queries, books, k=5, nprobe=4)
    return _ivfpq_audit_body(emb, queries, index, approx)


@register("audit_ann_ivfpq_residual", oracle=_IVFPQ_ORACLE)
def audit_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``ann_cosine_ivfpq_residual`` (rows-only
    there) — same integrity contract and 0.05 recall floor as
    ``audit_ann_ivfpq``; measured residual-encoding recall is 0.12
    (sf0.001) / 0.24 (sf0.01), the latter 2x the raw-vector encoding at
    identical compression."""
    emb = load_table(spark, sf_dir, "embeddings")
    index, ivf_cb, books = sim.ivfpq_residual_index(
        emb, dim=DIM, n_cells=16, m=8, ksub=16, iters=2
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = sim.ivfpq_residual_topk(index, ivf_cb, queries, books, k=5, nprobe=4)
    return _ivfpq_audit_body(emb, queries, index, approx)


# ---------------------------------------------------------------------------
# k-means Lloyd invariants (audits semantic_kmeans_clusters)
# ---------------------------------------------------------------------------


@register(
    "audit_kmeans",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_assigned,
       8 AS k_max, 1 AS cells_ok, 1 AS cohesion_ok
FROM embeddings
""",
)
def audit_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``semantic_kmeans_clusters``: every point assigned exactly
    once, cell count within k, cosine-to-centroid inside [-1, 1]."""
    emb = load_table(spark, sf_dir, "embeddings")
    asg = sim.kmeans_fit(emb, dim=DIM, k=8, iters=2, train_sample_mod=4)
    return (
        emb.agg(F.count("*").alias("n_points"))
        .crossJoin(
            asg.agg(
                F.count("*").alias("n_assigned"),
                F.countDistinct("cell").alias("n_cells"),
                F.max("sim").alias("smax"),
                F.min("sim").alias("smin"),
            )
        )
        .select(
            "n_points",
            "n_assigned",
            F.lit(8).alias("k_max"),
            _flag((F.col("n_cells") >= 1) & (F.col("n_cells") <= 8)).alias("cells_ok"),
            _flag(
                (F.col("smax") <= 1.0000001) & (F.col("smin") >= -1.0000001)
            ).alias("cohesion_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Planted-duplicate recall — deterministic 100 % for exact copies
# ---------------------------------------------------------------------------


def _planted_doc_audit(
    spark: SparkSession, sf_dir: str, pairs: DataFrame
) -> DataFrame:
    """Planted exact copies (every 10th doc re-appears at doc_id+100000) MUST
    all surface as pairs: identical text collides in every MinHash band and
    at SimHash hamming 0 — recall 1.0 is an invariant, not a tolerance."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 100000).alias("doc_b"),
    )
    found = planted.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(found.agg(F.count("*").alias("n_planted_found")))
        .select(
            "n_planted",
            "n_planted_found",
            _flag(F.col("n_planted") == F.col("n_planted_found")).alias("all_found"),
        )
    )


_PLANTED_DOC_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(count(*) AS BIGINT) AS n_planted_found,
       1 AS all_found
FROM documents WHERE doc_id % 10 = 0
"""


@register("audit_minhash_planted", oracle=_PLANTED_DOC_ORACLE)
def audit_minhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``dedup_minhash_lsh``: planted exact dups always recovered."""
    from etl_lala_spark.plans.llm_dedup import _dup_corpus

    pairs = dd.minhash_lsh_pairs(_dup_corpus(spark, sf_dir), threshold=0.5)
    return _planted_doc_audit(spark, sf_dir, pairs)


@register("audit_simhash_planted", oracle=_PLANTED_DOC_ORACLE)
def audit_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``dedup_simhash``: planted exact dups sit at hamming 0."""
    from etl_lala_spark.plans.llm_dedup import _dup_corpus

    pairs = dd.simhash_pairs(_dup_corpus(spark, sf_dir), max_hamming=3)
    return _planted_doc_audit(spark, sf_dir, pairs)


@register(
    "audit_components_planted",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(count(*) AS BIGINT) AS n_same_cluster,
       1 AS all_clustered, 1 AS min_label_ok
FROM documents WHERE doc_id % 10 = 0
""",
)
def audit_components_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``dedup_canonical_clusters``: each planted (doc, copy) pair
    lands in one component, and every label is the component minimum
    (canonical ≤ member id for all members)."""
    from etl_lala_spark.plans.llm_dedup import _dup_corpus

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(_dup_corpus(spark, sf_dir), threshold=0.5).select(
        "doc_a", "doc_b"
    )
    comp = dd.canonical_components(pairs)
    ca = comp.select(F.col("doc").alias("pa"), F.col("canonical").alias("canon_a"))
    cb = comp.select(F.col("doc").alias("pb"), F.col("canonical").alias("canon_b"))
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("pa"), (F.col("doc_id") + 100000).alias("pb")
    )
    same = (
        planted.join(ca, "pa")
        .join(cb, "pb")
        .where(F.col("canon_a") == F.col("canon_b"))
    )
    bad_label = comp.agg(
        F.count(F.when(F.col("canonical") > F.col("doc"), True)).alias("n_bad")
    )
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(same.agg(F.count("*").alias("n_same_cluster")))
        .crossJoin(bad_label)
        .select(
            "n_planted",
            "n_same_cluster",
            _flag(F.col("n_planted") == F.col("n_same_cluster")).alias("all_clustered"),
            _flag(F.col("n_bad") == 0).alias("min_label_ok"),
        )
    )


@register(
    "audit_semdedup_planted",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(count(*) AS BIGINT) AS n_planted_found,
       1 AS all_found
FROM embeddings WHERE vec_id % 50 = 0
""",
)
def audit_semdedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``dedup_semdedup``: an identical planted vector always
    shares its original's argmax cell and scores cosine 1.0 ≥ 0.97, so the
    cluster-blocked near-dup pass must recover every planted pair."""
    base = load_table(spark, sf_dir, "embeddings")
    dups = base.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = base.unionByName(dups)
    assigned = sim.kmeans_fit(
        corpus, dim=DIM, k=16, iters=2, train_sample_mod=4
    ).select("vec_id", "cell")
    blocked = corpus.join(assigned, "vec_id")
    pairs = sim.cosine_near_dup_pairs(blocked, threshold=0.97, block_col="cell")
    planted = base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("vec_a"), (F.col("vec_id") + 100000).alias("vec_b")
    )
    found = planted.join(pairs.select("vec_a", "vec_b"), ["vec_a", "vec_b"], "left_semi")
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(found.agg(F.count("*").alias("n_planted_found")))
        .select(
            "n_planted",
            "n_planted_found",
            _flag(F.col("n_planted") == F.col("n_planted_found")).alias("all_found"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank mass conservation (audits graph_supplier_pagerank)
# ---------------------------------------------------------------------------


@register(
    "audit_pagerank_mass",
    oracle="""
SELECT CAST(c + s AS BIGINT) AS n_nodes, 1 AS mass_ok, 1 AS all_positive
FROM (SELECT count(DISTINCT o_custkey) AS c
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
     (SELECT count(DISTINCT l_suppkey) AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
""",
)
def audit_pagerank_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``graph_supplier_pagerank``: node count matches the exact
    relational count, rank mass conserves (Σrank = #nodes on a graph with
    no dangling nodes), and every rank is positive."""
    from etl_lala_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    trade = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = trade.selectExpr("cust AS src", "supp AS dst").unionByName(
        trade.selectExpr("supp AS src", "cust AS dst")
    )
    ranks = pagerank(edges, iters=3)
    return ranks.agg(
        F.count("*").alias("n_nodes"),
        F.sum("rank").alias("mass"),
        F.min("rank").alias("rmin"),
    ).select(
        "n_nodes",
        _flag(
            F.abs(F.col("mass") - F.col("n_nodes")) <= 1e-6 * F.col("n_nodes")
        ).alias("mass_ok"),
        _flag(F.col("rmin") > 0).alias("all_positive"),
    )


# ---------------------------------------------------------------------------
# Sketch error bounds (audits events_distinct_rollup_hll / approx_aggs)
# ---------------------------------------------------------------------------


@register(
    "audit_hll_error",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       1 AS est_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def audit_hll_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``events_distinct_rollup_hll``: the merged daily-sketch
    estimate must sit within 5 % of the exact distinct count the oracle
    verifies independently (DataSketches HLL, lgK 12 → ~1.6 % RSE)."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            _flag(
                F.abs(F.col("approx_users") / F.col("exact_users") - 1.0) <= 0.05
            ).alias("est_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "audit_approx_aggs",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       1 AS acd_ok, 1 AS p50_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def audit_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``approx_aggs``: HLL++ distinct within 5 % of exact, and
    approx_percentile(0.5) between the exact 45th and 55th percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey").alias("acd"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("ap50"),
            F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
            F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
        )
        .select(
            "l_returnflag",
            "n",
            "exact_parts",
            _flag(
                F.abs(F.col("acd") / F.col("exact_parts") - 1.0) <= 0.05
            ).alias("acd_ok"),
            _flag(
                (F.col("ap50") >= F.col("p45")) & (F.col("ap50") <= F.col("p55"))
            ).alias("p50_ok"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Stratified sampling bounds (audits sample_stratified)
# ---------------------------------------------------------------------------


@register(
    "audit_stratified_sample",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, 1 AS keep_ok
FROM documents GROUP BY lang ORDER BY lang
""",
)
def audit_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit for ``sample_stratified``: full-fraction strata keep every row
    (exact), absent strata keep none (exact), and the Bernoulli stratum's
    keep-rate stays within 5 binomial standard deviations of its target."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0}
    sampled = d.sampleBy("lang", fractions, seed=42)
    totals = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    kept = sampled.groupBy("lang").agg(F.count("*").alias("n_kept"))
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    j = (
        totals.join(kept, "lang", "left")
        .na.fill({"n_kept": 0})
        .withColumn("target", F.coalesce(frac[F.col("lang")], F.lit(0.0)))
    )
    tol = 5.0 * F.sqrt(0.25 / F.col("n_docs"))
    exact_stratum = (F.col("target") == 0.0) | (F.col("target") == 1.0)
    return j.select(
        "lang",
        "n_docs",
        _flag(
            F.when(
                exact_stratum, F.col("n_kept") == F.col("target") * F.col("n_docs")
            ).otherwise(
                F.abs(F.col("n_kept") / F.col("n_docs") - F.col("target")) <= tol
            )
        ).alias("keep_ok"),
    ).orderBy("lang")


@register(
    "audit_power_iteration",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       1 AS unit_norm_ok, 1 AS residual_ok,
       1 AS energy_decomposition_ok, 1 AS variance_captured_ok
FROM embeddings
""",
)
def audit_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``embedding_top_pc_profile`` (rows-only
    there). Deterministic eigen-contract flags:

    - ``unit_norm_ok``: the returned direction is unit length (1e-9).
    - ``residual_ok``: relative eigen-residual ‖C·v − λv‖/λ ≤ 0.15 —
      small at convergence AND on near-flat spectra (where any unit
      vector is near-eigen), so deterministic on the isotropic fixture.
    - ``energy_decomposition_ok``: Σ(proj² + resid_sq) from the per-row
      fold path equals Σ_j n·Var(x_j) from an independent columnar
      aggregate (rel. 1e-6) — pins the two arithmetic paths against
      each other.
    - ``variance_captured_ok``: λ·n is a positive fraction of total
      centered energy, ≤ 1 (+1e-9).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pc = sim.power_iteration_pc(emb, dim=DIM, iters=6)
    x = F.col("embedding")
    # Independent columnar path: total centered energy = Σ_j n·var_pop(x_j).
    var_row = emb.agg(
        F.count("*").alias("n"),
        *[F.var_pop(x[i].cast("double")).alias(f"v{i}") for i in range(DIM)],
    ).first()
    col_energy = var_row["n"] * sum(float(var_row[f"v{i}"]) for i in range(DIM))
    fold = sim.top_pc_projection(emb, pc["mu"], pc["v"]).agg(
        F.sum(F.col("proj") * F.col("proj") + F.col("resid_sq")).alias("fold_energy"),
        F.count("*").alias("n_vectors"),
    )
    unit = abs(sum(c * c for c in pc["v"]) - 1.0) < 1e-9
    frac = pc["eigval"] * pc["n"] / col_energy if col_energy > 0 else -1.0
    return fold.select(
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        _flag(F.lit(bool(unit))).alias("unit_norm_ok"),
        _flag(F.lit(pc["rel_residual"] <= 0.15)).alias("residual_ok"),
        _flag(
            F.abs(F.col("fold_energy") - F.lit(col_energy))
            <= F.lit(1e-6) * F.lit(col_energy)
        ).alias("energy_decomposition_ok"),
        _flag(F.lit(0.0 < frac <= 1.0 + 1e-9)).alias("variance_captured_ok"),
    )


@register(
    "audit_bpe_conservation",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         AS initial_tokens,
       1 AS conservation_ok, 1 AS merge_order_ok
FROM documents
""",
)
def audit_bpe_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``tokenizer_bpe_merges`` (rows-only there).

    ``initial_tokens`` is hash-matched against DuckDB's independent count.
    ``conservation_ok``: every BPE application replaces two tokens with
    one, so after applying the trained merge table the corpus token total
    must equal initial − Σ applied — an EXACT law, checked by re-applying
    the merges with ``bpe_apply`` and recounting.
    ``merge_order_ok``: training picked pairs in non-increasing pair-count
    order (the greedy invariant; equal counts may interleave)."""
    from etl_lala_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    merges = tx.bpe_train(d, n_merges=8)
    applied_total = sum(m["applied"] for m in merges)
    order_ok = all(
        merges[i]["pair_count"] >= merges[i + 1]["pair_count"]
        for i in range(len(merges) - 1)
    )
    counts = tx.bpe_apply(d, merges).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("initial_tokens"),
        F.sum(F.size(F.split("bpe_text", r"\s+"))).alias("final_tokens"),
    )
    return counts.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("initial_tokens").cast("bigint").alias("initial_tokens"),
        _flag(
            F.col("final_tokens") == F.col("initial_tokens") - F.lit(applied_total)
        ).alias("conservation_ok"),
        _flag(F.lit(bool(order_ok))).alias("merge_order_ok"),
    )


@register(
    "audit_logistic_training",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       1 AS loss_monotone_ok, 1 AS improved_ok, 1 AS accuracy_ok
FROM documents
""",
)
def audit_logistic_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``train_quality_classifier`` (rows-only
    there): ``n_docs`` hash-matched against DuckDB;
    ``loss_monotone_ok`` = the gradient-descent log-loss sequence never
    increases (1e-9 float slack); ``improved_ok`` = final loss strictly
    below initial; ``accuracy_ok`` = the trained student reproduces the
    teacher rule's verdict on ≥ 80 % of the corpus."""
    from etl_lala_spark.operators import ml
    from etl_lala_spark.plans.llm_text import _quality_features

    feats = _quality_features(load_table(spark, sf_dir, "documents")).cache()
    cols = ["f_len", "f_punct", "f_stop"]
    fit = ml.logistic_train(feats, cols, iters=30, lr=4.0)
    ls = fit["losses"]
    monotone = all(b <= a + 1e-9 for a, b in zip(ls, ls[1:]))
    improved = ls[-1] < ls[0]
    acc = ml.logistic_predict(feats, cols, fit["weights"]).agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("pred") == F.col("y")).cast("int")).alias("n_right"),
    )
    return acc.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        _flag(F.lit(bool(monotone))).alias("loss_monotone_ok"),
        _flag(F.lit(bool(improved))).alias("improved_ok"),
        _flag(F.col("n_right") >= F.lit(0.8) * F.col("n_docs")).alias("accuracy_ok"),
    )


@register(
    "audit_unigram_em",
    oracle="""
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(w)) AS BIGINT) AS total_chars,
       (SELECT CAST(count(DISTINCT substr(t.w, i.i, 1)) AS BIGINT)
        FROM w t, LATERAL (SELECT unnest(range(1, len(t.w) + 1)) AS i) i)
         AS n_chars,
       1 AS recon_ok, 1 AS ll_monotone_ok, 1 AS vocab_budget_ok,
       1 AS chars_seeded_ok
FROM w
""",
)
def audit_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``tokenizer_unigram_em`` (rows-only there).

    ``n_words`` / ``total_chars`` / ``n_chars`` are hash-matched against
    DuckDB's independent tokenization — the trainer's own word table must
    reproduce them exactly. ``recon_ok``: the final E-step re-concatenates
    every word from its pieces with ZERO violations AND the piece-length
    total equals the corpus character total (exact conservation law — a
    segmentation that drops, duplicates, or mangles a piece anywhere in
    the corpus flips it). ``ll_monotone_ok``: the hard-EM objective (best-
    segmentation corpus log-likelihood) never decreased across rounds
    (relative 1e-9 slack for agg-order float jitter). ``vocab_budget_ok``:
    final vocab ≤ the requested budget. ``chars_seeded_ok``: every corpus
    character was seeded, so segmentability was total by construction."""
    from etl_lala_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    model = tx.unigram_lm_train(d, vocab_size=150, max_piece_len=4, iters=4)
    ll = model["ll_per_iter"]
    monotone = all(
        b >= a - 1e-9 * max(1.0, abs(a)) for a, b in zip(ll, ll[1:])
    )
    wtab = (
        d.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    base = wtab.agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("w")).alias("total_chars"),
    )
    nchars = (
        wtab.select(F.explode(F.split("w", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .agg(F.count_distinct("ch").alias("n_chars"))
    )
    return base.join(F.broadcast(nchars)).select(
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        _flag(
            F.lit(model["recon_violations"] == 0)
            & (F.lit(model["pieces_char_total"]) == F.col("total_chars"))
        ).alias("recon_ok"),
        _flag(F.lit(bool(monotone))).alias("ll_monotone_ok"),
        _flag(
            F.lit(len(model["vocab"]) <= model["vocab_budget"])
        ).alias("vocab_budget_ok"),
        _flag(F.lit(len(model["chars"])) == F.col("n_chars")).alias(
            "chars_seeded_ok"
        ),
    )


@register(
    "audit_incremental_planted",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(count(*) AS BIGINT) AS n_planted_found,
       1 AS all_found, 1 AS exact_jaccard_ok,
       CAST((SELECT count(*) FROM documents WHERE doc_id % 10 = 7)
            AS BIGINT) AS n_appended,
       CAST((SELECT count(*) FROM documents WHERE doc_id % 10 = 7)
            AS BIGINT) AS n_appended_found,
       1 AS compact_shrunk,
       CAST((SELECT count(*) FROM documents WHERE doc_id % 10 = 5)
            AS BIGINT) AS n_deleted,
       CAST(0 AS BIGINT) AS n_deleted_hits
FROM documents WHERE doc_id % 10 = 0
""",
)
def audit_incremental_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed twin of ``dedup_incremental_minhash``, extended to the
    full index LIFECYCLE: build the corpus index, APPEND a day's survivors
    (copies of every doc_id % 10 == 7 at +500000; the replayed append must
    add zero), COMPACT it (file count must shrink, search must survive),
    DELETE every doc_id % 10 == 5 (sig + shingle-hash + band rows gone),
    then dedup one probe batch against the surviving store. Invariants, all
    closed-form: every planted exact copy of a % 10 == 0 doc (+200000) is
    recovered at Jaccard exactly 1.0 from STORED shingle hashes (a store
    that dropped or re-hashed shingles differently would not); every probe
    of an APPENDED doc (+600000) finds its +500000 twin at 1.0 (appends are
    searchable through compaction); NO probe of a DELETED doc (+400000)
    matches the deleted id (deletion is complete — the exact copy would
    have matched at 1.0 had any trace survived). Recall 1.0 / leakage 0 are
    invariants, not tolerances.

    Builds its OWN index under its own workdir rather than calling the
    ``dedup_incremental_minhash`` gate fn: ``gate_workdir`` wipes the named
    gate's scratch dir on entry, so reusing the gate's would invalidate the
    lazy plan that gate returned earlier in the same driver round."""
    import os

    from etl_lala_spark.plans._gates import fixture_region, gate_workdir

    work = gate_workdir(spark, "audit_incremental_planted")
    index = os.path.join(work, "index")
    d = load_table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text")
    with fixture_region("audit_incremental_planted"):
        dd.minhash_index_write(corpus, index)

    # Lifecycle under test: append -> replay-append -> compact -> delete.
    day2 = corpus.filter(F.col("doc_id") % 10 == 7).withColumn(
        "doc_id", F.col("doc_id") + 500000
    )
    n_appended = dd.minhash_index_append(day2, index)
    n_replayed = dd.minhash_index_append(day2, index)  # must append 0
    comp = dd.minhash_index_compact(spark, index)
    shrunk = (
        n_replayed == 0
        and comp["sigs"]["files_after"] < comp["sigs"]["files_before"]
        and comp["bands"]["files_after"] < comp["bands"]["files_before"]
    )
    victims = corpus.filter(F.col("doc_id") % 10 == 5).select(
        F.col("doc_id").alias("doc")
    )
    dele = dd.minhash_index_delete(spark, index, victims)
    n_deleted = dele["sigs"]["rows_deleted"]

    probe = (
        corpus.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .unionByName(
            corpus.filter(F.col("doc_id") % 10 == 5).withColumn(
                "doc_id", F.col("doc_id") + 400000
            )
        )
        .unionByName(
            corpus.filter(F.col("doc_id") % 10 == 7).withColumn(
                "doc_id", F.col("doc_id") + 600000
            )
        )
    )
    pairs = dd.minhash_incremental_pairs(probe, index, threshold=0.5)
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 200000).alias("new_doc"),
        F.col("doc_id").alias("old_doc"),
    )
    found = planted.join(pairs, ["new_doc", "old_doc"], "left").select(
        "new_doc", "jaccard"
    )
    appended_found = (
        d.filter(F.col("doc_id") % 10 == 7)
        .select(
            (F.col("doc_id") + 600000).alias("new_doc"),
            (F.col("doc_id") + 500000).alias("old_doc"),
        )
        .join(pairs.filter(F.col("jaccard") == 1.0), ["new_doc", "old_doc"])
    )
    deleted_hits = (
        d.filter(F.col("doc_id") % 10 == 5)
        .select(
            (F.col("doc_id") + 400000).alias("new_doc"),
            F.col("doc_id").alias("old_doc"),
        )
        .join(pairs, ["new_doc", "old_doc"])
    )
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(
            found.agg(
                F.count(F.when(F.col("jaccard").isNotNull(), True)).alias(
                    "n_planted_found"
                ),
                F.count(F.when(F.col("jaccard") == 1.0, True)).alias("n_exact"),
            )
        )
        .crossJoin(
            appended_found.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_appended_found")
            )
        )
        .crossJoin(
            deleted_hits.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_deleted_hits")
            )
        )
        .select(
            "n_planted",
            "n_planted_found",
            _flag(F.col("n_planted") == F.col("n_planted_found")).alias(
                "all_found"
            ),
            _flag(F.col("n_planted") == F.col("n_exact")).alias(
                "exact_jaccard_ok"
            ),
            F.lit(n_appended).cast("bigint").alias("n_appended"),
            "n_appended_found",
            _flag(F.lit(bool(shrunk))).alias("compact_shrunk"),
            F.lit(n_deleted).cast("bigint").alias("n_deleted"),
            "n_deleted_hits",
        )
    )


@register(
    "audit_wordpiece_conservation",
    oracle="""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks
),
pair AS (SELECT g, count(*) AS c FROM grams GROUP BY g HAVING count(*) >= 2),
uni AS (SELECT u, count(*) AS cu
        FROM (SELECT unnest(t) AS u FROM toks) GROUP BY u),
best AS (
  SELECT pair.g
  FROM pair
  JOIN uni ca ON split_part(pair.g, ' ', 1) = ca.u
  JOIN uni cb ON split_part(pair.g, ' ', 2) = cb.u
  ORDER BY CAST(pair.c AS DOUBLE) / (ca.cu * cb.cu) DESC, pair.g
  LIMIT 1
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         AS initial_tokens,
       (SELECT g FROM best) AS first_pair,
       1 AS conservation_ok
FROM documents
""",
)
def audit_wordpiece_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``tokenizer_wordpiece_merges`` (rows-only
    there). ``n_docs``/``initial_tokens`` hash-match DuckDB's independent
    counts. ``first_pair`` is the round-1 ELECTION itself: the oracle
    replays the full likelihood-ratio argmax — empty-filtered bigram
    counts, unigram counts, count(ab)/(count(a)*count(b)) as an IEEE
    double, count >= 2 floor, (score desc, pair asc) order — in ANSI SQL,
    so a wrong numerator, a missed empty-token filter, or a broken
    tiebreak elects a different pair and fails the hash (rounds 2+ have no
    closed form — each election depends on the prior rewrite — which is
    exactly why round 1 is pinned exactly; WordPiece scores are not
    monotone across rounds, unlike BPE counts, so no ordering law
    applies). ``conservation_ok``: the BPE-shared anchored rewrite
    preserves token totals exactly — final == initial − Σ applied after
    re-applying the trained table with ``bpe_apply``."""
    from etl_lala_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    merges = tx.wordpiece_train(d, n_merges=8)
    applied_total = sum(m["applied"] for m in merges)
    first_pair = merges[0]["pair"] if merges else None
    counts = tx.bpe_apply(d, merges).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("initial_tokens"),
        F.sum(F.size(F.split("bpe_text", r"\s+"))).alias("final_tokens"),
    )
    return counts.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("initial_tokens").cast("bigint").alias("initial_tokens"),
        F.lit(first_pair).alias("first_pair"),
        _flag(
            F.col("final_tokens")
            == F.col("initial_tokens") - F.lit(applied_total)
        ).alias("conservation_ok"),
    )


@register(
    "audit_wordpiece_apply",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', '', 'g')))
            AS BIGINT) AS raw_chars,
       1 AS recon_ok, 1 AS unk_zero_ok
FROM documents
""",
)
def audit_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``tokenizer_wordpiece_apply`` (rows-only
    there). ``raw_chars`` — the corpus's non-whitespace char total — is
    hash-matched against DuckDB's independent count. ``recon_ok``: greedy
    WordPiece must be EXACTLY reconstructive — per doc, the concatenated
    pieces minus the ## continuation markers equal the doc's
    whitespace-stripped text, so the summed piece chars equal raw_chars
    and no per-doc mismatch exists (a lost suffix, a doubled piece, or a
    marker leak all flip the flag). ``unk_zero_ok``: with the vocab seeded
    from the trainer's full character set, the greedy matcher can always
    fall back to single chars, so not one [UNK] may appear."""
    from etl_lala_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    model = tx.unigram_lm_train(d, vocab_size=150, max_piece_len=4, iters=2)
    vocab = {v["piece"] for v in model["vocab"]} | set(model.get("chars", []))
    applied = tx.wordpiece_greedy_apply(d, vocab)
    # Marker accounting by POSITION, not by substring: every word emits
    # exactly one unmarked head piece (zero UNKs, pinned below), so the
    # continuation count is n_pieces − n_words and the ## marker mass is
    # exactly twice that. Deleting literal '##' substrings instead would
    # also eat '#' chars that are genuine content (or that become adjacent
    # across piece boundaries after the separator strip), failing the flag
    # on a perfectly reconstructive segmentation.
    n_words = F.size(
        F.filter(
            F.split(F.col("text"), r"[ \t\n\x0b\f\r]+"),
            lambda w: w != F.lit(""),
        )
    )
    piece_chars = (
        F.length(F.replace(F.col("pieces"), F.lit("\x01"), F.lit("")))
        - (F.col("n_pieces").cast("int") - n_words) * 2
    )
    raw_chars = F.length(
        F.regexp_replace(F.col("text"), r"[ \t\n\x0b\f\r]+", "")
    )
    unk_hits = F.size(
        F.filter(
            F.split("pieces", "\x01"), lambda p: p == F.lit("[UNK]")
        )
    )
    agg = applied.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(raw_chars).cast("bigint").alias("raw_chars"),
        F.sum(F.when(piece_chars != raw_chars, 1).otherwise(0)).alias(
            "n_recon_bad"
        ),
        F.sum(unk_hits).alias("n_unk"),
    )
    return agg.select(
        "n_docs",
        "raw_chars",
        _flag(F.col("n_recon_bad") == 0).alias("recon_ok"),
        _flag(F.col("n_unk") == 0).alias("unk_zero_ok"),
    )


@register(
    "audit_byte_bpe",
    oracle="""
WITH words AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
hx AS (SELECT lower(hex(encode(w))) AS h FROM words),
grams AS (
  SELECT unnest(list_transform(
           generate_series(1, CAST(strlen(h) / 2 AS INT) - 1),
           i -> substr(h, 2 * i - 1, 2) || ' ' || substr(h, 2 * i + 1, 2)))
         AS g
  FROM hx
),
best AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
  ORDER BY count(*) DESC, g LIMIT 1
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(octet_length(encode(
              regexp_replace(text, '\\s+', '', 'g')))) AS BIGINT)
         AS raw_bytes,
       (SELECT g FROM best) AS first_pair,
       1 AS recon_ok, 1 AS conservation_ok
FROM documents
""",
)
def audit_byte_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``tokenizer_byte_bpe`` (rows-only there).
    ``n_docs``/``raw_bytes`` (corpus UTF-8 bytes after whitespace strip)
    hash-match DuckDB's independent counts. ``first_pair`` replays the
    round-1 election in SQL — per-word hex byte grams, count >= 2 floor,
    (count desc, pair asc) — so a wrong seeding (chars instead of bytes,
    cross-word grams, case-mixed hex) elects a different pair and fails
    the hash. ``recon_ok``: byte-BPE must be EXACTLY reconstructive —
    per doc, unhex(concat(pieces)) equals the whitespace-stripped UTF-8
    bytes (the byte-conservation law: Σ piece bytes == raw_bytes, checked
    at per-doc grain, not just in sum). ``conservation_ok``: the shared
    anchored rewrite's token law — Σ n_pieces == raw_bytes − Σ applied
    (every application replaces two byte tokens with one)."""
    from etl_lala_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    merges = tx.byte_bpe_train(d, n_merges=8)
    applied_total = sum(m["applied"] for m in merges)
    first_pair = merges[0]["pair"].replace("\x01", " ") if merges else None
    stripped = F.regexp_replace("text", r"\s+", "")
    agg = tx.byte_bpe_apply(d, merges).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.octet_length(stripped)).cast("bigint").alias("raw_bytes"),
        F.sum(
            F.when(
                F.concat_ws("", F.col("pieces"))
                != F.lower(F.hex(F.encode(stripped, "UTF-8"))),
                1,
            ).otherwise(0)
        ).alias("n_recon_bad"),
        F.sum("n_pieces").alias("final_pieces"),
    )
    return agg.select(
        "n_docs",
        "raw_bytes",
        F.lit(first_pair).alias("first_pair"),
        _flag(F.col("n_recon_bad") == 0).alias("recon_ok"),
        _flag(
            F.col("final_pieces") == F.col("raw_bytes") - F.lit(applied_total)
        ).alias("conservation_ok"),
    )


@register(
    "audit_langid_trained",
    oracle="""
WITH d AS (
  SELECT doc_id, ['en', 'de', 'es', 'fr'][doc_id % 4 + 1] AS lang_true
  FROM documents WHERE doc_id < 400
)
SELECT lang_true,
       lang_true AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY lang_true ORDER BY lang_true
""",
)
def audit_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed audit for ``langid_trained`` (rows-only there): the
    EXACT confusion counts on the planted 4-language corpus. The oracle
    derives the diagonal from the planting arithmetic alone (language =
    doc_id % 4 over doc_id < 400), so ANY misclassification changes the
    row set — an off-diagonal cell appears and a diagonal count shrinks —
    and fails rows+hash, not just a tolerance. The planted languages are
    separated by their function words; a trained linear model over hashed
    char trigrams recovers that margin deterministically (fixed init,
    fixed lr/iters, no RNG)."""
    from etl_lala_spark.operators import ml
    from etl_lala_spark.plans.llm_text import _LANGID_LANGS, _langid_corpus

    corpus = _langid_corpus(load_table(spark, sf_dir, "documents"))
    # Shared materialized feature frame (see langid_trained): the audit
    # mirrors the headline query's structure exactly.
    feats = ml.hashed_char_ngram_features(
        corpus, n_buckets=16
    ).localCheckpoint()
    model = ml.langid_train(
        corpus, _LANGID_LANGS, label_col="lang_true", n_buckets=16, iters=6,
        feats=feats,
    )
    pred = ml.langid_predict(corpus, model, feats=feats)
    return (
        pred.groupBy("lang_true", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("lang_true", "pred_lang")
    )
