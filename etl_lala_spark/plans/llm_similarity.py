"""Similarity-search queries over `embeddings` (north star: ANN search).

Brute-force cosine top-k is the exact baseline with a DuckDB oracle (the
oracle mirrors the double-precision dot/norm arithmetic); the LSH-bucketed
variant is the 100 TB path — approximate, so rows-only + pytest recall tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_lala_spark.io import load_table
from etl_lala_spark.operators import similarity as sim
from etl_lala_spark.plans import register

DIM = 64

_DOT = "list_sum([c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE for i in range(1, 65)])"
_NQ = "sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE for i in range(1, 65)]))"
_NC = "sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE for i in range(1, 65)]))"


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / ({_NQ} * {_NC}), 4) AS cos_sim
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for every 100th vector: broadcast the
    query set, scan the corpus once (no corpus shuffle), rank per query with
    a deterministic rounded-sim + id tiebreak."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


@register("ann_cosine_lsh", doc="rows-only: approximate ANN via LSH buckets")
def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-5: queries compare only against their
    bucket (≈ corpus/2^8 candidates each). Deterministic hyperplanes, no
    RNG. Approximate → rows-only driver check; pytest measures recall vs the
    brute-force baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.lsh_topk(emb, queries, dim=DIM, k=5, n_planes=8).orderBy(
        "query_id", "rank"
    )


@register("ann_cosine_ivf", doc="rows-only: approximate ANN via IVF cells")
def ann_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized top-5: corpus assigned to its nearest of 16
    deterministic sample-vector centroids (narrow map over a broadcast
    codebook, no corpus shuffle), queries probe their 4 nearest cells.
    Approximate → rows-only driver check; pytest measures recall vs
    brute-force."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).orderBy(
        "query_id", "rank"
    )


@register(
    "ann_self_similarity",
    oracle=f"""
SELECT c.vec_id,
       round({_DOT.replace('q.qv', 'c.embedding')} /
             ({_NC} * {_NC}), 4) AS self_sim
FROM embeddings c
WHERE c.vec_id < 100
ORDER BY c.vec_id
""",
)
def ann_self_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sanity invariant: cosine(v, v) == 1.0 for every vector — guards the
    dot/norm arithmetic on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(sim.dot(e, e) / (sim.norm(e) * sim.norm(e)), 4).alias("self_sim"),
    ).orderBy("vec_id")


# `+ 0` collapses IEEE -0.0 to 0.0 so both engines repr identically.
_CENTROID_TERMS = ", ".join(
    f"round(avg(embedding[{i + 1}]::DOUBLE), 4) + 0" for i in range(DIM)
)


@register(
    "embedding_centroids",
    oracle=f"""
SELECT label,
       count(*) AS n_vectors,
       [{_CENTROID_TERMS}] AS centroid
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label elementwise mean of the embedding column (class centroids —
    the reduce step of IVF codebook training / per-cluster summaries).

    Spark-first plan: 64 columnar ``avg(embedding[i])`` aggregates in ONE
    hash aggregate, reassembled with ``F.array`` — a single shuffle of
    (labels × 64) partial sums with map-side combine, instead of the naive
    ``posexplode`` which would inflate the fact table 64× before shuffling.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroid = F.array(
        *[
            F.round(F.avg(F.col("embedding")[i].cast("double")), 4) + F.lit(0.0)
            for i in range(DIM)
        ]
    ).alias("centroid")
    return (
        emb.groupBy("label")
        .agg(F.count("*").alias("n_vectors"), centroid)
        .orderBy("label")
    )


def _hybrid_oracle() -> str:
    from etl_lala_spark.plans.llm_text import _bm25_oracle

    dot = _DOT  # candidate alias c x query alias q, as in the ANN oracles
    return f"""
WITH cand AS (
  SELECT doc_id, bm25 FROM ({_bm25_oracle()})
  ORDER BY bm25 DESC, doc_id LIMIT 20
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT cand.doc_id, cand.bm25,
         round({dot} / ({_NQ} * {_NC}), 4) AS cos_sim
  FROM cand JOIN embeddings c ON c.vec_id = cand.doc_id
  CROSS JOIN q
)
SELECT doc_id, bm25, cos_sim,
       CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS INT) AS rerank
FROM scored
ORDER BY rerank
"""


@register("hybrid_retrieval_rerank", oracle=_hybrid_oracle())
def hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the RAG-serving shape: cheap lexical BM25
    candidate generation (top-20, JVM-only scoring over `documents`) followed
    by embedding cosine rerank against a designated query vector
    (``vec_id = 0``), joining candidates to `embeddings` on the shared id.

    Scale: stage 1 touches the full corpus but moves only (doc_id, score);
    stage 2 is a broadcast-able 20-row join against the embedding table —
    the expensive vector math runs on exactly the candidate set, never the
    corpus. This is the composition pattern for ANN-at-scale: prune with an
    index-friendly signal, rerank exactly."""
    from etl_lala_spark.plans import query_fns

    cand = query_fns()["text_bm25_retrieval"](spark, sf_dir).limit(20)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    c = F.col("embedding")
    q = F.col("qv")
    scored = (
        cand.join(emb, cand.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "bm25",
            F.round(sim.dot(c, q) / (sim.norm(q) * sim.norm(c)), 4).alias("cos_sim"),
        )
    )
    w = W.orderBy(F.col("cos_sim").desc(), "doc_id")
    return scored.withColumn("rerank", F.row_number().over(w)).orderBy("rerank")


@register(
    "semantic_kmeans_clusters",
    doc="rows-only: iterative spherical k-means (Lloyd) cluster profile",
)
def semantic_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embedding corpus (2 Lloyd iterations,
    k=8, deterministic stride-sample init — `operators/similarity.py:
    kmeans_fit`; the objective-monotonicity pytest drives deeper
    iteration), profiled per cluster: size, cohesion (mean cosine to the
    centroid), dominant ground-truth label and its purity.

    This is the clustering stage of SemDeDup-style semantic dedup and of
    IVF codebook training. Iterative → not SQL-expressible, so rows-only
    driver check; pytest asserts the Lloyd invariants (objective
    non-decreasing, full assignment coverage).

    Scale: per iteration the corpus is touched by one narrow argmax map
    (broadcast codebook) plus one hash agg shuffling k × dim partial sums
    — vectors themselves never shuffle, so iteration cost is O(scan), not
    O(shuffle of 100 TB)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = sim.kmeans_fit(emb, dim=DIM, k=8, iters=2)
    labeled = assigned.join(emb.select("vec_id", "label"), "vec_id")
    per_cell = labeled.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("sim"), 4).alias("avg_cohesion"),
    )
    dom = (
        labeled.groupBy("cell", "label")
        .agg(F.count("*").alias("n"))
        .groupBy("cell")
        .agg(F.max(F.struct(F.col("n"), F.col("label"))).alias("top"))
        .select("cell", F.col("top.label").alias("dominant_label"), F.col("top.n").alias("dom_n"))
    )
    return (
        per_cell.join(dom, "cell")
        .select(
            F.col("cell").alias("cluster_id"),
            "n_members",
            "avg_cohesion",
            "dominant_label",
            F.round(F.col("dom_n") / F.col("n_members"), 4).alias("purity"),
        )
        .orderBy("cluster_id")
    )


@register(
    "dedup_semdedup",
    doc="rows-only: semantic dedup — cosine near-dups within k-means clusters",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup shape (cluster-then-dedup): spherical k-means blocks the
    corpus, then cosine near-duplicate pairs (≥ 0.97) are mined ONLY within
    each cluster — the quadratic comparison runs on cluster-sized blocks
    instead of the full corpus, which is what makes embedding dedup
    tractable at 100 TB (cost Σ|cluster|² ≪ N²; grow k with the corpus —
    k ≈ N/target_block keeps block cost flat). Per-cluster summary:
    candidate pairs found and distinct docs flagged for removal (the
    higher id of each pair, keep-first policy).

    Approximate (blocking can miss cross-cluster pairs) → rows-only;
    exact duplicates are planted (every 50th vector re-appears under a
    shifted id, as in dedup_embedding_cosine) and are always caught:
    identical vectors share an argmax cell by construction. pytest
    asserts exactly that planted recall."""
    base = load_table(spark, sf_dir, "embeddings")
    dups = base.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    emb = base.unionByName(dups)
    assigned = sim.kmeans_fit(emb, dim=DIM, k=16, iters=2).select("vec_id", "cell")
    blocked = emb.join(assigned, "vec_id")
    pairs = sim.cosine_near_dup_pairs(
        blocked, threshold=0.97, block_col="cell"
    )
    cell_of_b = assigned.select(F.col("vec_id").alias("vec_b"), "cell")
    return (
        pairs.join(cell_of_b, "vec_b")
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("vec_b").alias("n_flagged"),
        )
        .select(F.col("cell").alias("cluster_id"), "n_pairs", "n_flagged")
        .orderBy("cluster_id")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH q AS (
  SELECT label,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127
           AS scale,
         embedding
  FROM embeddings
),
err AS (
  SELECT label, scale,
         list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)
                    - floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)))
           AS max_err
  FROM q
)
SELECT label,
       count(*) AS n_vectors,
       round(avg(scale), 8) AS avg_scale,
       round(avg(max_err), 8) AS avg_max_err,
       round(max(max_err), 8) AS worst_err
FROM err
GROUP BY label
ORDER BY label
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 vector quantization accounting — the 4× storage compression
    every 100 TB embedding store runs: per-vector max-abs scale, symmetric
    int8 codes, and the reconstruction-error profile per label.

    All vector math is codegen'd JVM array lambdas over the float array —
    no UDF, no explode (64× row inflation), one scan + one hash agg. The
    quantizer is written as ``floor(x/scale + 0.5)`` on BOTH engines:
    an explicit deterministic half-up rule, immune to the banker's-rounding
    differences between engines' ``round``. Errors are bounded by scale/2
    by construction — the oracle would catch a wrong scale or a biased
    quantizer immediately."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        (
            F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
            / 127
        ).alias("scale"),
        "embedding",
    )
    err = q.select(
        "label",
        "scale",
        F.expr(
            "array_max(transform(embedding, "
            "x -> abs(CAST(x AS DOUBLE) "
            "- floor(CAST(x AS DOUBLE) / scale + 0.5D) * scale)))"
        ).alias("max_err"),
    )
    return (
        err.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("scale"), 8).alias("avg_scale"),
            F.round(F.avg("max_err"), 8).alias("avg_max_err"),
            F.round(F.max("max_err"), 8).alias("worst_err"),
        )
        .orderBy("label")
    )


@register(
    "embedding_top_pc_profile",
    doc="rows-only: iterative power-iteration dominant principal component",
)
def embedding_top_pc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top embedding preprocessing profile: the corpus'
    dominant principal component via power iteration
    (`operators/similarity.py:power_iteration_pc` — O(dim) driver state,
    one scan + one dim-column hash agg per iteration), then the per-label
    decomposition of every vector into projection-along-PC and residual
    energy. Iterative → rows-only driver check; `audit_power_iteration`
    pins the eigen contract to oracle-checkable flags."""
    emb = load_table(spark, sf_dir, "embeddings")
    pc = sim.power_iteration_pc(emb, dim=DIM, iters=6)
    proj = sim.top_pc_projection(emb, pc["mu"], pc["v"])
    return (
        proj.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(F.abs(F.col("proj"))), 4).alias("avg_abs_proj"),
            F.round(F.avg("resid_sq"), 4).alias("avg_resid_sq"),
        )
        .withColumn("eigval", F.round(F.lit(pc["eigval"]), 4))
        .orderBy("label")
    )
