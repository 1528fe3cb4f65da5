"""Operator-level invariants beyond the oracle: planted-duplicate recall for
the approximate dedup paths, ANN recall vs the brute-force baseline,
multimodal plumbing, spread behavior (SURVEY.md §5 strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lala_spark.io import load_table, spread
from etl_lala_spark.operators import dedup as dd
from etl_lala_spark.operators import multimodal as mm
from etl_lala_spark.operators import similarity as sim
from etl_lala_spark.plans.llm_dedup import _dup_corpus, _neardup_corpus


def test_minhash_lsh_finds_planted_neardups(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir)
    planted = {
        (r["doc_id"], r["doc_id"] + 100000)
        for r in corpus.filter(F.col("doc_id") < 100000)
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
        .collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    }
    found = planted & pairs
    # banding (8 bands x 4 rows) at j~0.95 has >99.9% pair recall
    assert len(found) >= 0.9 * len(planted), (len(found), len(planted))
    # exact verification bounds precision: no pair below threshold survives
    out = dd.minhash_lsh_pairs(corpus, threshold=0.5)
    assert out.filter(F.col("jaccard") < 0.5).count() == 0


def test_simhash_finds_exact_dups(spark, sf_dir):
    corpus = _dup_corpus(spark, sf_dir)
    planted = {
        (r["doc_id"], r["doc_id"] + 100000)
        for r in corpus.filter(F.col("doc_id") < 100000)
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in dd.simhash_pairs(corpus, max_hamming=3).collect()
    }
    # identical text -> identical fingerprint -> hamming 0: all planted found
    assert planted <= pairs


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_topk(emb, queries, dim=64, k=5, n_planes=8, n_tables=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # uniform-random fixture vectors have no cluster structure (top-5
    # neighbors sit at cos≈0.4), the worst case for LSH — multi-table
    # OR-amplification must still beat random bucketing by a wide margin
    assert recall >= 0.15, recall
    # and every returned neighbor must share the query's bucket by construction
    assert all(q != n for q, n in approx)


def test_cosine_self_similarity_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    e = F.col("embedding")
    rows = emb.select(
        F.round(sim.dot(e, e) / (sim.norm(e) * sim.norm(e)), 6).alias("s")
    ).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in rows)


def test_multimodal_decode_stub_and_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = mm.attach_binary(docs)
    decoded = mm.decode_media(media).collect()
    assert len(decoded) == 50
    for r in decoded:
        assert r["width"] == r["n_bytes"] % 640
        assert len(r["digest"]) == 32
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_spread_is_noop_when_parallel_enough(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.repartition(64)
    assert spread(wide) is wide  # already >= default parallelism: no shuffle
    assert spread(li).rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
