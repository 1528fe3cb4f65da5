"""In-engine model training for pipeline quality classifiers.

The inference side already runs as fused codegen expressions
(plans/llm_text.py:text_model_inference — the pure-SQL ML-inference
pattern); this module closes the loop with TRAINING on the cluster, the
fastText-style quality-classifier step of a curation pipeline (label a
corpus with a cheap teacher rule, fit a linear student, deploy the student
as a scan-fused expression).

Same iterative architecture as operators/similarity.py:power_iteration_pc /
kmeans_fit: model state is O(#features) floats on the driver, re-broadcast
as literals each round; per round the corpus is touched by exactly one scan
computing per-row sigmoid + per-feature gradient terms, reduced by one hash
aggregate of #features+2 columnar sums. Vectors/rows never shuffle, lineage
stays flat (each round's plan references only the feature frame), and the
whole loop is deterministic — no RNG, no row-order dependence beyond
floating summation order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 10,
    lr: float = 1.0,
) -> dict:
    """Batch gradient-descent logistic regression.

    ``features`` must carry numeric ``feature_cols`` and a 0/1 ``label_col``.
    Returns dict(weights=[w_0..w_k] with intercept FIRST, losses=[per-iter
    mean log-loss], n=row count). Loss is computed on the weights *before*
    each update, plus one final evaluation — len(losses) == iters + 1, and
    with a sane ``lr`` the sequence is non-increasing (asserted by the
    audit query, not assumed here).
    """
    k = len(feature_cols)
    n = None
    w = [0.0] * (k + 1)
    losses: list[float] = []
    y = F.col(label_col).cast("double")
    for _ in range(iters + 1):
        logit = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            logit = logit + F.lit(w[j + 1]) * F.col(c).cast("double")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
        # log-loss via log1p of exp(∓logit): algebraically -[y ln p +
        # (1-y) ln(1-p)] but never evaluates ln(0) when p saturates.
        loss_term = F.when(
            y >= F.lit(0.5), F.log1p(F.exp(-logit))
        ).otherwise(F.log1p(F.exp(logit)))
        err = p - y
        row = (
            features.select(
                loss_term.alias("l"),
                err.alias("g0"),
                *[
                    (err * F.col(c).cast("double")).alias(f"g{j + 1}")
                    for j, c in enumerate(feature_cols)
                ],
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("l").alias("loss"),
                *[F.sum(f"g{j}").alias(f"g{j}") for j in range(k + 1)],
            )
            .first()
        )
        n = int(row["n"])
        losses.append(float(row["loss"]) / n)
        grad = [float(row[f"g{j}"]) / n for j in range(k + 1)]
        w = [wj - lr * gj for wj, gj in zip(w, grad)]
    # The loop ran iters+1 times to get the final-model loss; the last
    # weight update is rolled back so weights correspond to losses[-1].
    w = [wj + lr * gj for wj, gj in zip(w, grad)]
    return {"weights": w, "losses": losses, "n": n}


def logistic_predict(
    features: DataFrame, feature_cols: list[str], weights: list[float]
) -> DataFrame:
    """Score with trained weights as ONE fused codegen projection — the
    deployment form (no UDF, no model server; at 100 TB inference is a
    scan). Appends ``p`` and ``pred``."""
    logit = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        logit = logit + F.lit(weights[j + 1]) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return features.withColumn("p", p).withColumn("pred", (p >= 0.5).cast("int"))


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
