"""Distributed quality-classifier training: full-batch logistic
regression over engine-built features.

The fastText-style quality classifier is the canonical model-in-the-loop
curation gate (GPT-3's WebText-similarity filter, CCNet's LM filter,
LLaMA's Wikipedia-reference classifier all follow this recipe): featurize
every document cheaply, train a linear model against a labeled slice,
then score the WHOLE corpus and threshold. The reference engine has no
training tier — this is a capability addition in the spirit of SURVEY
§2.9-§2.11 — but the scoring/eval surface reuses the repo's existing
pieces (`textanalysis.hashed_features`, `evaluation.
binary_classifier_metrics`), so the classifier drops into the same
oracled-query harness as everything else.

Design for 100 TB:

- The MODEL is tiny (dim + 1 doubles) and lives on the driver between
  iterations, exactly like the IVF centroids and PQ codebooks
  (`ann.py`): what is distributed is every pass over the data, never
  the parameters.
- Each GD iteration is ONE narrow aggregation job over the feature
  table: the margin/sigmoid/error expression folds the broadcast-
  literal weight array per row, and the per-dimension gradient comes
  from ``dim + 2`` map-side-combined sum columns in a single agg — no
  shuffle wider than one reduce row, no explode. For dims beyond a few
  thousand, switch to the posexplode + groupBy(dim) form; at the
  bag-of-hashed-words dims this targets (64-4096) the column form is
  both faster and plan-stable.
- Training SCANS the input once per iteration, so the trainer persists
  its projected input and unpersists it in a ``finally`` — it can do
  this safely (unlike the index-building paths that return lazy plans)
  because every iteration materializes to a driver-side weight vector,
  so nothing lazy escapes holding the cached lineage.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(features_col: str, weights: list[float], bias: float):
    """sum_j w_j * x_j + b — functions.vector.dot's index-order fold
    (deterministic fp; ONE copy of the oracle-pinned fold semantics)."""
    from ..functions.vector import dot, vector_lit

    warr = vector_lit(weights)
    return dot(F.col(features_col).cast("array<double>"), warr) + F.lit(
        float(bias)
    )


def logreg_train(
    features_df: DataFrame,
    dim: int,
    features_col: str = "features",
    label_col: str = "label",
    lr: float = 0.5,
    iterations: int = 20,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Full-batch gradient descent for L2-regularized logistic
    regression; returns ``(weights, bias)`` as plain Python floats.

    ``features_df`` needs ``features_col`` (numeric array of length
    ``dim``) and ``label_col`` (0/1). The mean-gradient step is
    ``w -= lr * (X^T (sigmoid(Xw + b) - y) / n + l2 * w)``; the bias is
    unregularized. Fixed ``iterations`` keeps the job count bounded and
    the artifact reproducible enough to persist once and serve forever
    (the fp sum order across partitions is the only nondeterminism, and
    it is below any decision boundary that matters — the persisted
    weights, not the training run, are the contract, same as the
    persisted ANN index tables).
    """
    proj = features_df.select(
        F.col(features_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
    ).persist()
    try:
        n = proj.count()
        if n == 0:
            raise ValueError("logreg_train: empty input")
        # feature hygiene up front, LOUDLY: a NULL features row or a
        # row whose array length != dim makes zip_with pad NULLs, the
        # margin/err go NULL, and the gradient sums silently SKIP the
        # row while n still counts it (shrunken steps) — or, when every
        # row mismatches, sum() returns NULL and the update crashes
        # with an opaque 'None / int' TypeError
        bad = proj.where(
            F.col("x").isNull() | (F.size("x") != F.lit(dim))
        ).count()
        if bad:
            raise ValueError(
                f"logreg_train: {bad} rows have NULL features or a "
                f"feature length != dim={dim}"
            )
        w = [0.0] * dim
        b = 0.0
        for _ in range(iterations):
            err = (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin("x", w, b)))
                - F.col("y")
            ).alias("_e")
            row = (
                proj.select(err, "x")
                .agg(
                    F.sum("_e").alias("gb"),
                    *[
                        F.sum(F.col("_e") * F.col("x")[j]).alias(f"g{j}")
                        for j in range(dim)
                    ],
                )
                .first()
            )
            gb = row["gb"] / n
            w = [
                wj - lr * (row[f"g{j}"] / n + l2 * wj)
                for j, wj in enumerate(w)
            ]
            b -= lr * gb
    finally:
        proj.unpersist()
    return w, b


def logreg_score(
    df: DataFrame,
    weights: list[float],
    bias: float,
    features_col: str = "features",
    id_col: str = "doc_id",
    keep: tuple = (),
) -> DataFrame:
    """Score every row with a trained model: ``(id[, keep...], score,
    pred)`` with
    ``score = round(sigmoid(round(margin, 6)), 6)`` and ``pred =
    score >= 0.5``. The margin is rounded BEFORE the sigmoid so an
    engine replaying the dot product in a different summation order
    (the DuckDB oracle joins sparse slots; Spark folds the dense array)
    lands on the identical sigmoid input — same 6-dp-pinning idiom as
    the ranking keys repo-wide. Pure narrow map, zero shuffle.
    ``keep`` names input columns carried through unchanged (the
    language_scores idiom: a consumer needing e.g. the label next to
    the score rides this scan instead of re-joining on doc_id)."""
    m = F.round(_margin(features_col, weights, bias), 6)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *keep,
        score.alias("score"),
        (score >= F.lit(0.5)).cast("int").alias("pred"),
    )


def calibration_report(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram table: bucket predictions into ``n_bins``
    equal-width probability bins and compare the mean predicted score
    with the empirical positive rate — ``(bin, n, mean_score,
    frac_pos)``. A calibrated scorer hugs the diagonal; a gate
    thresholding an uncalibrated score keeps a different corpus
    fraction than its operator thinks. Bin = floor(score * n_bins)
    clamped to the top bin (score 1.0 joins bin n_bins-1).

    Scale shape: one narrow bin expression + one map-side-combined
    groupBy over at most ``n_bins`` keys — runs corpus-wide at any
    size."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        scored.select(
            b.alias("bin"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(F.avg("_y"), 6).alias("frac_pos"),
        )
    )


def train_loss(
    features_df: DataFrame,
    weights: list[float],
    bias: float,
    features_col: str = "features",
    label_col: str = "label",
    l2: float = 1e-4,
) -> float:
    """Mean regularized log-loss of a model on a feature table — the
    convergence readout (one aggregation job). Clamps probabilities to
    [1e-12, 1-1e-12] so a confidently-wrong row yields a large finite
    loss instead of inf."""
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-_margin(features_col, weights, bias))
    )
    p = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    y = F.col(label_col).cast("double")
    row = features_df.agg(
        F.avg(-(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))).alias(
            "ll"
        )
    ).first()
    reg = 0.5 * l2 * sum(wj * wj for wj in weights)
    if row["ll"] is None:
        # avg over zero rows is NULL — the logreg_train empty-input
        # contract, not a float(None) TypeError
        raise ValueError("train_loss: empty input")
    return float(row["ll"]) + reg
