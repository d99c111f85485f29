"""Top-k / ranking utilities (reference §2.5-2.6, J9).

Global ``ORDER BY score LIMIT k`` already compiles to
TakeOrderedAndProject — per-partition heaps + driver merge, which IS the
reference's distributed scatter-gather (src/distributed/shard.rs:760-901).
What Spark doesn't ship directly is *top-k per group* without a full sort;
that's ``row_number`` over a (group) window — one shuffle on the group key,
in-partition heapsort.

Also here: min-max normalization and rank-decay weighting used by fusion
(src/hybrid.rs:588-616, src/query.rs:92-94).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group with deterministic tiebreak, rank column added."""
    if "rank" in df.columns:
        raise ValueError(
            "input already carries a 'rank' column — rename it (topk "
            "would silently overwrite it)"
        )
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def minmax_normalize(
    df: DataFrame, score_col: str = "score", group_cols: list[str] | None = None
) -> DataFrame:
    """Normalize scores to [0,1] per group (ties/constant -> 1.0, matching
    src/hybrid.rs:600-607). Adds ``norm_score``.

    The GLOBAL form (group_cols=None) is a scalar aggregate broadcast
    back over the input — an unpartitioned window would be Exchange
    SinglePartition over the whole frame (every row through ONE task:
    the r1 scale-bug class rank.py documents as eliminated repo-wide)."""
    if group_cols:
        w = Window.partitionBy(*group_cols)
        mn, mx = F.min(score_col).over(w), F.max(score_col).over(w)
        norm = F.when(mx == mn, F.lit(1.0)).otherwise(
            (F.col(score_col) - mn) / (mx - mn)
        )
        return df.withColumn("norm_score", F.round(norm, 6))
    stats = df.agg(
        F.min(score_col).alias("_mn"), F.max(score_col).alias("_mx")
    )
    norm = F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
        (F.col(score_col) - F.col("_mn"))
        / (F.col("_mx") - F.col("_mn"))
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("norm_score", F.round(norm, 6))
        .drop("_mn", "_mx")
    )


def rank_decay(score: Column, rank: Column, n: Column, weight: float = 1.0) -> Column:
    """score * weight * (1 - (rank-1)/n) positional decay (src/query.rs:92-94,
    0-based position i = rank-1)."""
    return score * F.lit(weight) * (F.lit(1.0) - (rank - 1).cast("double") / n)
