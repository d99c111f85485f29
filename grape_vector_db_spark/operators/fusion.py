"""Hybrid result fusion (reference W1-W4, J6-J7; src/hybrid.rs:422-616).

Inputs are scored result lists as DataFrames ``(doc_id, score)`` tagged with
a source name. Fusion strategies reproduced:

- **RRF** (src/hybrid.rs:429-488): per-source rank r (1-based, score desc),
  rrf = 1/(k + r), summed across sources per doc. k defaults to 60
  (src/types.rs:280-284).
- **Linear** (src/hybrid.rs:491-559): weighted sum of raw scores with
  per-source weights (default dense 0.7 / sparse 0.2 / text 0.1,
  src/types.rs:270-278); missing scores contribute 0.
- **Normalized**: min-max normalize each list to [0,1] first
  (src/hybrid.rs:588-616; ties -> 1.0), then weighted sum.

Shape at scale: each candidate list is already small (over-fetched top 2k
per source, src/hybrid.rs:294-330), so fusion is a union + one groupBy —
but the pipeline is written to be correct for arbitrarily large lists too:
ranking is a window partitioned by source (shuffle on source only of the
candidate set, never the corpus), and the merge is a hash aggregation.

Rank ties are broken by doc_id ascending — the reference relies on Rust's
stable sort (insertion order); a distributed engine must pin an explicit
total order instead, and doc_id is the only deterministic choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60.0
DEFAULT_WEIGHTS = {"dense": 0.7, "sparse": 0.2, "text": 0.1}


def tag(df: DataFrame, source: str) -> DataFrame:
    """Tag a (doc_id, score) list with its source name."""
    return df.select("doc_id", "score", F.lit(source).alias("source"))


def _union(lists: dict[str, DataFrame]) -> DataFrame:
    out = None
    for name, df in lists.items():
        t = tag(df, name)
        out = t if out is None else out.unionByName(t)
    if out is None:
        raise ValueError("no result lists to fuse")
    return out


def rrf_fuse(lists: dict[str, DataFrame], k: float = DEFAULT_RRF_K, limit: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion; returns (doc_id, score [, per-source scores]).

    Output columns: doc_id, score (sum of 1/(k+rank)), plus
    ``<source>_score`` carrying each source's raw score (the reference's
    ScoreBreakdown, src/types.rs:428-446).
    """
    u = _union(lists)
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = u.withColumn("rank", F.row_number().over(w))
    fused = ranked.groupBy("doc_id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))), 6).alias("score"),
        *[
            F.round(
                F.max(F.when(F.col("source") == s, F.col("score"))), 6
            ).alias(f"{s}_score")
            for s in lists
        ],
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit else out


def linear_fuse(
    lists: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Alpha-weighted sum of raw scores, missing -> 0 (src/hybrid.rs:491-559)."""
    weights = weights or DEFAULT_WEIGHTS
    u = _union(lists)
    wexpr = None
    for s in lists:
        cond = (F.col("source") == s, F.col("score") * F.lit(weights.get(s, 0.0)))
        wexpr = F.when(*cond) if wexpr is None else wexpr.when(*cond)
    fused = u.withColumn("wscore", F.coalesce(wexpr, F.lit(0.0))).groupBy("doc_id").agg(
        F.round(F.sum("wscore"), 6).alias("score")
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit else out


def normalized_fuse(
    lists: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Min-max normalize each list to [0,1] (constant list -> 1.0,
    src/hybrid.rs:600-607) then weighted-sum merge."""
    weights = weights or DEFAULT_WEIGHTS
    u = _union(lists)
    w = Window.partitionBy("source")
    u = u.withColumn("_mn", F.min("score").over(w)).withColumn(
        "_mx", F.max("score").over(w)
    )
    norm = F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
        (F.col("score") - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
    )
    wexpr = F.lit(0.0)
    for s, wt in weights.items():
        wexpr = wexpr + F.when(F.col("source") == s, norm * F.lit(wt)).otherwise(0.0)
    fused = u.withColumn("wscore", wexpr).groupBy("doc_id").agg(
        F.round(F.sum("wscore"), 6).alias("score")
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit else out
