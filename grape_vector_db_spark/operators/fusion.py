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

from ..functions.text import ws_tokens

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


def rrf_fuse(
    lists: dict[str, DataFrame],
    k: float = DEFAULT_RRF_K,
    limit: int | None = None,
    breakdown: bool = True,
) -> DataFrame:
    """Reciprocal-rank fusion; returns (doc_id, score [, per-source scores]).

    Output columns: doc_id, score (sum of 1/(k+rank)), plus — with
    ``breakdown`` (default True, the reference hydrates a ScoreBreakdown
    into every hybrid result, src/types.rs:428-446) — ``<source>_score``
    columns; pass breakdown=False for a schema comparable with the
    other strategies' default.
    """
    u = _union(lists)
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = u.withColumn("rank", F.row_number().over(w))
    fused = ranked.groupBy("doc_id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))), 6).alias("score"),
        *(_breakdown_aggs(lists) if breakdown else []),
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit is not None else out


def _breakdown_aggs(lists: dict[str, DataFrame]) -> list:
    """Per-source raw-score columns — the reference's ScoreBreakdown
    attached to every hybrid result (src/types.rs:428-446)."""
    return [
        F.round(F.max(F.when(F.col("source") == s, F.col("score"))), 6).alias(
            f"{s}_score"
        )
        for s in lists
    ]


def linear_fuse(
    lists: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    limit: int | None = None,
    breakdown: bool = False,
) -> DataFrame:
    """Alpha-weighted sum of raw scores, missing -> 0 (src/hybrid.rs:491-559).

    ``breakdown=True`` appends ``<source>_score`` columns (the reference
    hydrates a ScoreBreakdown into every result, src/hybrid.rs:337-353).
    """
    weights = weights or DEFAULT_WEIGHTS
    u = _union(lists)
    wexpr = None
    for s in lists:
        cond = (F.col("source") == s, F.col("score") * F.lit(weights.get(s, 0.0)))
        wexpr = F.when(*cond) if wexpr is None else wexpr.when(*cond)
    fused = u.withColumn("wscore", F.coalesce(wexpr, F.lit(0.0))).groupBy("doc_id").agg(
        F.round(F.sum("wscore"), 6).alias("score"),
        *(_breakdown_aggs(lists) if breakdown else []),
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit is not None else out


def classify_query(query_text: str) -> str:
    """Reference query-type heuristic (src/hybrid.rs:777-787): long sentence
    -> semantic, short single token -> keyword, else mixed."""
    q = query_text or ""
    if len(q) > 20 and " " in q:
        return "semantic"
    if len(q) <= 5 or " " not in q:
        return "keyword"
    return "mixed"


# Initial per-query-type weights (src/hybrid.rs:71-96).
DEFAULT_TYPE_WEIGHTS: dict[str, dict[str, float]] = {
    "semantic": {"dense": 0.8, "sparse": 0.15, "text": 0.05},
    "keyword": {"dense": 0.3, "sparse": 0.6, "text": 0.1},
    "mixed": {"dense": 0.5, "sparse": 0.4, "text": 0.1},
}


def predict_weights(
    query_text: str, type_weights: dict[str, dict[str, float]] | None = None
) -> dict[str, float]:
    """StatisticalFusionModel::predict_weights (src/hybrid.rs:107-132):
    per-type base weights, dense scaled by a query-length factor
    (1.2 if len > 10 else 0.8, capped at 1.0)."""
    tw = type_weights or DEFAULT_TYPE_WEIGHTS
    base = dict(tw[classify_query(query_text)])
    factor = 1.2 if len(query_text or "") > 10 else 0.8
    base["dense"] = min(base["dense"] * factor, 1.0)
    return base


def update_weights(
    type_weights: dict[str, dict[str, float]],
    feedback: list[tuple[float, float]],
    learning_rate: float = 0.01,
) -> dict[str, dict[str, float]]:
    """StatisticalFusionModel::update_model (src/hybrid.rs:134-166) as a
    batch job over a feedback log: per feedback row (ordered by time),
    every query type's weights move by lr*(satisfaction_delta) with the
    reference's 0.5/0.3 factors and clamps.

    ``feedback``: [(ts, satisfaction in [0,1])] — in Spark this is
    ``feedback_df.orderBy('ts').collect()``; the weight state is a tiny
    parameter table (SURVEY §7 hard-part 3: feedback lives in a table, a
    periodic batch job folds it into the weights, scoring joins/broadcasts
    them — mutable model state never lives inside the query plan).
    """
    tw = {k: dict(v) for k, v in type_weights.items()}
    prev: float | None = None
    for _, satisfaction in sorted(feedback):
        if prev is not None:
            diff = satisfaction - prev
            for w in tw.values():
                w["dense"] = min(max(w["dense"] + learning_rate * diff, 0.1), 0.9)
                w["sparse"] = min(
                    max(w["sparse"] + learning_rate * diff * 0.5, 0.1), 0.9
                )
                w["text"] = min(
                    max(w["text"] + learning_rate * diff * 0.3, 0.05), 0.3
                )
        prev = satisfaction
    return tw


def result_quality(df: DataFrame, cap: int = 10) -> float:
    """Reference result-quality metric (src/hybrid.rs:828-855):
    0.3*min(n,10)/10 + 0.5*avg + 0.2*max(0, 1 - stddev_pop). One tiny
    aggregate job per candidate list."""
    row = df.agg(
        F.count("*").alias("n"),
        F.avg("score").alias("avg"),
        F.coalesce(F.stddev_pop("score"), F.lit(0.0)).alias("sd"),
    ).head()
    if row["n"] == 0:
        return 0.0
    return _quality_scalar(row["n"], row["avg"], row["sd"], cap)


def _quality_scalar(n: int, avg, sd: float, cap: int) -> float:
    """The reference's result-quality formula (count 0.3 / mean 0.5 /
    1-sd 0.2, src/hybrid.rs:771-797) — ONE copy shared by
    result_quality and quality_adjusted_weights, which used to inline
    it separately (a formula tweak in one silently desynced the
    other). avg over an all-NULL score column is None — 0 quality."""
    return (
        min(n, cap) / cap * 0.3
        + (avg or 0.0) * 0.5
        + max(0.0, 1.0 - sd) * 0.2
    )


def quality_adjusted_weights(
    lists: dict[str, DataFrame],
    base_weights: dict[str, float] | None = None,
    cap: int = 10,
) -> dict[str, float]:
    """adjust_weights_by_quality (src/hybrid.rs:800-826): each source's
    weight scaled by (1 + quality_share * 0.2). All sources' stats come
    from ONE union + groupBy job (a per-source .head() loop paid job
    latency per list). NB the quality metric is the REFERENCE's formula
    over RAW scores — unbounded scales (BM25) earn a larger share than
    bounded cosines by construction; normalize the lists first
    (normalized_fuse's min-max) if that bias is unwanted.
    """
    base = dict(base_weights or DEFAULT_WEIGHTS)
    stats = {
        r["source"]: r
        for r in _union(lists)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.avg("score").alias("avg"),
            F.coalesce(F.stddev_pop("score"), F.lit(0.0)).alias("sd"),
        )
        .collect()
    }
    quality = {}
    for s_name in lists:
        r = stats.get(s_name)
        if r is None or r["n"] == 0:
            quality[s_name] = 0.0
        else:
            quality[s_name] = _quality_scalar(r["n"], r["avg"], r["sd"], cap)
    total = sum(quality.values())
    if total <= 0:
        return base
    return {
        s: base.get(s, 0.0) * (1.0 + quality[s] / total * 0.2) for s in lists
    }


def adaptive_fuse(
    lists: dict[str, DataFrame],
    query_text: str,
    history: DataFrame | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Adaptive fusion (src/hybrid.rs:753-774): predict per-type weights,
    adjust from similar historical queries (word-set Jaccard > 0.7; low
    average satisfaction shifts weight away from dense), then linear-fuse.

    ``history`` schema: (query_text string, satisfaction double in [0,1]).
    The similarity filter + satisfaction aggregate is one Spark job over
    the (small) history table; at scale it'd be broadcast.
    """
    weights = predict_weights(query_text)
    if history is not None:
        qwords = [w for w in (query_text or "").lower().split() if w]
        qcol = F.array(*[F.lit(w) for w in qwords]) if qwords else F.array()
        hwords = ws_tokens("query_text")
        jaccard = F.when(
            F.size(F.array_union(hwords, qcol)) == 0, F.lit(0.0)
        ).otherwise(
            F.size(F.array_intersect(hwords, qcol))
            / F.size(F.array_union(hwords, qcol)).cast("double")
        )
        row = (
            history.where(F.col("query_text").isNotNull())
            # NULL query_text would otherwise slip through: with
            # legacy sizeOfNull, size(NULL)=-1 makes jaccard (-1)/(-1)=1
            .where(jaccard > 0.7)
            .agg(F.avg("satisfaction").alias("s"), F.count("*").alias("n"))
            .head()
        )
        if row and row["n"] > 0 and row["s"] is not None and row["s"] < 0.6:
            weights = {
                "dense": weights["dense"] * 0.9,
                "sparse": weights["sparse"] * 1.1,
                "text": weights["text"] * 1.05,
            }
    return linear_fuse(lists, weights, limit=limit)


def normalized_fuse(
    lists: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    limit: int | None = None,
    breakdown: bool = False,
) -> DataFrame:
    """Min-max normalize each list to [0,1] (constant list -> 1.0,
    src/hybrid.rs:600-607) then weighted-sum merge. ``breakdown=True``
    appends per-source RAW score columns (ScoreBreakdown)."""
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
        F.round(F.sum("wscore"), 6).alias("score"),
        *(_breakdown_aggs(lists) if breakdown else []),
    )
    out = fused.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(limit) if limit is not None else out
