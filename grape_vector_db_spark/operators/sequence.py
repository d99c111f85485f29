"""Event-sequence analytics: first-order Markov structure over per-user
event streams.

The reference's event surface is request logging; these operators are the
capability ADDITION a behavioral-analytics user expects from an engine
holding an events table: transition matrices and entropy rates computed
with one partitioned window pass + map-side-combined aggregates — shapes
that hold at 100 TB because every step is keyed by (user) then by
(event_type pair), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event streams:
    (cur_type, next_type, n, p, cur_entropy) where p = P(next|cur) and
    cur_entropy is the Shannon entropy (bits) of cur's outgoing
    distribution — low-entropy states are funnel stages, high-entropy
    states are browsing.

    Scale shape: ONE window pass partitioned by user (users
    parallelize), then a map-side-combined count per (cur, next) pair;
    the per-cur totals/entropy aggregate over the tiny pair table. The
    (ts, tiebreak) ordering makes the lead deterministic under ties.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    trans = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("cur_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = trans.groupBy("cur_type").agg(F.sum("n").alias("_tot"))
    withp = trans.join(totals, "cur_type").withColumn(
        "p", F.round(F.col("n") / F.col("_tot"), 6)
    )
    ent = (
        withp.groupBy("cur_type")
        .agg(
            F.round(
                -F.sum(
                    (F.col("n") / F.col("_tot"))
                    * F.log2(F.col("n") / F.col("_tot"))
                ),
                6,
            ).alias("cur_entropy")
        )
    )
    return withp.join(ent, "cur_type").select(
        "cur_type", "next_type", "n", "p", "cur_entropy"
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch gaps-and-islands sessionization — the batch twin of
    ``streaming.sessionize_stream``: consecutive events of a user belong
    to one session while the inter-event gap is <= ``gap_minutes``; a
    STRICTLY larger gap opens a new one (the same boundary rule the
    streaming operator applies, so a backfill recomputation agrees with
    the live path). Returns per-session rollups
    ``(user_id, session_idx, n_events, n_types, duration_s,
    total_value)`` with ``session_idx`` 1-based in (ts, tiebreak) order.

    Scale shape: ONE window shuffle partitioned by user computes both
    the lag gap and the running new-session cumsum; the per-session
    groupBy then needs NO second shuffle — hash partitioning on
    ``user_col`` already clusters every (user, session) group, which
    Spark recognizes (ClusteredDistribution over a superset of the
    partitioning keys). Users parallelize; nothing is global.
    """
    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col),
        F.col(value_col),
        t.alias("_us"),
        F.when(
            (t - F.lag(t).over(w)).isNull() | ((t - F.lag(t).over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
        F.col(tiebreak_col),
    ).withColumn(
        "session_idx",
        F.sum("_new")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("_us").asc(), F.col(tiebreak_col).asc()
            )
        )
        .cast("int"),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(type_col).alias("n_types"),
        F.round((F.max("_us") - F.min("_us")) / 1e6, 6).alias("duration_s"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )


def decayed_user_scores(
    events: DataFrame,
    half_life_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially time-decayed per-user activity score — the
    feature-store recency aggregate: score = Σ value·2^(-Δdays/half_life)
    with Δ measured to the corpus max timestamp, so recent activity
    dominates without a cutoff cliff.

    Scale shape: one single-row max-timestamp broadcast, then the decay
    weight is a narrow expression folded into ONE map-side-combined
    groupBy(user) — the exponential form is associative, which is what
    makes this a one-shuffle aggregate instead of a sequential fold.
    Returns (user_id, n_events, decayed_score).
    """
    import math as _math

    tmax = events.agg(F.max(ts_col).alias("_tmax"))
    lam = _math.log(2.0) / float(half_life_days)
    # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike and
    # subtracts within the input type — no timezone conversion, so the
    # delta is correct even across DST transitions (a cast-to-TIMESTAMP
    # would shift the two ends by different UTC offsets there)
    delta_days = F.expr(
        f"timestampdiff(MICROSECOND, {ts_col}, _tmax)"
    ).cast("double") / F.lit(86_400_000_000.0)
    return (
        events.crossJoin(F.broadcast(tmax))
        .select(
            F.col(user_col).alias("user_id"),
            (F.col(value_col) * F.exp(-F.lit(lam) * delta_days)).alias("_w"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("_w"), 6).alias("decayed_score"),
        )
    )
