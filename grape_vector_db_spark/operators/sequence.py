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
