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


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i when an event of
    ``steps[i]`` occurs STRICTLY after their step i-1 time (first
    qualifying occurrence; simultaneous events don't chain). Returns one
    row per step: ``(step, step_name, n_users, conversion, step_rate)``
    with conversion = n / n_step1 and step_rate = n / n_prev (both 6-dp,
    step 1 reads 1.0).

    Scale shape: step i is one filtered min-aggregate per user joined
    against the step i-1 times — len(steps)-1 hash joins keyed by user,
    each map-side combined; the final rollup is len(steps) one-row
    aggregates unioned and self-joined (a constant-size table).
    """
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    per_step = []
    prev = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    per_step.append(prev)
    for s in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == s)
            .select(F.col(user_col).alias("u"), F.col(ts_col).alias("_ts"))
            .join(prev.select("u", F.col("t").alias("_pt")), "u")
            .where(F.col("_ts") > F.col("_pt"))
            .groupBy("u")
            .agg(F.min("_ts").alias("t"))
        )
        per_step.append(nxt)
        prev = nxt
    spark = events.sparkSession
    counts = None
    for i, (name, df) in enumerate(zip(steps, per_step), start=1):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        counts = row if counts is None else counts.unionByName(row)
    first = counts.where(F.col("step") == 1).select(
        F.col("n_users").alias("_n1")
    )
    prev_counts = counts.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("_np")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .join(F.broadcast(prev_counts), "step", "left")
        .select(
            "step",
            "step_name",
            "n_users",
            F.round(
                F.when(F.col("_n1") > 0, F.col("n_users") / F.col("_n1"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("conversion"),
            F.round(
                F.when(
                    F.col("_np").isNull(), F.lit(1.0)
                ).when(
                    F.col("_np") > 0, F.col("n_users") / F.col("_np")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("step_rate"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-start week of a user's
    FIRST event; for every (cohort, week-offset) the fraction of that
    cohort active in that week — ``(cohort_week, week_offset, n_active,
    cohort_size, retention)``. Offset 0 always reads 1.0 (the first
    event is itself activity).

    Scale shape: first-seen is one min-aggregate per user; activity is
    one distinct per (user, week); the join back is keyed by user, and
    the rollup keys (cohort, offset) are bounded by weeks^2 — tiny.
    date_trunc('week') is Monday-start in both Spark and DuckDB, so
    the oracle replays the cohort keys exactly.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(wk).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col).alias("u"), wk.alias("w")
    ).distinct()
    joined = active.join(first, "u").select(
        "u",
        F.col("cohort_week").cast("date").alias("cohort_week"),
        (
            F.datediff(F.col("w").cast("date"), F.col("cohort_week").cast("date"))
            / 7
        )
        .cast("int")
        .alias("week_offset"),
    )
    sizes = first.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week")
    ).agg(F.count("*").alias("cohort_size"))
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )
