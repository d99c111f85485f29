"""As-of (point-in-time) join — a custom operator the reference family
lacks but every event/feature pipeline needs: match each left row to the
LATEST right row with ``right.ts <= left.ts`` within the same key.

Spark has no ASOF JOIN primitive. The naive formulations both fail at
scale: a range theta-join explodes to a BroadcastNestedLoopJoin, and a
per-key ``applyInPandas`` loop funnels whole keys through Python. The
Spark-FIRST shape is the **union trick**:

1. tag left rows (side=1) and right rows (side=0),
2. union them into one table,
3. one window per key ordered by ``(ts, side, right_id)`` carries the
   last non-null right payload forward (``last(..., ignorenulls=True)``
   over unbounded-preceding..current),
4. keep the left rows.

Cost: ONE shuffle on the key (the window partition), no joins at all,
no Python. Right rows at the same (key, ts) are pre-deduped to the max
right-id row so the match is deterministic in any engine — DuckDB's
native ASOF JOIN (the oracle) leaves same-ts ties unspecified otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def interval_join(
    left: DataFrame,
    right: DataFrame,
    window,
    on: str = "ts",
    by: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Windowed interval join: ALL right rows with
    ``left[on] - window <= right[on] <= left[on]`` per key (the as-of
    join's keep-everything sibling; ``on`` columns must be numeric, e.g.
    epoch micros).

    A naive range predicate becomes a BroadcastNestedLoopJoin — a row-at-
    a-time interpreted loop that dies at scale. The scale shape is the
    **time-bucket equi-join**: bucket right rows by ``floor(ts/window)``,
    explode each left row to its two candidate buckets (b-1, b), hash-join
    on (key, bucket), then apply the exact range filter. Work is bounded
    by rows-per-(key, 2·window) — data-dependent, never all-pairs.
    """
    by = by or []
    w = int(window)
    if w != window:
        raise ValueError(
            f"window must be an integral number of time units, got {window!r}"
            " — int() truncation would silently narrow the match range"
        )
    if w <= 0:
        raise ValueError("window must be positive")
    if "_bucket" in left.columns or "_bucket" in right.columns:
        raise ValueError("input already has a _bucket column — rename it")
    r = right.select(
        *by,
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in by
        ],
    ).withColumn("_bucket", F.expr(f"`{on}{suffix}` div {w}"))
    b = F.expr(f"`{on}` div {w}")
    lhs = left.withColumn("_bucket", F.explode(F.array(b - 1, b)))
    return (
        lhs.join(r, [*by, "_bucket"])
        .where(
            (F.col(f"{on}{suffix}") >= F.col(on) - w)
            & (F.col(f"{on}{suffix}") <= F.col(on))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_id: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every ``left`` row + the matching ``right`` row
    sharing the ``by`` keys (NULL-filled when none exists).

    ``direction="backward"`` (default): latest right with
    ``right[on] <= left[on]``; same-timestamp ties -> HIGHEST right_id.
    ``direction="forward"``: earliest right with
    ``right[on] >= left[on]`` — "time to next purchase/deploy/error"
    questions; ties -> LOWEST right_id. Both run the same union trick
    (one shuffle on the key, a single window, no joins): forward flips
    the side ordering and carries first(ignorenulls) over
    currentRow..unboundedFollowing instead of last over the preceding
    frame.

    ``right_id`` (unique within right) makes tie-breaks deterministic.
    ``right_cols`` are the right payload columns to attach (default:
    everything except on/by/id), renamed with ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = by or []
    if right_id is None:
        raise ValueError("right_id is required for deterministic tie-breaks")
    right_cols = right_cols or [
        c for c in right.columns if c not in {on, right_id, *by}
    ]

    # dedupe right to one row per (by, ts): the max-id row backward,
    # min-id forward — the row the direction's tie-break selects
    _id_ord = (
        F.col(right_id).desc()
        if direction == "backward"
        else F.col(right_id).asc()
    )
    w_dedup = Window.partitionBy(*by, on).orderBy(_id_ord)
    r = (
        right.select(on, right_id, *by, *right_cols)
        .withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # Carry the matched right row as ONE struct through last(ignorenulls):
    # carrying each payload column independently would let a NULL field in
    # the matched row back-fill from an OLDER right row, silently mixing
    # values across right rows. The struct is non-null iff a right row
    # exists, so the matched row's columns stay atomic (and genuinely-NULL
    # fields stay NULL).
    carried = [right_id] + right_cols
    # a NULL right timestamp can never satisfy <=/>= — but NULLS-FIRST
    # ordering would put such rows at the window front where the carry
    # picks them up (confirmed vs DuckDB ASOF / pandas merge_asof, which
    # both return no match)
    r = r.where(F.col(on).isNotNull())
    r_fields = {f.name: f for f in r.schema.fields}
    struct_type = StructType([r_fields[c] for c in carried])
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_r"),
    )
    rhs = r.select(
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            if c not in {on, *by}
            else F.col(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in carried]).alias("_r"),
    )
    u = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows (side 0) sort before left rows at the same ts => "<="
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_r", F.last(F.col("_r"), ignorenulls=True).over(w))
    else:
        # left rows (side 1) sort before right rows at the same ts, and the
        # frame looks FORWARD => right at the same ts is eligible (">=")
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        u = u.withColumn("_r", F.first(F.col("_r"), ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1).drop("_side")
    # a NULL left timestamp has no as-of position: mask its match
    out = out.withColumn(
        "_r", F.when(F.col(on).isNotNull(), F.col("_r"))
    )
    for c in carried:
        if f"{c}{suffix}" in left.columns:
            raise ValueError(
                f"output column {c}{suffix} collides with a left column —"
                " pass a different suffix"
            )
        out = out.withColumn(f"{c}{suffix}", F.col("_r").getField(c))
    return out.drop("_r")


def value_band_self_join(
    df: DataFrame,
    value_col: str,
    eps: float,
    id_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Band self-join: all pairs (a < b by id) within the same ``keys``
    whose values differ by at most ``eps`` — the |x - y| <= eps theta
    join Spark would otherwise plan as a BroadcastNestedLoopJoin (an
    all-pairs scan). Returns ``(keys..., a, b, gap)``.

    Spark-first decomposition: bucket = floor(value / eps). Any
    qualifying pair sits in the same or adjacent buckets, so ONE
    equi-join on (keys, bucket_key) — with the probe side emitting its
    own bucket and bucket+1 — generates a candidate superset, and a
    cheap |diff| filter verifies. Each unordered pair is produced
    exactly once: same-bucket pairs only from the tag-0 key with
    id_a < id_b, adjacent-bucket pairs only from the tag-1 key (the
    higher bucket joins the lower's +1 alias). Candidate work is
    sum-of-bucket^2, i.e. bounded by value density per eps window — the
    same skew profile as any equi-join; salt or cap hot buckets if one
    value dominates.
    """
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    keys = keys or []
    v = F.col(value_col).cast("double")
    base = df.select(
        *keys,
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.floor(v / F.lit(float(eps))).cast("long").alias("_b"),
    )
    left = base.select(
        *keys,
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_b").alias("_jb"),
    )
    right = base.select(
        *keys,
        F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"),
        F.explode(
            F.array(
                F.struct(F.col("_b").alias("k"), F.lit(0).alias("tag")),
                F.struct((F.col("_b") + 1).alias("k"), F.lit(1).alias("tag")),
            )
        ).alias("_e"),
    ).select(*keys, "_idb", "_vb", F.col("_e.k").alias("_jb"), F.col("_e.tag").alias("_tag"))
    cand = left.join(right, [*keys, "_jb"]).where(
        ((F.col("_tag") == 1))
        | ((F.col("_tag") == 0) & (F.col("_ida") < F.col("_idb")))
    )
    return (
        cand.where(F.abs(F.col("_va") - F.col("_vb")) <= F.lit(float(eps)))
        .select(
            *keys,
            F.least("_ida", "_idb").alias("a"),
            F.greatest("_ida", "_idb").alias("b"),
            F.round(F.abs(F.col("_va") - F.col("_vb")), 6).alias("gap"),
        )
    )
