"""Watermarked stream-stream joins (capability ADDITION — SURVEY §2.9).

The event-correlation shape a 100 TB event pipeline needs: join two
UNBOUNDED streams (impressions x clicks, requests x responses, queries x
conversions) where a match must arrive within a bounded event-time window.
Structured Streaming executes this with per-key state on both sides; the
watermark + the time-range join condition are what let it EVICT state —
without both, state grows forever. These helpers bake in the contract:

- both inputs get ``withWatermark`` (bounds how late a row may arrive);
- the join condition is equi-key AND a bounded event-time band
  (``right_ts`` in [left_ts, left_ts + max_delay]), which gives the
  engine the proof it needs to drop buffered rows once the watermark
  passes the band.

State size per executor ~ (input rate x (watermark + max_delay)) per
side, hash-partitioned by key — independent of total history, the
property that makes the join viable on an unbounded 100 TB/day feed.
The same functions run on BATCH DataFrames unchanged (watermarks are
no-ops there), which is how the tests pin streaming == batch equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "imp_ts",
    right_ts: str = "click_ts",
    max_delay: str = "10 minutes",
    watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left event (impression) to the right events (clicks)
    for the same key that occur within ``(left_ts, left_ts + max_delay]``
    — strictly after the impression, at most max_delay later. Returns
    the joined rows plus ``delay_sec`` (click - impression). ``how``
    may be ``"inner"`` or ``"left_outer"`` (unmatched impressions emit
    once their watermark window closes; their right columns are null).

    Columns from the two sides must not collide (rename before calling)
    except ``key_col``, which must exist on both and is coalesced into
    one output column.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    overlap = (set(left.columns) & set(right.columns)) - {key_col}
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    if "delay_sec" in left.columns or "delay_sec" in right.columns:
        raise ValueError(
            "delay_sec is the reserved output column — rename the input"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key_col] == rw[key_col])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    out_cols = [lw[key_col].alias(key_col)] + [
        c for c in left.columns if c != key_col
    ] + [rw[c] for c in right.columns if c != key_col]
    # cast through timestamp_ltz so TIMESTAMP_NTZ inputs also subtract
    # (NTZ -> double is not castable directly; the timezone offset
    # cancels in the difference)
    return joined.select(*out_cols).withColumn(
        "delay_sec",
        F.col(right_ts).cast("timestamp_ltz").cast("double")
        - F.col(left_ts).cast("timestamp_ltz").cast("double"),
    )
