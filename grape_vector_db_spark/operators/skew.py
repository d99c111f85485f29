"""Skew mitigation helpers (100 TB design requirement).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two places AQE can't:

- **salted aggregation**: a groupBy on a power-law key (term frequency,
  user id) concentrates one key's rows in one task. Two-phase salt:
  groupBy(key, salt) partial -> groupBy(key) final. Correct for any
  algebraic aggregate (sum/count/min/max).
- **salted broadcast-skew join**: when one side's hot keys overwhelm even
  AQE, explode the small side S ways and salt the big side's key so the
  hot key spreads over S tasks.
- **hot-key capping for shingle joins** (dedup): drop join keys whose
  frequency exceeds a cap — a frequency-bounded self-join never sees the
  quadratic blowup of a stop-shingle (documented in dedup; implemented
  here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe count per key: (key..., cnt)."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("cnt"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe sum per key: (key..., total)."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_s")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_s").alias("total"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt big's key into S buckets
    and explode ``small`` S ways so every (key, salt) pair still matches.
    small is broadcast (it grew by S but stays the small side)."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return big_s.join(F.broadcast(small_s), [key, "_salt"]).drop("_salt")


def cap_hot_keys(
    df: DataFrame, key_col: str, max_freq: int
) -> DataFrame:
    """Drop rows whose key frequency exceeds ``max_freq`` — bounds the
    quadratic cost of frequency-based self-joins (a shingle appearing in
    100k docs contributes 10^10 candidate pairs and zero discrimination).
    Returns the filtered frame; the dropped keys' count is observable via
    ``df.count() - result.count()``."""
    freq = df.groupBy(key_col).agg(F.count("*").alias("_f"))
    # anti-join the HOT set, never semi-join the keep set: hot keys are
    # tiny BY CONSTRUCTION (at most n_rows/max_freq of them) while keep
    # is nearly every distinct key — force-broadcasting it dies on the
    # broadcast limit / driver at exactly the scale this helper exists
    # for (the dedup.py hot-shingle rule). The anti form also KEEPS
    # null-key rows (a null never equi-matches), whereas the semi-join
    # silently dropped them despite their "frequency" never exceeding
    # the cap.
    hot = freq.where(F.col("_f") > max_freq).select(key_col)
    return df.join(F.broadcast(hot), key_col, "left_anti")


def key_skew_report(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """ONE-row skew diagnostic for a prospective join/groupBy key:
    (n_keys, n_rows, max_n, avg_n, cv, top1_share, p99_n). This is the
    measurement that decides whether a key needs salting before a 100 TB
    shuffle — cv (stddev/mean of per-key counts) near 0 means uniform,
    top1_share approaching a whole partition's share means one hot key
    serializes a task.

    Scale shape: one map-side-combined count per key, then one aggregate
    over the (already small) per-key count table. The exact interpolated
    percentile runs on counts, not rows.
    """
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("n")
    )
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 6).alias("avg_n"),
        F.round(F.stddev("n") / F.avg("n"), 6).alias("cv"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_n"),
    )
