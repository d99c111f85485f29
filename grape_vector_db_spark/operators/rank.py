"""Scale-safe global ordering primitives.

A plain ``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) is an
Exchange SinglePartition: every row funnels through ONE task — the r1
scale bug class this repo has eliminated everywhere (see
sparse.vocabulary). These helpers reproduce the EXACT global rank with
the same two-level trick, generalized beyond the vocabulary build:

1. range-bucket rows by sampled quantile cut points of the leading sort
   key (bucket assignment is a monotone function of the key, so bucket
   order extends the total order; rows with equal keys share a bucket,
   which keeps tie-breaks bucket-local);
2. rank inside each bucket in parallel (`row_number` over a PARTITIONED
   window);
3. add per-bucket offsets computed from a num_buckets-bounded count
   table collected to the driver and broadcast back.

The rank is exact — buckets only parallelize, they never approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame, materialize: str) -> DataFrame:
    """Shared materialization contract of the two-level rank/cumsum
    helpers — see :func:`global_row_number` for the trade-offs."""
    if materialize == "local_checkpoint":
        return df.localCheckpoint(eager=True)
    if materialize == "persist":
        return df.persist()
    if materialize != "none":
        raise ValueError(
            "materialize must be 'local_checkpoint', 'persist', or 'none',"
            f" got {materialize!r}"
        )
    return df


def _range_bucketize(
    df: DataFrame,
    key_col: str,
    num_buckets: int | None,
    sample_per_bucket: int,
):
    """``(df plus range-bucket column _b, resolved num_buckets)`` — the
    shared level-1 of the two-level global rank/cumsum: a bounded
    deterministic sample of the leading key (smallest xxhash64 —
    per-partition top-N, no global sort; same trick as _sampled_matrix)
    yields ~num_buckets cut points; bucket assignment is a monotone
    function of the key, so bucket order extends the total order.
    An all-null (or empty) key sample degrades to ONE bucket — the rank
    then comes entirely from the window's (key, tiebreaks) order, which
    handles both the empty frame and the all-null-key frame (nulls sort
    first, same as a plain ORDER BY). The old ``(None, ...)`` contract
    for this case made global_row_number emit NULL ranks and total 0
    for N real rows, silently zeroing budget_select and NULLing
    curriculum shards downstream.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sample = [
        r["_k"]
        for r in df.select(F.col(key_col).alias("_k"))
        .orderBy(F.xxhash64(F.col("_k")).asc(), F.col("_k").asc())
        .limit(num_buckets * sample_per_bucket)
        .collect()
        if r["_k"] is not None
    ]
    if not sample:
        return df.withColumn("_b", F.lit(0)), num_buckets
    sample.sort()
    stride = max(
        1,
        min(sample_per_bucket, (len(sample) + num_buckets - 1) // num_buckets),
    )
    bounds = sorted({sample[i] for i in range(stride, len(sample), stride)})
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: F.col(key_col) >= b))
    else:
        bucket = F.lit(0)
    return df.withColumn("_b", bucket), num_buckets


def global_row_number(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
    sample_per_bucket: int = 32,
    total_col: str | None = None,
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """``df`` plus ``out_col``: the 1-based global row number over the
    total order ``(key_col ASC, *tiebreak_cols ASC)``.

    ``tiebreak_cols`` must make the order total (end with a unique id).
    ``total_col`` optionally adds the overall row count as a literal
    column — it falls out of the offset computation for free, so callers
    that need N (tier cuts, percentiles) avoid a second count job.

    The rank inherently makes three passes over ``df`` (bound sample,
    per-bucket counts, the ranked output); without materialization each
    pass re-executes the caller's upstream plan — a 3x recompute of e.g.
    the quality-score regexes that showed up as a 4.6s query that should
    cost 1.5s. ``materialize`` picks the strategy:

    - ``"local_checkpoint"`` (default): eager localCheckpoint. Fastest
      locally, but NON-REPLAYABLE — on a real cluster an executor loss
      after the checkpoint fails the job instead of recomputing, and
      building the plan already runs a job. Two costs callers must know:
      (1) storage is the WHOLE input width for the GC lifetime of the
      result — pass a projection of just the key, tiebreaks, and the
      columns you need ranked; (2) the checkpoint is eager, so don't
      call this for a branch you may discard.
    - ``"persist"``: MEMORY_AND_DISK persist — lineage is kept, so
      executor loss recomputes (the cluster-safe choice). The cached
      blocks are released by Spark's ContextCleaner when the returned
      DataFrame is garbage-collected, or immediately if the caller keeps
      and unpersists ``df`` itself.
    - ``"none"``: fully lazy — correct but 3x recompute of the upstream
      plan; use when the input is already a cheap table scan.
    """
    from pyspark.sql import Window

    for c in ("_b", "_off"):
        if c in df.columns:
            raise ValueError(
                f"input already carries internal column {c!r} — rename it "
                "(the rank machinery would silently clobber and drop it)"
            )
    df = _materialize(df, materialize)
    tb, num_buckets = _range_bucketize(df, key_col, num_buckets, sample_per_bucket)
    counts = sorted(
        (r["_b"], r["n"])
        for r in tb.groupBy("_b").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_b int, _off long")
    )
    w = Window.partitionBy("_b").orderBy(
        F.col(key_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    out = (
        tb.join(off_df, "_b")
        .withColumn(out_col, F.col("_off") + F.row_number().over(w))
        .drop("_b", "_off")
    )
    if total_col:
        out = out.withColumn(total_col, F.lit(acc))
    return out


def global_prefix_sum(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: list[str],
    val_col: str,
    out_col: str = "cum",
    num_buckets: int | None = None,
    sample_per_bucket: int = 32,
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """``df`` plus ``out_col``: the INCLUSIVE running sum of ``val_col``
    over the total order ``(key_col ASC, *tiebreak_cols ASC)`` — the
    primitive behind budgeted selection ("take documents in quality
    order until the token budget fills") and exact CDF columns.

    Same two-level shape as :func:`global_row_number` (and the same
    ``materialize`` contract): range-bucket on sampled cut points of the
    leading key, window-cumsum inside each bucket in parallel, then add
    per-bucket PREFIX TOTALS (a num_buckets-row table collected and
    broadcast back) — no ``Exchange SinglePartition`` over the data.

    The sum is exact for integral ``val_col`` (token counts, byte
    sizes); for floating-point values the per-bucket partial order
    differs from a serial scan, so cross-engine comparisons should
    round. Descending order = pass the negated key as ``key_col``.
    """
    from pyspark.sql import Window

    for c in ("_b", "_off"):
        if c in df.columns:
            raise ValueError(
                f"input already carries internal column {c!r} — rename it "
                "(the rank machinery would silently clobber and drop it)"
            )
    df = _materialize(df, materialize)
    tb, _ = _range_bucketize(df, key_col, num_buckets, sample_per_bucket)
    sums = sorted(
        (r["_b"], r["s"])
        for r in tb.groupBy("_b").agg(F.sum(val_col).alias("s")).collect()
    )
    offsets, acc = [], 0
    for b, s in sums:
        offsets.append((b, acc))
        acc += s if s is not None else 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(b, float(o)) for b, o in offsets], "_b int, _off double"
        )
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col(key_col).asc(), *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tb.join(off_df, "_b")
        .withColumn(out_col, F.col("_off") + F.sum(val_col).over(w))
        .drop("_b", "_off")
    )
