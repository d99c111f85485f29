"""Z-order (Morton) file layout for multi-dimensional data skipping.

Parquet row-group pruning works off per-column min/max statistics, so
what a filter can skip is decided by how rows were SORTED at write
time. A linear sort on column x clusters x (great pruning on x, none on
y); interleaving the bits of several quantized columns into one Morton
key clusters ALL of them at once — a box predicate on any subset of the
z-ordered dimensions touches ~n^(1-1/d) of the files instead of all of
them. This is the same layout technique Delta's OPTIMIZE ZORDER and
Iceberg's sort orders apply (public, well-documented behavior); here it
is a plain column expression + repartitionByRange write, so it works on
stock parquet.

The key is pure integer arithmetic on pre-quantized columns — engine-
portable, so the oracle can replay every key bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_minmax(
    col: Column, lo: float, hi: float, bits: int = 8
) -> Column:
    """Map a numeric column into [0, 2^bits) by min/max scaling:
    floor((x - lo) / (hi - lo) * (2^bits - 1) + 0.5) clamped — the
    rank-preserving integer grid the Morton key interleaves. Degenerate
    range (hi == lo) maps everything to 0."""
    top = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("bigint")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi - lo)
    ) * F.lit(float(top)) + F.lit(0.5)
    return F.least(
        F.greatest(F.floor(scaled).cast("bigint"), F.lit(0)), F.lit(top)
    )


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of pre-quantized [0, 2^bits) integer columns:
    bit b of column i lands at position b * len(cols) + i. Pure folded
    shift/mask expression — whole-stage codegen, zero shuffle, and the
    identical integer formula replays in SQL."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        q = c.cast("bigint")
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (b * n + i))).cast("bigint")
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> dict[str, tuple[float, float]]:
    """Write ``df`` as parquet laid out in Morton order over ``cols``:
    one min/max pass (driver-held scalars — the quantization grid is
    metadata, like IVF centroids), then repartitionByRange on the key
    so each output file owns a contiguous key range (= a hyper-box of
    the quantized space, which is what makes EVERY z-ordered column's
    per-file min/max tight). Returns the {col: (lo, hi)} grid so
    readers/tests can reason about the layout. The sort is a range
    shuffle — the one-time reorganization cost, amortized over every
    pruned read after it."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    grid = {
        c: (float(stats[f"_lo_{c}"]), float(stats[f"_hi_{c}"])) for c in cols
    }
    key = zorder_key(
        [
            quantize_minmax(F.col(c), grid[c][0], grid[c][1], bits)
            for c in cols
        ],
        bits,
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return grid
