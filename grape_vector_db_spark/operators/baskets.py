"""Market-basket co-occurrence (support / lift).

The relational sibling of the token-level PMI collocations
(textanalysis.collocations): which items appear together in the same
basket (order, session, document) more often than independence predicts.
The pair fan-out is the classic scale trap — a basket of s items emits
C(s, 2) pairs, so one 1M-item "basket" (a crawler session, a bot order)
is 5e11 rows. ``max_basket_items`` drops oversized baskets outright (the
standard frequent-itemset guard: a basket that large carries no signal
per pair anyway), bounding candidate work at sum(min(s, cap)^2).

Plan shape: ONE groupBy(basket) builds the deduped sorted item array,
pairs explode from the array (a < b by construction — no distinct, no
self-join re-evaluation), ONE map-side-combined groupBy counts pairs,
and the item-frequency table joins back keyed on item. No step is ever
corpus x corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import ordered_pairs


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_pair, support, lift) for item pairs sharing a
    basket at least ``min_pair_count`` times. ``support`` = pair baskets
    / total baskets; ``lift`` = P(a,b) / (P(a) P(b)) — > 1 means the
    pair co-occurs more than independent popularity predicts. Items are
    deduplicated within a basket; ``a < b`` canonically.

    One count action computes the basket total (a scalar, like
    corpus_stats); everything else is lazy. See the module docstring
    for the scale contract.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    )
    # collect_set dedups within the basket, so no pre-distinct shuffle:
    # the groupBy's map-side combine IS the dedup
    baskets = items.groupBy("basket").agg(
        F.array_sort(F.collect_set("item")).alias("ms")
    )
    if max_basket_items is not None:
        baskets = baskets.where(F.size("ms") <= max_basket_items)
    # three consumers (pair explode, item counts, the basket total):
    # persist keeps lineage (cluster-safe recompute on executor loss;
    # ContextCleaner frees the blocks when the result is GC'd)
    baskets = baskets.persist()
    pair_arr = ordered_pairs(
        F.col("ms"), lambda x, y: F.struct(x.alias("a"), y.alias("b"))
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    # item frequencies over the KEPT baskets (so support/lift stay
    # consistent when the size cap drops a basket)
    counts = (
        baskets.select(F.explode("ms").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n_item"))
    )
    n_baskets = baskets.count()
    ca = counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("_ca")
    )
    cb = counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("_cb")
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(F.col("n_pair") / F.lit(float(n_baskets)), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_pair")
                * F.lit(float(n_baskets))
                # _ca cast first: a long*long product of two ubiquitous
                # items overflows at 1e10 baskets; the double result
                # feeds a double division anyway
                / (F.col("_ca").cast("double") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )
