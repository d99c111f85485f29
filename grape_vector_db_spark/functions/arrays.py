"""Array-expression helpers shared across operators."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_pairs(arr: Column, make: Callable[[Column, Column], Column]) -> Column:
    """All (earlier, later) element pairs of ``arr`` as one flat array:
    element i pairs with every element after it, so on a SORTED array
    the pairs come out canonically ordered (a < b) with each pair
    produced exactly once — no self-join, no distinct. The grouped
    pair-explode engine shared by the banded Hamming near-dup
    (``dedup.hamming_pairs``) and market-basket co-occurrence
    (``baskets.basket_pairs``); ``make(x, y)`` builds the emitted
    struct. NB the 1-based slice: element i (0-based lambda index)
    pairs with the slice starting at position i + 2.
    """
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: make(x, y),
            ),
        )
    )
