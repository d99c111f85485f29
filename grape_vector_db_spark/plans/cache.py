"""Query-result cache (reference §2.11: moka LRU keyed on the stringified
query, src/query_engine.rs:42-67, 126-144).

In a batch engine the analogue is keeping the *DataFrame* (and its
persisted blocks) for a repeated query signature instead of re-planning and
re-scanning. The cache holds lazy DataFrames; Spark's block manager owns
the actual memory (LRU-evicted under pressure), so this layer only manages
identity + explicit invalidation — no size accounting needed.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame


class QueryCache:
    """Keyed persist registry with FIFO capacity (oldest unpersisted)."""

    def __init__(self, capacity: int = 64) -> None:
        self.capacity = capacity
        self._entries: OrderedDict[str, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: str, compute: Callable[[], DataFrame]) -> DataFrame:
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        df = compute().persist()
        self._entries[key] = df
        while len(self._entries) > self.capacity:
            _, old = self._entries.popitem(last=False)
            old.unpersist()
        return df

    def invalidate(self, key: str | None = None) -> None:
        """Drop one key, or everything (None) — e.g. after an ingest batch."""
        if key is None:
            for df in self._entries.values():
                df.unpersist()
            self._entries.clear()
        elif key in self._entries:
            self._entries.pop(key).unpersist()

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0
