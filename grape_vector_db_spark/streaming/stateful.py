"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (SURVEY §2.9); this is the
capability-addition tier: exactly-once-per-content deduplication across
micro-batches — the streaming twin of dedup.exact_duplicates, and the shape
any custom stateful operator takes in this engine:

  groupBy(state key) -> applyInPandasWithState(fn, output, state, "append")

State lives in the checkpoint (RocksDB/HDFS state store at scale), keyed by
content hash; each micro-batch sees only its group's rows plus its state.
Emitting only first occurrences makes downstream ingestion idempotent per
content, regardless of how duplicates arrive across batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Emit each distinct content exactly once across the stream's lifetime.

    Output: (content_hash, doc_id, text) — the FIRST-seen row per content
    (lowest id within the batch for determinism). Later duplicates, in the
    same or any later micro-batch, are dropped via the keyed state.
    """
    hashed = stream_df.withColumn("content_hash", F.md5(F.col(text_col)))
    out_schema = f"content_hash string, {id_col} long, {text_col} string"
    state_schema = "seen long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        seen = state.get[0] if state.exists else 0
        first_rows = []
        total = seen
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if total == 0:
                first = pdf.sort_values(id_col).iloc[[0]]
                first_rows.append(
                    pd.DataFrame(
                        {
                            "content_hash": [content_hash],
                            id_col: first[id_col].values,
                            text_col: first[text_col].values,
                        }
                    )
                )
            total += len(pdf)
        state.update((total,))
        if first_rows:
            yield from first_rows

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Event-time sessionization across micro-batches — the streaming twin
    of the batch `events_sessions` query, and the canonical custom
    stateful operator: per-user state (session start, last ts, count)
    lives in the checkpointed state store; a session CLOSES (one output
    row) when a later event for the same user arrives more than
    ``gap_seconds`` after the previous one.

    ``ts_col`` is epoch MICROSECONDS as long — integer state round-trips
    every engine identically (the lesson of the nanos testdata). Closure
    is event-time driven (deterministic, replayable); the still-open
    tail session stays in state — production would add a
    ProcessingTimeTimeout flush, which is wall-clock and untestable
    deterministically, so it is deliberately not the default.

    Output: (user_id, session_start, session_end, n_events), all long.
    """
    gap_us = int(gap_seconds) * 1_000_000
    out_schema = (
        f"{user_col} long, session_start long, session_end long, n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        ts_sorted: list[int] = []
        for pdf in pdfs:
            ts_sorted.extend(int(t) for t in pdf[ts_col])
        for ts in sorted(ts_sorted):
            if start is None:
                start = last = ts
                n = 1
            elif ts - last > gap_us:
                closed.append((user, start, last, n))
                start = last = ts
                n = 1
            else:
                last = max(last, ts)
                n += 1
        if start is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[user_col, "session_start", "session_end", "n_events"],
            )

    return stream_df.select(user_col, ts_col).groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
