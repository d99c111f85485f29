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
    (lowest id within the batch for determinism, across ALL of the
    group's Arrow chunks). Later duplicates, in the same or any later
    micro-batch, are dropped via the keyed state; only the two needed
    columns are shuffled into the state operator.
    """
    hashed = stream_df.withColumn("content_hash", F.md5(F.col(text_col)))
    # derive the id type from the input — a hard-coded `long` would make
    # string ids fail (or corrupt) in the executor's Arrow conversion
    id_type = dict(hashed.dtypes)[id_col]
    out_schema = f"content_hash string, {id_col} {id_type}, {text_col} string"
    state_schema = "seen long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        if state.exists:
            # already emitted in an earlier batch: drain the iterator,
            # no state rewrite (the marker is a constant — rewriting it
            # per batch is pure state-store churn)
            for _ in pdfs:
                pass
            return
        # the batch minimum must consider EVERY Arrow chunk — a group
        # larger than arrow.maxRecordsPerBatch spans several pdfs and
        # sorting only the first would make the pick nondeterministic
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(id_col).iloc[[0]]
            if best is None or cand[id_col].iloc[0] < best[id_col].iloc[0]:
                best = cand
        if best is None:
            return
        state.update((1,))
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                id_col: best[id_col].values,
                text_col: best[text_col].values,
            }
        )

    return hashed.select("content_hash", id_col, text_col).groupBy(
        "content_hash"
    ).applyInPandasWithState(
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
    user_type = dict(stream_df.dtypes)[user_col]
    out_schema = (
        f"{user_col} {user_type}, session_start long, session_end long,"
        " n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        # interval-merge sweep: each event is a singleton interval, the
        # open state session is an interval too; merging intervals whose
        # gap is <= gap_us reproduces the batch sessionizer exactly over
        # everything not yet emitted — including LATE events older than
        # the open session (the old last-ts-only rule silently absorbed
        # them without lowering session_start). A late event older than
        # an already-CLOSED session still cannot reopen it — that is the
        # inherent streaming-emission horizon, noted in the docstring.
        intervals: list[list] = []
        for pdf in pdfs:
            # nullable longs arrive as float64 with NaN — a null ts must
            # not kill the query
            for t in pdf[ts_col].dropna():
                intervals.append([int(t), int(t), 1])
        if state.exists:
            st, la, n0 = state.get
            intervals.append([st, la, n0])
        if not intervals:
            return
        intervals.sort()
        merged: list[list] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)
        *closed, tail = merged
        state.update((tail[0], tail[1], tail[2]))
        if closed:
            yield pd.DataFrame(
                [(user, c[0], c[1], c[2]) for c in closed],
                columns=[user_col, "session_start", "session_end", "n_events"],
            )

    return stream_df.select(user_col, ts_col).groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
