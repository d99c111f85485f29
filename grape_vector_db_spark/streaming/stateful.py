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
