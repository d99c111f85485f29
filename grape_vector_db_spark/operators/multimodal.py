"""Multimodal (binary) column operators — LLM-data-pipeline addition.

A 100 TB training corpus carries images/audio/video as opaque ``binary``
columns plus typed metadata. The engine treats them as first-class:

- ``blob_metadata``: byte length + content hash as JVM expressions (no
  Python) — the cheap full-corpus pass.
- ``extract_features``: Arrow-batched ``mapInPandas`` over the binary
  column — THE pattern for decode/resize/frame-sample at scale: Spark
  handles partitioning/batching, Python sees a pandas iterator of
  ``bytes`` values, and each batch amortizes the serialization. The
  actual image/audio decode is STUBBED (``decode_image`` raises
  NotImplementedError — decode libs are not in this container); the
  deterministic fake featurizer keeps the plumbing (schema, batch shape,
  partition behavior) real and testable.

At scale: binary payloads dominate row size, so steps that don't need the
bytes must select around the blob column (column pruning keeps it unread
in parquet); ``extract_features`` repartitions by count, not bytes, so
callers should size partitions via ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4


def blob_metadata(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """(id, n_bytes, content_md5) — pure JVM expressions over the blob."""
    return df.select(
        F.col(id_col),
        F.length(F.col(blob_col)).alias("n_bytes"),
        F.md5(F.col(blob_col)).alias("content_md5"),
    )


def decode_image(data: bytes):  # pragma: no cover - intentional stub
    """STUB: real deployments plug Pillow/av here; the container has no
    image/audio decode libraries. The Spark-side contract (bytes in,
    ndarray out) is what matters."""
    raise NotImplementedError(
        "image decode requires Pillow/av; not available in this environment"
    )


def _fake_feature(data: bytes) -> list[float]:
    """Deterministic featurizer standing in for a decoder+model: first
    FEATURE_DIM bytes scaled to [0,1] (zero-padded)."""
    pad = data[:FEATURE_DIM] + b"\x00" * max(0, FEATURE_DIM - len(data))
    return [b / 255.0 for b in pad]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    use_stub_decoder: bool = True,
) -> DataFrame:
    """mapInPandas featurization: (id, n_bytes, feature array<float>).

    ``use_stub_decoder=False`` routes through :func:`decode_image` (raises
    here; swap in a real decoder in production).
    """
    schema = f"{id_col} long, n_bytes int, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            feats = []
            for raw in blobs:
                data = bytes(raw) if raw is not None else b""
                if not use_stub_decoder:
                    decode_image(data)
                feats.append(_fake_feature(data))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)
