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


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 4,
    max_frames: int = 8,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame sampling over a video-like blob: one output row per sampled
    frame (id, frame_idx, frame binary, n_bytes). The deterministic fake
    treats the blob as consecutive ``frame_size``-byte frames and keeps
    every ``stride``-th one up to ``max_frames`` — a real decoder slots
    into the same Arrow-batched loop (real keyframe extraction is av/
    ffmpeg; not in this container). The explode direction (one blob ->
    many frame rows) is the shape that matters at scale: downstream
    per-frame work repartitions freely, and the blob itself is read once.
    """
    schema = f"{id_col} long, frame_idx int, frame binary, n_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "frame": [], "n_bytes": []}
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(raw) if raw is not None else b""
                n_total = (len(data) + frame_size - 1) // frame_size
                for k, fi in enumerate(range(0, n_total, stride)):
                    if k >= max_frames:
                        break
                    frame = data[fi * frame_size : (fi + 1) * frame_size]
                    out[id_col].append(i)
                    out["frame_idx"].append(fi)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def resize_blob(
    df: DataFrame,
    target_bytes: int = 256,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Resize plumbing: (id, resized binary of EXACTLY target_bytes). The
    deterministic fake truncates or cycles the payload to the target size
    (a real impl decodes, resizes WxH, re-encodes — Pillow not in this
    container); schema/batching/partition behavior are the real contract."""
    schema = f"{id_col} long, resized binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for raw in pdf[blob_col]:
                data = bytes(raw) if raw is not None else b""
                if not data:
                    res.append(b"\x00" * target_bytes)
                else:
                    reps = (target_bytes + len(data) - 1) // len(data)
                    res.append((data * reps)[:target_bytes])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": res})

    return df.select(id_col, blob_col).mapInPandas(run, schema)


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
