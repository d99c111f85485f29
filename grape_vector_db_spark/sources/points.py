"""Qdrant-style Point surface (reference §1.1, src/types.rs:5-13).

A Point is ``{id, vector, payload: JSON}``. The reference stores payloads
schemaless and answers filters by flattening JSON paths into per-field
inverted indexes (src/filtering.rs:260-333). Spark-first translation:

- the points *table* is (id string, vector array<float>, payload string
  (JSON)) — built here by zipping the documents and embeddings tables;
- payload filters compile to ``get_json_object`` predicates (P6 json_path
  in operators.filters) — no index tables needed, the JSON decode happens
  inside the scan and Catalyst prunes the blob column when unused;
- for hot payload fields at 100 TB you materialize a typed column
  (``promote_payload_field``) so predicates push into parquet stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_points(
    docs: DataFrame,
    emb: DataFrame,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """(id, vector, payload) — payload is a JSON object of the selected
    document columns (id "pt_{n}" mirrors the reference fixtures)."""
    payload_cols = payload_cols or [c for c in docs.columns if c != doc_id]
    payload = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    d = docs.select(F.col(doc_id).alias("_id"), payload.alias("payload"))
    e = emb.select(F.col(vec_id).alias("_id"), F.col(vec_col).alias("vector"))
    return d.join(e, "_id").select(
        F.concat(F.lit("pt_"), F.col("_id")).alias("id"), "vector", "payload"
    )


def payload_get(points: DataFrame, path: str, alias: str) -> DataFrame:
    """Project a JSON payload path as a column (reference nested-path
    access, src/filtering.rs:537-680)."""
    return points.withColumn(alias, F.get_json_object("payload", path))


def promote_payload_field(
    points: DataFrame, path: str, alias: str, cast_to: str = "string"
) -> DataFrame:
    """Materialize a hot payload path as a typed top-level column — written
    back to parquet this turns JSON-path predicates into min/max-prunable
    native-column predicates (the 100 TB answer to per-field indexes)."""
    return points.withColumn(
        alias, F.get_json_object("payload", path).cast(cast_to)
    )
