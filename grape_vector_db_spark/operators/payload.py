"""Payload posting index building blocks — shared by the facade
(``GrapeVectorDB.build_index('payload')``) and the streaming twin
(``streaming.ingest.stream_payload_index_to_parquet``).

The reference evaluates payload conditions by scanning the store row by
row (ref:src/filtering.rs:439-488); a per-field keyword index — the
narrow ``(field, value, vec_id)`` posting table — is the structure that
turns the equality case into an index probe. Field-partitioned and
value-sorted, an equality filter reads ONE field's directory with the
value pushed to parquet row-group stats; AND-of-equality trees intersect
posting lists; a bounded per-field value histogram funds the planner's
selectivity estimate exactly, with zero query-time jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fields with more distinct values than this store only their distinct
# count in the sidecar (an equality on them estimates as 1/n_distinct);
# keyword-ish fields below the bound store exact per-value counts.
HIST_MAX = 64


def array_fields(docs: DataFrame, cols: list[str]) -> list[str]:
    """The subset of ``cols`` that are array-typed in ``docs`` — these
    post one row per DISTINCT element (the ArrayContains probe shape)
    instead of one per value. Driver-side schema inspection only."""
    from pyspark.sql.types import ArrayType

    return [
        c for c in cols if isinstance(docs.schema[c].dataType, ArrayType)
    ]


def payload_postings(
    docs: DataFrame, cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """(field, value, vec_id) posting rows for a documents slice. Values
    are Spark-cast to string (query literals go through the SAME cast, so
    both sides format identically by construction); nulls drop — an
    equality can never match them, and the general predicate path owns
    null semantics.

    Array-typed columns post one row per DISTINCT element (explode +
    dedupe): an ``array_contains`` filter then probes postings exactly
    like an equality does, and a duplicated element can neither multiply
    intersection rows nor double-count in the histogram (which thereby
    counts DOCS containing the value — the fraction selectivity needs)."""
    arr = set(array_fields(docs, cols))
    parts = []
    for c in cols:
        if c in arr:
            p = (
                docs.select(
                    F.lit(c).alias("field"),
                    F.explode(c).alias("el"),
                    F.col(id_col).alias("vec_id"),
                )
                .select(
                    "field",
                    F.col("el").cast("string").alias("value"),
                    "vec_id",
                )
                .where(F.col("value").isNotNull())
                .distinct()
            )
        else:
            p = docs.select(
                F.lit(c).alias("field"),
                F.col(c).cast("string").alias("value"),
                F.col(id_col).alias("vec_id"),
            ).where(F.col("value").isNotNull())
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def payload_layout(postings: DataFrame) -> DataFrame:
    """The serving shape: one directory per field, value-sorted within so
    parquet min/max stats skip row groups on the value predicate."""
    return postings.repartition("field").sortWithinPartitions("field", "value")


def payload_sidecar_stats(
    postings: DataFrame,
    cols: list[str],
    doc_rows: int,
    hist_max: int = HIST_MAX,
    arr_fields: list[str] | None = None,
) -> dict:
    """The _STATS sidecar payload: indexed columns, the BOUNDED per-field
    value histogram, and the corpus row count the fractions divide by.
    Costs two small aggregate jobs over the narrow posting table at
    build/refresh time — never at query time (the planner reads the
    sidecar driver-side)."""
    per_field = {
        r["field"]: int(r["nd"])
        for r in postings.groupBy("field")
        .agg(F.countDistinct("value").alias("nd"))
        .collect()
    }
    small = [f for f, nd in per_field.items() if nd <= hist_max]
    hist: dict[str, dict] = {
        f: {"n_distinct": nd} for f, nd in per_field.items() if nd > hist_max
    }
    if small:
        for r in (
            postings.where(F.col("field").isin(small))
            .groupBy("field", "value")
            .count()
            .collect()
        ):
            hist.setdefault(r["field"], {})[r["value"]] = int(r["count"])
    # indexed-but-absent fields (all-null or empty corpus) still get an
    # entry so the planner knows the field is covered
    for c in cols:
        hist.setdefault(c, {})
    return {
        "payload_columns": list(cols),
        "histograms": hist,
        "doc_rows": int(doc_rows),
        # which indexed fields are array-typed: an equals probe must NOT
        # serve from per-element postings (whole-array equality), and an
        # array_contains probe only makes sense against them — route
        # validation reads this driver-side
        "array_fields": sorted(arr_fields or []),
    }
