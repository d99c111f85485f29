"""Physical-plan regression tests.

Correctness tests pin WHAT the operators return; these pin HOW Spark
executes them — the properties that make the 100 TB story true. If a
refactor silently introduces a shuffle into the k-NN scan or drops the
parquet filter pushdown, these fail even though results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grape_vector_db_spark.operators import search, sparse
from grape_vector_db_spark.operators.search import query_vector_of


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_knn_is_shuffle_free(spark, emb):
    """J1/J9: single-query k-NN must be scan -> project -> TakeOrdered;
    zero Exchange (the per-partition-heap + driver-merge shape)."""
    qv = query_vector_of(emb, 0)
    plan = plan_of(search.knn(emb, qv, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_knn_batch_broadcasts_queries(spark, emb):
    """Batch k-NN must broadcast the query side (corpus scanned once, no
    corpus shuffle before scoring)."""
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = plan_of(search.knn_batch(emb, queries, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_filter_pushdown_reaches_parquet(spark):
    """P10/P11: simple predicates must appear as PushedFilters in the scan.

    Uses orders.parquet — the documents/embeddings fixtures are cached, and
    Spark substitutes a cached relation into ANY new plan over the same
    file, which replaces the parquet scan with InMemoryTableScan."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = plan_of(
        orders.where("o_orderstatus = 'F' AND o_totalprice >= 1000.0").select(
            "o_orderkey"
        )
    )
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    # the PushedFilters list is truncated in toString; the prefix is enough
    assert "GreaterThanOrEqual(" in plan


def test_column_pruning_reaches_parquet(spark):
    """P1: a two-column projection must not read the full schema."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = plan_of(orders.select("o_orderkey", "o_orderstatus"))
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>" in plan


def test_bm25_uses_broadcast_joins(spark, docs):
    """J4: the query-term and stats joins must be broadcast (no sort-merge
    join of the posting table against a 5-row query side)."""
    plan = plan_of(sparse.bm25_search(docs, "spark query join", k=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_point_lookup_pushdown(spark):
    # uncached table: see test_filter_pushdown_reaches_parquet
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = plan_of(orders.where(F.col("o_orderkey") == 42))
    assert "PushedFilters" in plan and "EqualTo(o_orderkey,42)" in plan


def test_hydrate_broadcasts_result_side(spark, docs, emb):
    qv = query_vector_of(emb, 0)
    res = search.knn(emb, qv, k=5).withColumnRenamed("vec_id", "doc_id")
    plan = plan_of(search.hydrate(res, docs, columns=["lang"]))
    assert "BroadcastHashJoin" in plan
