"""SQL function registry + retrieval-quality evaluation tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from grape_vector_db_spark.functions.registry import register_sql_functions
from grape_vector_db_spark.operators import evaluation, search


def test_sql_registry_cosine_matches_kit(spark, emb):
    names = register_sql_functions(spark)
    assert {"cosine_sim", "l2_norm", "euclidean_dist", "hamming_dist"} <= set(names)
    emb.createOrReplaceTempView("emb_v")
    sql_rows = spark.sql(
        """
        WITH q AS (SELECT cast(embedding as array<double>) qv FROM emb_v WHERE vec_id = 0)
        SELECT vec_id, round(cosine_sim(cast(embedding as array<double>), q.qv), 6) AS score
        FROM emb_v, q ORDER BY score DESC, vec_id LIMIT 5
        """
    ).collect()
    qv = search.query_vector_of(emb, 0)
    kit_rows = search.knn(emb, qv, k=5).collect()
    assert [(r["vec_id"], r["score"]) for r in sql_rows] == [
        (r["vec_id"], r["score"]) for r in kit_rows
    ]


def test_sql_registry_hamming(spark):
    register_sql_functions(spark)
    row = spark.sql("SELECT hamming_dist(array(5L), array(3L)) AS h").head()
    assert row["h"] == 2  # 101 ^ 011 = 110


def test_retrieval_metrics_known_values(spark):
    # query A: retrieved [1,2,3], relevant {1,3,9} -> P@3=2/3, R=2/3
    results = spark.createDataFrame(
        [("A", 1, 1), ("A", 2, 2), ("A", 3, 3)], "query_id string, doc_id int, rank int"
    )
    truth = spark.createDataFrame(
        [("A", 1), ("A", 3), ("A", 9)], "query_id string, doc_id int"
    )
    m = evaluation.retrieval_metrics(results, truth, k=3).head()
    assert math.isclose(m["precision_3"], 2 / 3, abs_tol=1e-6)
    assert math.isclose(m["recall_3"], 2 / 3, abs_tol=1e-6)
    dcg = 1 / math.log2(2) + 1 / math.log2(4)       # hits at ranks 1 and 3
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert math.isclose(m["ndcg_3"], round(dcg / idcg, 6), abs_tol=1e-6)


def test_metrics_query_with_no_results(spark):
    # a query present in truth but absent from results -> all zeros
    results = spark.createDataFrame(
        [("A", 1, 1)], "query_id string, doc_id int, rank int"
    )
    truth = spark.createDataFrame(
        [("A", 1), ("B", 7)], "query_id string, doc_id int"
    )
    rows = {r["query_id"]: r for r in evaluation.retrieval_metrics(results, truth, k=3).collect()}
    assert rows["B"]["precision_3"] == 0.0
    assert rows["B"]["recall_3"] == 0.0
    assert rows["B"]["ndcg_3"] == 0.0


def test_compare_fusion_strategies(spark, docs, emb):
    qv = search.query_vector_of(emb, 0)
    lists = {
        "dense": search.knn(emb, qv, k=20).withColumnRenamed("vec_id", "doc_id"),
        "text": docs.select("doc_id", F.lit(1.0).alias("score")).limit(20),
    }
    # ground truth = exact dense top-10 (recall of fusion vs pure dense)
    truth = (
        search.knn(emb, qv, k=10)
        .select(F.lit("q0").alias("query_id"), F.col("vec_id").alias("doc_id"))
    )
    out = evaluation.compare_fusion_strategies(lists, truth, "q0", k=10)
    rows = {r["strategy"]: r for r in out.collect()}
    assert set(rows) == {"rrf", "linear", "normalized"}
    for r in rows.values():
        assert 0.0 <= r["recall_10"] <= 1.0
    # linear with default 0.7 dense weight must recover most dense hits
    assert rows["linear"]["recall_10"] >= 0.5


def test_sql_registry_round4_functions(spark):
    names = register_sql_functions(spark)
    assert {"dot_product", "h32", "decay_weight", "jaccard_tokens"} <= set(names)
    r = spark.sql(
        """
        SELECT dot_product(array(1D, 2D), array(3D, 4D)) AS d,
               jaccard_tokens(array('a','b'), array('b','c')) AS j,
               decay_weight(timestamp'2024-01-01', timestamp'2024-01-08', 7D) AS w,
               h32('x', 0) AS h
        """
    ).head()
    assert r["d"] == 11.0
    assert abs(r["j"] - 1 / 3) < 1e-9
    assert abs(r["w"] - 0.5) < 1e-12
    # SQL h32 must equal the DataFrame kit's h32
    from grape_vector_db_spark.functions.hashing import h32 as kit_h32
    from pyspark.sql import functions as F

    kit = (
        spark.range(1)
        .select(kit_h32(F.lit("x"), 0).alias("h"))
        .head()["h"]
    )
    assert r["h"] == kit
