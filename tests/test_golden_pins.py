"""Golden-value pins from the reference's own unit tests (FIXTURES.md §6).

Each pin cites the reference test it reproduces; these lock our semantics
to the reference's, independent of the DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from grape_vector_db_spark.functions.text import mock_embedding_py, tokens
from grape_vector_db_spark.functions.vector import (
    cosine_similarity,
    to_double_array,
    vector_lit,
)
from grape_vector_db_spark.operators.fusion import rrf_fuse
from grape_vector_db_spark.operators.quantization import pack_bits
from grape_vector_db_spark.operators.sparse import tokenize_query_py


def test_tokenizer_pin(spark):
    # src/sparse.rs:393-401: keeps 'test','document'; drops stopwords 'is','a'
    df = spark.createDataFrame(
        [("This is a test document with some words.",)], "text string"
    )
    toks = df.select(tokens("text").alias("t")).head()["t"]
    assert "test" in toks and "document" in toks
    assert "is" not in toks and "a" not in toks
    # length<=1 dropped, punctuation stripped
    assert all(len(t) > 1 for t in toks)


def test_tokenizer_relative_tf():
    # src/sparse.rs:303-314: tf is relative frequency
    tf = tokenize_query_py("alpha beta alpha gamma")
    assert math.isclose(tf["alpha"], 0.5)
    assert math.isclose(tf["beta"], 0.25)


def test_quantization_pin(spark):
    # src/quantization.rs:360-371: [0.5,-0.3,0.8,-0.1,0.2] -> bits 1,0,1,0,1
    df = spark.createDataFrame([(1, [0.5, -0.3, 0.8, -0.1, 0.2])], "id int, v array<float>")
    packed = pack_bits(df, id_col="id", vec_col="v").head()
    # 5 bits MSB-first in a 32-bit word: 10101 << 27
    assert packed["packed"] == [0b10101 << 27]
    assert packed["dimension"] == 5


def test_cosine_zero_vector(spark):
    # src/storage.rs:860-862: zero-norm vector -> similarity 0.0
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id int, v array<float>")
    out = df.select(
        cosine_similarity(to_double_array("v"), vector_lit([1.0, 2.0, 3.0])).alias("c")
    ).head()
    assert out["c"] == 0.0


def test_rrf_two_lists_beat_one(spark):
    # src/hybrid.rs:991-1025: a doc in 2 lists outranks docs in 1 list
    a = spark.createDataFrame([(1, 0.9), (2, 0.8)], "doc_id int, score double")
    b = spark.createDataFrame([(1, 0.5), (3, 0.95)], "doc_id int, score double")
    fused = rrf_fuse({"dense": a, "sparse": b}).collect()
    assert fused[0]["doc_id"] == 1
    # rank-1 in both lists: 1/61 + 1/62
    assert math.isclose(fused[0]["score"], round(1 / 61 + 1 / 62, 6), abs_tol=1e-6)


def test_mock_embedding_fixture():
    # src/embeddings.rs:229-250 determinism + normalization
    v1 = mock_embedding_py("hello world", 8)
    v2 = mock_embedding_py("hello world", 8)
    assert v1 == v2
    assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-9)
    assert mock_embedding_py("other", 8) != v1


def test_bm25_idf_formula(spark, docs):
    # src/sparse.rs:202-204: idf = ln((N - df + 0.5)/(df + 0.5)) — verify one
    # term end-to-end through the pipeline
    from grape_vector_db_spark.operators.sparse import (
        bm25_search,
        doc_terms,
        term_stats,
    )

    terms = doc_terms(docs)
    n = terms.select("doc_id").distinct().count()
    row = term_stats(terms).where(F.col("term") == "vector").head()
    expected_idf = math.log((n - row["df"] + 0.5) / (row["df"] + 0.5))
    # single-term query: score sign matches idf sign for every result
    res = bm25_search(docs, "vector", k=5).collect()
    assert len(res) > 0
    for r in res:
        assert (r["score"] > 0) == (expected_idf > 0)
