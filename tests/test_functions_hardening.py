"""functions/selection/sampling/evaluation/multimodal hardening pins:

1. mock_embedding indexes UTF-8 BYTES (the reference formula and
   mock_embedding_py): the SQL expr used CHARACTERS, so SQL vs Python
   embedders diverged on any non-ASCII text.
2. dsir_log_weights counts NULL-target rows as RAW (the docstring's
   "every other row" — they used to vanish from both distributions).
3. uniform_sample_n sorts NULL ids LAST (they hashed to NULL and
   deterministically occupied every sample).
4. class_centroid_metrics / semantic_outliers exclude NULL-vector rows
   from scoring (coalesced 0.0 cosines polluted the metrics);
   embedding_covariance filters NULL-element rows (the GEMM spread
   their NaN over whole covariance rows) and picks the canonical dim
   deterministically.
5. multimodal feature kernels skip NULL blobs instead of raising
   bytes(None) TypeErrors mid-stage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.functions.text import (
    mock_embedding_py,
    mock_embedding_raw,
    normalize_vector,
)
from grape_vector_db_spark.operators import evaluation, sampling, selection


def test_mock_embedding_sql_matches_python_on_non_ascii(spark):
    texts = ["hello", "的了在是", "naïve café", "混合 mixed 文本"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: list(r["v"])
        for r in df.select(
            "doc_id",
            normalize_vector(mock_embedding_raw("text", 8)).alias("v"),
        ).collect()
    }
    for i, t in enumerate(texts):
        want = mock_embedding_py(t, 8)
        got = out[i]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), t


def test_dsir_null_target_rows_count_as_raw(spark):
    rows = [
        (1, "alpha beta gamma alpha beta", "wiki"),
        (2, "alpha beta gamma alpha beta", "web"),
        (3, "alpha beta gamma alpha beta", None),  # NULL source
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = F.col("source") == "wiki"
    out = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_log_weights(df, target).collect()
    }
    # docs 2 and 3 share identical text: if the NULL row joined the raw
    # model (the contract), both score identically; pre-fix doc 3's
    # bigrams vanished from the raw counts and the weights diverged
    assert out[2] == out[3]


def test_uniform_sample_prefers_real_ids_over_null(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,), (3,)], "id long"
    )
    got = [r["id"] for r in sampling.uniform_sample_n(df, 3, "id").collect()]
    assert None not in got  # NULLs sorted FIRST pre-fix


class TestEvaluationNullVectors:
    def test_centroid_metrics_exclude_null_members(self, spark):
        rows = [
            (1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"),
            (3, None, "a"),  # NULL member polluted the averages
            (4, [0.0, 1.0], "b"),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string"
        )
        out = {
            r["label"]: r
            for r in evaluation.class_centroid_metrics(emb).collect()
        }
        assert out["a"]["n_members"] == 2
        assert out["a"]["nn_accuracy"] == 1.0  # was deflated by row 3
        assert out["a"]["mean_intra_cosine"] > 0.9

    def test_covariance_filters_null_elements(self, spark):
        rows = [
            (1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [None, 5.0]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        vals = [
            r["cov"] for r in evaluation.embedding_covariance(emb).collect()
        ]
        assert all(v == v for v in vals)  # no NaN leaked from row 3

    def test_covariance_dim_is_deterministic_mode(self, spark):
        rows = [(1, [1.0]), (2, [1.0, 2.0]), (3, [3.0, 4.0])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = evaluation.embedding_covariance(emb).collect()
        # dominant dimension (2) wins regardless of row order
        assert {(r["i"], r["j"]) for r in out} == {(0, 0), (0, 1), (1, 1)}


def test_multimodal_null_blob_skipped(spark):
    from grape_vector_db_spark.operators import multimodal

    ppm = b"P6\n2 2\n255\n" + bytes(range(12))  # valid 2x2 P6 image
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, None)], "doc_id long, blob binary"
    )
    # raises TypeError pre-fix; post-fix the NULL row is simply absent
    out = multimodal.average_hash(df, blob_col="blob").collect()
    assert [r["doc_id"] for r in out] == [1]
