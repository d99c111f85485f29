"""Multimodal binary-column plumbing tests (decode itself is stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.functions.text import mock_embedding, mock_embedding_py
from grape_vector_db_spark.operators import multimodal


@pytest.fixture()
def blobs(spark):
    return spark.createDataFrame(
        [(1, bytearray(b"\x10\x20\x30\x40\x50")), (2, bytearray(b"\xff")), (3, None)],
        "doc_id long, blob binary",
    )


def test_blob_metadata(spark, blobs):
    rows = {r["doc_id"]: r for r in multimodal.blob_metadata(blobs).collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[2]["n_bytes"] == 1
    assert rows[3]["n_bytes"] is None


def test_extract_features_stub(spark, blobs):
    rows = {r["doc_id"]: r for r in multimodal.extract_features(blobs).collect()}
    assert rows[1]["n_bytes"] == 5
    # first FEATURE_DIM bytes scaled
    assert abs(rows[1]["feature"][0] - 0x10 / 255.0) < 1e-6
    # short blob zero-padded to FEATURE_DIM
    assert rows[2]["feature"][1] == 0.0
    assert len(rows[2]["feature"]) == multimodal.FEATURE_DIM
    # null blob -> zero bytes, zero feature
    assert rows[3]["n_bytes"] == 0


def test_decode_stub_raises(spark, blobs):
    with pytest.raises(Exception):
        multimodal.extract_features(blobs, use_stub_decoder=False).collect()


def test_mock_embedding_expr_matches_python(spark):
    """Column-expression embedder == pure-Python replica (f64 semantics)."""
    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], "id long, text string")
    rows = {
        r["id"]: list(r["v"])
        for r in df.select("id", mock_embedding("text", 8).alias("v")).collect()
    }
    for text, i in [("hello world", 1), ("spark", 2)]:
        expected = mock_embedding_py(text, 8)
        got = rows[i]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, expected)), (got, expected)
