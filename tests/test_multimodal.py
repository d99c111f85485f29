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


def test_sample_frames_shape_and_determinism(spark):
    rows = [(1, bytes(range(200))), (2, b""), (3, b"x" * 64)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    from grape_vector_db_spark.operators import multimodal

    out = multimodal.sample_frames(df, frame_size=64, stride=2, max_frames=2)
    got = {(r["doc_id"], r["frame_idx"]): (bytes(r["frame"]), r["n_bytes"]) for r in out.collect()}
    # doc 1: 200 bytes -> 4 frames (0..3), stride 2 keeps 0 and 2
    assert set(k for k in got if k[0] == 1) == {(1, 0), (1, 2)}
    assert got[(1, 0)] == (bytes(range(64)), 64)
    assert got[(1, 2)] == (bytes(range(128, 192)), 64)
    # doc 2: empty -> no frames; doc 3: one exact frame
    assert not any(k[0] == 2 for k in got)
    assert got[(3, 0)] == (b"x" * 64, 64)


def test_resize_blob_exact_size(spark):
    rows = [(1, b"abc"), (2, b""), (3, b"z" * 1000)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    from grape_vector_db_spark.operators import multimodal

    got = {r["doc_id"]: bytes(r["resized"]) for r in
           multimodal.resize_blob(df, target_bytes=8).collect()}
    assert got[1] == b"abcabcab"      # cycled
    assert got[2] == b"\x00" * 8      # empty -> zero padding
    assert got[3] == b"z" * 8         # truncated
