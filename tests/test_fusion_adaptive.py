"""Learned/adaptive fusion + query cache tests (reference §2.10/§2.11)."""

from __future__ import annotations

import math

from grape_vector_db_spark.operators import fusion
from grape_vector_db_spark.plans.cache import QueryCache


def test_classify_query():
    # src/hybrid.rs:777-787
    assert fusion.classify_query("a long semantic sentence query here") == "semantic"
    assert fusion.classify_query("word") == "keyword"
    assert fusion.classify_query("two words now") == "mixed"


def test_predict_weights_length_factor():
    # dense * 1.2 capped at 1.0 for long queries; * 0.8 for short
    w = fusion.predict_weights("short")
    assert math.isclose(w["dense"], 0.3 * 0.8)
    w = fusion.predict_weights("a fairly long semantic query string")
    assert math.isclose(w["dense"], min(0.8 * 1.2, 1.0))


def test_update_weights_moves_and_clamps():
    tw = {k: dict(v) for k, v in fusion.DEFAULT_TYPE_WEIGHTS.items()}
    # rising satisfaction -> weights increase (clamped)
    out = fusion.update_weights(tw, [(1, 0.2), (2, 0.9)], learning_rate=0.5)
    assert out["keyword"]["dense"] > tw["keyword"]["dense"]
    assert out["mixed"]["text"] <= 0.3  # clamp
    # single feedback row -> no delta, unchanged
    same = fusion.update_weights(tw, [(1, 0.5)])
    assert same == tw


def test_quality_adjusted_weights(spark):
    good = spark.createDataFrame(
        [(i, 0.9) for i in range(10)], "doc_id int, score double"
    )
    poor = spark.createDataFrame([(1, 0.1)], "doc_id int, score double")
    w = fusion.quality_adjusted_weights({"dense": good, "sparse": poor})
    # the higher-quality list gets the bigger boost
    assert w["dense"] / fusion.DEFAULT_WEIGHTS["dense"] > w["sparse"] / (
        fusion.DEFAULT_WEIGHTS["sparse"]
    )


def test_adaptive_fuse_history_shift(spark):
    lists = {
        "dense": spark.createDataFrame([(1, 0.9), (2, 0.5)], "doc_id int, score double"),
        "sparse": spark.createDataFrame([(2, 0.8)], "doc_id int, score double"),
        "text": spark.createDataFrame([(3, 1.0)], "doc_id int, score double"),
    }
    q = "spark fast join"
    no_hist = {r["doc_id"]: r["score"] for r in fusion.adaptive_fuse(lists, q).collect()}
    # similar query with LOW satisfaction -> dense de-weighted
    hist = spark.createDataFrame(
        [("spark fast join", 0.2)], "query_text string, satisfaction double"
    )
    with_hist = {
        r["doc_id"]: r["score"] for r in fusion.adaptive_fuse(lists, q, hist).collect()
    }
    assert with_hist[1] < no_hist[1]  # doc 1 is dense-only: score drops
    assert with_hist[3] > no_hist[3]  # doc 3 is text-only: score rises
    # dissimilar history -> no change
    far = spark.createDataFrame(
        [("completely different terms", 0.1)], "query_text string, satisfaction double"
    )
    unchanged = {
        r["doc_id"]: r["score"] for r in fusion.adaptive_fuse(lists, q, far).collect()
    }
    assert unchanged == no_hist


def test_query_cache(spark):
    cache = QueryCache(capacity=2)
    calls = []

    def make(name):
        def f():
            calls.append(name)
            return spark.createDataFrame([(1,)], "x int")
        return f

    cache.get_or_compute("a", make("a"))
    cache.get_or_compute("a", make("a"))
    assert calls == ["a"]
    assert cache.hits == 1 and cache.misses == 1
    cache.get_or_compute("b", make("b"))
    cache.get_or_compute("c", make("c"))  # evicts "a" (capacity 2)
    cache.get_or_compute("a", make("a"))
    assert calls == ["a", "b", "c", "a"]
    cache.invalidate()
    assert cache.get_or_compute("a", make("a")).count() == 1
