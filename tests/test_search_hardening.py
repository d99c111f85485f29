"""search/fusion/sparse hardening pins (self-review findings):

1. hydrate never shuffles the documents table: the old
   `docs RIGHT OUTER broadcast(results)` hinted the PRESERVED side
   (unsupported build side — silently dropped, full SortMergeJoin);
   the fixed shape is semi-gate + broadcast left join, plan-pinned.
2. phrase_search tokenizes the query with the corpus side's WS_SPLIT
   class (str.split() also breaks on \\x1c-\\x1f).
3. knn_label_vote: unlabeled neighbors don't vote (a NULL vote group
   used to WIN ties via NULLS FIRST).
4. mmr_rerank survives NULL candidate scores (NaN relevance used to
   crash the stage on an empty argmin).
5. matryoshka_search rejects rescore < k (silent under-fill).
6. recommend_batch keeps its driver artifacts bounded (was one
   collected row per user on the happy path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import search, sparse


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestHydratePlan:
    def test_no_corpus_shuffle(self, spark, docs):
        results = spark.createDataFrame(
            [(1, 0.9), (5, 0.8)], "doc_id long, score double"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = search.hydrate(results, docs, columns=["lang"])
            plan = _plan(out)
            # only the explicit hints can produce these with
            # auto-broadcast off — the pre-fix shape planned SMJ here
            assert "SortMergeJoin" not in plan
            assert plan.count("BroadcastHashJoin") == 2  # semi + left
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_missing_doc_keeps_result_row(self, spark, docs):
        results = spark.createDataFrame(
            [(1, 0.9), (10_000_000, 0.8)], "doc_id long, score double"
        )
        rows = {
            r["doc_id"]: r
            for r in search.hydrate(results, docs, columns=["lang"]).collect()
        }
        assert rows[1]["lang"] is not None
        assert rows[10_000_000]["lang"] is None  # preserved, null-hydrated


def test_phrase_search_matches_ws_split_tokens(spark):
    # '\x1c' is NOT whitespace to WS_SPLIT: the corpus indexes ONE token
    # 'new\x1cyork'; str.split() would split the query into two and
    # search for an adjacency that cannot exist
    df = spark.createDataFrame(
        [(1, "visit new\x1cyork today")], "doc_id long, text string"
    )
    out = sparse.phrase_search(df, "new\x1cyork today").collect()
    assert [(r["doc_id"], r["n_matches"]) for r in out] == [(1, 1)]


def test_knn_label_vote_null_labels_do_not_vote(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "cat"),
         (2, [0.99, 0.01], "cat"),
         (3, [0.98, 0.02], None),
         (4, [0.97, 0.03], None)],
        "vec_id long, embedding array<double>, label string",
    )
    anchors = emb.where(F.col("vec_id") == 1)
    out = {
        r["vec_id"]: r["pred_label"]
        for r in search.knn_label_vote(emb, anchors, k=3).collect()
    }
    # anchor 1's neighborhood is {2:cat, 3:NULL, 4:NULL} — the 2-vote
    # NULL group used to beat the real label via NULLS FIRST
    assert out[1] == "cat"


def test_mmr_rerank_survives_null_scores(spark):
    cand = spark.createDataFrame(
        [(0, 1, [1.0, 0.0], 0.9),
         (0, 2, [0.0, 1.0], None),
         (0, 3, [0.5, 0.5], 0.7)],
        "query_id long, id long, embedding array<double>, score double",
    )
    rows = search.mmr_rerank(cand, k=3).collect()
    assert {r["id"] for r in rows} == {1, 3}  # unscored row dropped


def test_matryoshka_rejects_rescore_below_k(spark, emb):
    with pytest.raises(ValueError, match="rescore"):
        search.matryoshka_search(emb, [0.0] * 16, dims=8, k=20, rescore=10)


def test_recommend_batch_error_paths_stay_bounded(spark, emb):
    ex = spark.createDataFrame(
        [(1, 3, 1), (2, 5, -1)],  # user 2 has no positive
        "user_id long, example_id long, polarity int",
    )
    with pytest.raises(ValueError, match="lacking a positive"):
        search.recommend_batch(emb, ex)
    ex2 = spark.createDataFrame(
        [(1, 99_999_999, 1)], "user_id long, example_id long, polarity int"
    )
    with pytest.raises(KeyError, match="not found"):
        search.recommend_batch(emb, ex2)
