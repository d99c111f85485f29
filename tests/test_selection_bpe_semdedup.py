"""Round-4 pipeline additions: DSIR importance weights, SemDeDup
cluster-scoped semantic dedup, BPE merge-pair counting, and
duplicated-span coverage.

Semantics pinned on hand-built fixtures; engine parity with DuckDB is
covered by tools/check_correctness.py (dsir_weights / semdedup /
bpe_pairs / dup_spans).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import dedup, selection, textanalysis


# ---------------------------------------------------------------------------
# DSIR


def test_dsir_target_like_docs_score_higher(spark):
    # target domain talks about "neural networks"; raw about "stock market"
    rows = [
        (1, "neural networks learn fast", True),
        (2, "neural networks generalize well", True),
        (3, "stock market crashed today", False),
        (4, "stock market rally continues", False),
        # the scored doc pool contains one of each flavor
        (5, "neural networks are great", False),
        (6, "stock market is volatile", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_log_weights(df, F.col("is_t")).collect()
    }
    # target-flavored doc 5 must outscore raw-flavored doc 6
    assert out[5] > out[6]
    # in-domain docs themselves score positive, raw ones negative
    assert out[1] > 0 and out[3] < out[1]


def test_dsir_short_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "solo", False), (2, "a b c", True)],
        "doc_id long, text string, is_t boolean",
    )
    out = {
        r["doc_id"]: r
        for r in selection.dsir_log_weights(df, F.col("is_t")).collect()
    }
    assert out[1]["log_weight"] == 0.0
    assert out[1]["n_feats"] == 0
    assert out[2]["n_feats"] == 2  # "a b", "b c"


# ---------------------------------------------------------------------------
# SemDeDup


def _emb_fixture(spark):
    # two clusters; ids 1,2,3 in cluster 0 (1 and 2 identical direction),
    # ids 10,11 in cluster 1 (identical), id 3 orthogonal to 1/2
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (10, [0.0, 0.0, 1.0]),
            (11, [0.0, 0.0, 5.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (10, 1), (11, 1)], "id long, cluster int"
    )
    return emb, assigned


def test_semdedup_pairs_respect_clusters(spark):
    emb, assigned = _emb_fixture(spark)
    pairs = dedup.semdedup_pairs(emb, assigned, threshold=0.9).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # identical-direction pairs inside each cluster only; (1,10) etc.
    # would match on cosine but live in different clusters
    assert got == {(1, 2), (10, 11)}
    assert all(r["cosine"] == 1.0 for r in pairs)


def test_semdedup_prune_keeps_min_id(spark):
    emb, assigned = _emb_fixture(spark)
    pairs = dedup.semdedup_pairs(emb, assigned, threshold=0.9)
    removed = {r["vec_id"]: r for r in dedup.semdedup_prune(pairs).collect()}
    assert set(removed) == {2, 11}
    assert removed[2]["kept_by"] == 1
    assert removed[11]["kept_by"] == 10
    assert removed[2]["n_dups"] == 1


def test_semdedup_hot_cluster_subblocks(spark):
    # one cluster far larger than rows_per_block must still produce the
    # full pair set (sub-blocking covers all (i, j) block pairs)
    n = 40
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 3)]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [(i, 0) for i in range(n)], "id long, cluster int"
    )
    pairs = dedup.semdedup_pairs(
        emb, assigned, threshold=0.999999, rows_per_block=7
    ).collect()
    # identical vectors: those with equal i%3 → 3 groups of sizes 14,13,13
    expect = (14 * 13 + 13 * 12 + 13 * 12) // 2
    assert len(pairs) == expect


# ---------------------------------------------------------------------------
# BPE pair counts


def test_bpe_pair_counts_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    )
    out = {r["pair"]: r["n"] for r in textanalysis.bpe_pair_counts(df).collect()}
    # "low" x2 + "lower" x1 → "l o": 3, "o w": 3, "w </w>": 2,
    # "w e": 1, "e r": 1, "r </w>": 1
    assert out["l o"] == 3
    assert out["o w"] == 3
    assert out["w </w>"] == 2
    assert out["e r"] == 1


def test_bpe_pair_counts_topk_total_order(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    rows = textanalysis.bpe_pair_counts(df, top_k=2).collect()
    # counts: "a b"=2, "b </w>"=2, "c d"=1, "d </w>"=1 → top2 by
    # (n desc, pair asc) = "a b", "b </w>"
    assert [(r["pair"], r["n"]) for r in rows] == [("a b", 2), ("b </w>", 2)]


# ---------------------------------------------------------------------------
# dup_span_coverage


def test_dup_spans_shared_ngram(spark):
    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, shared + " alpha beta"),
            (2, shared + " gamma delta"),
            (3, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.dup_span_coverage(df, n=5).collect()}
    # docs 1/2 share exactly one 5-gram ("one two three four five"),
    # covering tokens 0..4 of 7
    assert out[1]["n_dup_ngrams"] == 1
    assert out[1]["dup_token_frac"] == pytest.approx(5 / 7, abs=1e-6)
    assert out[3]["n_dup_ngrams"] == 0
    assert out[3]["dup_token_frac"] == 0.0


def test_dup_spans_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.dup_span_coverage(df, n=5).collect()}
    # below n tokens → no n-grams, zero coverage, but rows still emitted
    assert out[1]["n_dup_ngrams"] == 0
    assert out[1]["n_tokens"] == 2


# ---------------------------------------------------------------------------
# dsir_sample (Gumbel top-n)


def test_dsir_sample_is_deterministic_topn(spark):
    from grape_vector_db_spark.operators import selection as sel

    wts = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "doc_id long, log_weight double"
    )
    a = sel.dsir_sample(wts, n=10).collect()
    b = sel.dsir_sample(wts, n=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 10
    # keys are sorted descending
    keys = [r["sample_key"] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_dsir_sample_prefers_heavy_weights(spark):
    from grape_vector_db_spark.operators import selection as sel

    # one doc with overwhelming weight must always be sampled first
    rows = [(i, 0.0) for i in range(20)] + [(99, 100.0)]
    wts = spark.createDataFrame(rows, "doc_id long, log_weight double")
    top = sel.dsir_sample(wts, n=1).collect()[0]
    assert top["doc_id"] == 99


# ---------------------------------------------------------------------------
# hard negatives / knn label vote


def _labeled_emb(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),
        (2, [0.98, 0.2], 1),   # close to 0 but different label
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.99], 1),
        (5, [0.2, 0.98], 0),   # close to 3 but different label
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_hard_negatives_excludes_same_label(spark):
    from grape_vector_db_spark.operators import search as s

    emb = _labeled_emb(spark)
    out = s.hard_negatives(emb, emb.where("vec_id = 0"), k=2).collect()
    assert all(r["label"] != r["anchor_label"] for r in out)
    # nearest different-label vector to 0 is 2
    assert out[0]["vec_id"] == 2 and out[0]["rank"] == 1


def test_knn_label_vote_majority(spark):
    from grape_vector_db_spark.operators import search as s

    emb = _labeled_emb(spark)
    out = {
        r["vec_id"]: r
        for r in s.knn_label_vote(emb, emb.where("vec_id = 0"), k=3).collect()
    }
    # neighbors of 0 by cosine: 1 (label 0), 2 (label 1), then 5 (label 0)
    # → majority label 0 with 2 votes
    assert out[0]["pred_label"] == 0
    assert out[0]["n_votes"] == 2
    assert out[0]["true_label"] == 0


# ---------------------------------------------------------------------------
# winnowing


def test_winnow_guarantee_shared_fingerprint(spark):
    # two docs sharing a long substring must share >= 1 fingerprint
    # (winnowing guarantee for matches of length >= k + w - 1)
    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, "PREFIX one " + shared), (2, shared + " SUFFIX two")],
        "doc_id long, text string",
    )
    out = dedup.winnow_fingerprints(df, k=10, w=16).collect()
    f1 = {r["fp"] for r in out if r["doc_id"] == 1}
    f2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert f1 & f2


def test_winnow_short_doc_single_fp(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    out = dedup.winnow_fingerprints(df, k=10, w=16).collect()
    assert len(out) == 1  # one whole-text window


# ---------------------------------------------------------------------------
# quality classifier


def test_quality_classifier_bounds_and_default(spark):
    from grape_vector_db_spark.operators import selection as sel

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sel.quality_classifier_score(df).collect()}
    assert 0.0 < out[1]["score"] < 1.0
    assert out[1]["n_feats"] == 4
    # featureless doc gets the sigmoid(0) prior
    assert out[2]["score"] == 0.5
    assert out[2]["n_feats"] == 0


def test_quality_classifier_deterministic(spark):
    from grape_vector_db_spark.operators import selection as sel

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    a = sel.quality_classifier_score(df).collect()[0]["score"]
    b = sel.quality_classifier_score(df).collect()[0]["score"]
    assert a == b


# ---------------------------------------------------------------------------
# BPE training / segmentation


def test_bpe_train_golden_merges(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = textanalysis.bpe_train(df, n_merges=4)
    # hand-derived: l+o (6), lo+w (6), low+</w> (4), then the 3-way tie
    # (e,w)/(n,e)/... breaks to the lexicographically smallest pair
    assert merges == [
        (0, "l", "o", 6),
        (1, "lo", "w", 6),
        (2, "low", "</w>", 4),
        (3, "e", "w", 3),
    ]


def test_bpe_segment_counts_golden(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = textanalysis.bpe_train(df, n_merges=4)
    out = {
        r["doc_id"]: r
        for r in textanalysis.bpe_segment_counts(df, merges).collect()
    }
    # doc1: low->1 sym x3, lower->[low,e,r,</w>]=4, lowest->5 => 12
    assert (out[1]["n_words"], out[1]["n_subwords"]) == (5, 12)
    # doc2: new->[n,ew,</w>]=3, newer->5, newest->6, low->1 => 15
    assert (out[2]["n_words"], out[2]["n_subwords"]) == (4, 15)


def test_bpe_batched_exact_equals_sequential(spark):
    """The default exact batching must be bit-identical to the old
    one-merge-per-scan loop (batch_merges=1) — the batch is a provable
    prefix of the sequential argmax sequence — while spending strictly
    fewer pair-count scans on a corpus with disjoint frequent pairs."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta " * 3),
            (2, "alpha beta gamma omega sigma theta " * 2),
            (3, "kappa lambda mu nu xi omicron pi rho"),
        ],
        "doc_id long, text string",
    )
    seq = textanalysis.bpe_train(df, n_merges=12, batch_merges=1)
    seq_scans = textanalysis._last_bpe_scan_count
    assert seq_scans == 12
    batched = textanalysis.bpe_train(df, n_merges=12, batch_merges=8)
    assert batched == seq
    assert textanalysis._last_bpe_scan_count < seq_scans


def test_bpe_batched_exact_self_pair_counterexample(spark):
    """Regression (r5 review): a self-pair merge (a,a) -> 'aa' spawns
    (aa,aa) pairs whose only old-pair proxy is the chosen pair itself,
    invisible to the tie guard — sequential training then picks (aa,aa)
    second via the lexicographic tie while a guard-less batch picked
    (b,c). The self-pair stop restores bit-identity."""
    df = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "bcbc")], "doc_id long, text string"
    )
    seq = textanalysis.bpe_train(df, n_merges=3, batch_merges=1)
    assert seq == [(0, "a", "a", 5), (1, "aa", "aa", 2), (2, "b", "c", 2)]
    assert textanalysis.bpe_train(df, n_merges=3, batch_merges=4) == seq


def test_bpe_greedy_batches_bound_scan_count(spark):
    """greedy=True fills whole batches (the approximate distributed-BPE
    mode for big vocabularies): 24 merges in at most a handful of scans,
    every merge structurally valid and deterministic."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 4),
            (2, "pack my box with five dozen liquor jugs " * 3),
            (3, "sphinx of black quartz judge my vow " * 3),
            (4, "how vexingly quick daft zebras jump " * 2),
        ],
        "doc_id long, text string",
    )
    merges = textanalysis.bpe_train(
        df, n_merges=24, batch_merges=12, greedy=True
    )
    assert len(merges) == 24
    assert [m[0] for m in merges] == list(range(24))
    # 24 merges at up to 12 per scan: far fewer scans than merges
    assert textanalysis._last_bpe_scan_count <= 6
    # deterministic: retraining reproduces the list exactly
    again = textanalysis.bpe_train(
        df, n_merges=24, batch_merges=12, greedy=True
    )
    assert again == merges


def test_bpe_merge_leftmost_first(spark):
    # "aaa": merge (a,a) applies leftmost-first non-overlapping -> [aa, a]
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges = textanalysis.bpe_train(df, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    out = textanalysis.bpe_segment_counts(df, merges).collect()[0]
    # each "aaa" -> [aa, a, </w>] = 3 subwords
    assert out["n_subwords"] == 6


# ---------------------------------------------------------------------------
# c-TF-IDF


def test_ctfidf_surfaces_class_terms(spark):
    from grape_vector_db_spark.operators import sparse as sp

    df = spark.createDataFrame(
        [
            (1, "wolves wolves wolves howling", "animals"),
            (2, "wolves hunting prey tonight", "animals"),
            (3, "stocks stocks stocks rally", "finance"),
            (4, "stocks falling market panic", "finance"),
        ],
        "doc_id long, text string, source string",
    )
    out = sp.class_tfidf_top_terms(df, top_k=1).collect()
    top = {r["class"]: r["term"] for r in out}
    assert top == {"animals": "wolves", "finance": "stocks"}
    assert all(r["rank"] == 1 for r in out)
