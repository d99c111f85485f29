"""Round-5 operators: Bloom membership, weighted sampling, rendezvous
placement, link prediction, phrase blocklists, and the relational-depth
query shapes (correlated aggregates / exists-chains) they accompany."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import ann, curation, sampling, sketches
from grape_vector_db_spark.sources.tables import rendezvous_shard


# --- Bloom filter -----------------------------------------------------------


def test_bloom_no_false_negatives(spark, docs):
    bench = docs.where(F.col("source") == "src0")
    bits = sketches.bloom_bits(bench, F.col("text"), m_bits=2048, k=3)
    probed = sketches.bloom_probe(
        bench, F.col("text"), bits, m_bits=2048, k=3
    )
    n_bench = bench.count()
    assert probed.where(F.col("member")).count() == n_bench


def test_bloom_bits_bounded(spark, docs):
    bits = sketches.bloom_bits(docs, F.col("text"), m_bits=64, k=3)
    rows = bits.collect()
    assert len(rows) <= 64
    assert all(0 <= r["bit"] < 64 for r in rows)


def test_bloom_filters_most_non_members(spark, docs):
    # large m relative to n: non-members should mostly miss
    bench = docs.where(F.col("source") == "src0")
    others = docs.where(F.col("source") != "src0")
    bits = sketches.bloom_bits(bench, F.col("text"), m_bits=1 << 16, k=3)
    fp = (
        sketches.bloom_probe(others, F.col("text"), bits, m_bits=1 << 16, k=3)
        .where(F.col("member"))
        .count()
    )
    assert fp <= others.count() * 0.05


def test_bloom_k_bounds():
    with pytest.raises(ValueError):
        sketches.bloom_bits(None, F.lit("x"), m_bits=64, k=5)


# --- weighted sampling ------------------------------------------------------


def test_weighted_sample_deterministic(spark, docs):
    a = sampling.weighted_sample_topk(
        docs, F.col("n_chars"), k=5, group_col="lang", seed=7
    ).collect()
    b = sampling.weighted_sample_topk(
        docs, F.col("n_chars"), k=5, group_col="lang", seed=7
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_weighted_sample_group_sizes(spark, docs):
    out = sampling.weighted_sample_topk(
        docs, F.col("n_chars"), k=3, group_col="lang", seed=1
    )
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(sizes) == langs
    assert all(n <= 3 for n in sizes.values())


def test_weighted_sample_global_topk(spark, docs):
    out = sampling.weighted_sample_topk(docs, F.col("n_chars"), k=7, seed=3)
    assert out.count() == 7
    assert set(out.columns) == {"doc_id", "es_key"}


def test_weighted_sample_bias(spark):
    # weight 1000 vs 1: the heavy item should be selected (k=1) for almost
    # every seed — A-ES inclusion probability ~ w / sum(w)
    rows = [(1, 1000.0), (2, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    wins = 0
    for seed in range(20):
        got = sampling.weighted_sample_topk(df, F.col("w"), k=1, seed=seed)
        wins += got.first()["doc_id"] == 1
    assert wins >= 18


def test_weighted_sample_excludes_nonpositive(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = sampling.weighted_sample_topk(df, F.col("w"), k=10, seed=0)
    assert [r["doc_id"] for r in out.collect()] == [1]


# --- rendezvous placement ---------------------------------------------------


def test_rendezvous_covers_all_shards(spark, docs):
    out = docs.select(rendezvous_shard("doc_id", 8).alias("s"))
    got = {r["s"] for r in out.distinct().collect()}
    assert got <= set(range(8))
    assert len(got) >= 6  # 500 docs over 8 shards: all shards hit w.h.p.


def test_rendezvous_minimal_disruption(spark, docs):
    """THE rendezvous property: growing 7 -> 8 shards only moves keys
    that land on the NEW shard; every other key keeps its placement."""
    a = docs.select("doc_id", rendezvous_shard("doc_id", 7).alias("s7"))
    b = docs.select("doc_id", rendezvous_shard("doc_id", 8).alias("s8"))
    j = a.join(b, "doc_id")
    moved = j.where(F.col("s7") != F.col("s8"))
    assert moved.where(F.col("s8") != 7).count() == 0
    # and roughly 1/8 of keys move (binomial slack)
    n = j.count()
    assert moved.count() < n * 0.25


def test_rendezvous_deterministic(spark, docs):
    a = docs.select(rendezvous_shard("doc_id", 4, seed=2).alias("s")).collect()
    b = docs.select(rendezvous_shard("doc_id", 4, seed=2).alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]


# --- link prediction --------------------------------------------------------


def test_link_prediction_path_graph(spark):
    # path 1-2-3-4: non-edges sharing a neighbor are (1,3) via 2 and
    # (2,4) via 3; both have one common neighbor of degree 2
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    out = ann.knn_link_prediction(pairs, top_k=10).collect()
    got = {(r["a"], r["b"]): (r["common"], r["adamic_adar"]) for r in out}
    expected_aa = round(1.0 / math.log(2), 6)
    assert got == {(1, 3): (1, expected_aa), (2, 4): (1, expected_aa)}


def test_link_prediction_excludes_existing_edges(spark):
    # triangle + pendant: (1,3) is an edge, must not be predicted
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    out = ann.knn_link_prediction(pairs, top_k=10).collect()
    predicted = {(r["a"], r["b"]) for r in out}
    assert (1, 3) not in predicted
    assert (1, 4) in predicted and (2, 4) in predicted


def test_link_prediction_max_degree_drops_hub_wedges(spark):
    # star center 1 with leaves 2..5: every leaf pair is a wedge via 1
    pairs = spark.createDataFrame(
        [(1, x) for x in (2, 3, 4, 5)], "a long, b long"
    )
    full = ann.knn_link_prediction(pairs, top_k=100)
    assert full.count() == 6  # C(4,2) leaf pairs
    capped = ann.knn_link_prediction(pairs, top_k=100, max_degree=3)
    assert capped.count() == 0


# --- phrase blocklist -------------------------------------------------------


def test_blocklist_token_boundary(spark):
    rows = [
        (1, "the bad word here"),
        (2, "a badword compound"),  # substring must NOT match
        (3, "Bad Word at start"),  # case-insensitive
        (4, "bad word bad word twice"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.phrase_blocklist_hits(df, ["bad word"])
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got == {1: 1, 3: 1, 4: 2}


def test_blocklist_mixed_lengths(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.phrase_blocklist_hits(
        df, ["beta gamma", "alpha beta gamma"]
    )
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got == {1: 2, 2: 1}


def test_blocklist_empty_raises(spark):
    with pytest.raises(ValueError):
        curation.phrase_blocklist_hits(None, [])
