"""global_row_number: exact global order with no single-partition window;
ccnet_buckets / mixture_temperature built on top."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import curation, rank, textanalysis


def test_global_row_number_matches_plain_window(spark):
    from pyspark.sql import Window

    rows = [(float(i % 17) / 3.0, i) for i in range(500)]  # heavy key ties
    df = spark.createDataFrame(rows, "k double, id long")
    got = {
        r["id"]: r["rn"]
        for r in rank.global_row_number(df, "k", ["id"], num_buckets=8).collect()
    }
    w = Window.orderBy(F.col("k").asc(), F.col("id").asc())
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("materialize", ["local_checkpoint", "persist", "none"])
def test_global_row_number_materialize_modes_agree(spark, materialize):
    """All three materialization strategies produce the identical exact
    rank — 'persist' keeps lineage for executor-loss recompute on
    clusters, 'none' stays fully lazy, 'local_checkpoint' is the fast
    local default."""
    df = spark.createDataFrame(
        [(float(i % 7), i) for i in range(200)], "k double, id long"
    )
    got = {
        r["id"]: r["rn"]
        for r in rank.global_row_number(
            df, "k", ["id"], num_buckets=4, materialize=materialize
        ).collect()
    }
    assert sorted(got.values()) == list(range(1, 201))
    # k=0 smallest id ranks first; the largest k=6 id (195) ranks last
    assert got[0] == 1 and got[195] == 200


def test_global_row_number_rejects_unknown_materialize(spark):
    df = spark.createDataFrame([(1.0, 1)], "k double, id long")
    with pytest.raises(ValueError, match="materialize"):
        rank.global_row_number(df, "k", ["id"], materialize="eager")


def test_global_row_number_total_col_and_no_single_partition(spark):
    df = spark.createDataFrame([(float(i), i) for i in range(100)], "k double, id long")
    out = rank.global_row_number(df, "k", ["id"], total_col="n")
    assert out.select("n").head()["n"] == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_ccnet_buckets_tiers(spark):
    docs = spark.createDataFrame(
        [(i, ("common " * 5) if i % 3 else "rare%d token" % i) for i in range(30)],
        "doc_id long, text string",
    )
    lm = textanalysis.unigram_lm(docs)
    out = textanalysis.ccnet_buckets(docs, lm).collect()
    assert len(out) == 30
    tiers = sorted((r["cross_entropy"], r["tier"]) for r in out)
    # equal-count tiers, monotone in cross-entropy
    from collections import Counter

    assert Counter(r["tier"] for r in out) == {0: 10, 1: 10, 2: 10}
    assert [t for _, t in tiers] == sorted(t for _, t in tiers)
    # head = lowest cross-entropy (the repetitive "common" docs)
    head = [r for r in out if r["tier"] == 0]
    assert all(r["cross_entropy"] <= tiers[10][0] for r in head)


def test_mixture_temperature_weights(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 99 + "w", "big"), (2, "w", "small")],
        "doc_id long, text string, source string",
    )
    out = {r["group"]: r for r in curation.mixture_temperature(docs, tau=0.5).collect()}
    # shares 100/101 and 1/101; tau=0.5 -> squared then renormalized
    s_big, s_small = 100 / 101, 1 / 101
    tot = s_big**2 + s_small**2
    assert out["big"]["sampling_weight"] == pytest.approx(s_big**2 / tot, abs=1e-6)
    assert out["small"]["sampling_weight"] == pytest.approx(s_small**2 / tot, abs=1e-6)
    # tau=1 reduces to proportional sampling
    out1 = {r["group"]: r for r in curation.mixture_temperature(docs, tau=1.0).collect()}
    assert out1["big"]["sampling_weight"] == pytest.approx(s_big, abs=1e-6)
    with pytest.raises(ValueError):
        curation.mixture_temperature(docs, tau=0.0)


def test_bigram_lm_and_backoff(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    bi = textanalysis.bigram_lm(docs, alpha=0.5)
    got = {(r["prev"], r["term"]): r["logp"] for r in bi.collect()}
    # transitions: a->b x3, b->a x1, b->c x1; V=3
    # P(b|a) = (3 + .5) / (3 + .5*3)
    assert got[("a", "b")] == pytest.approx(math.log(3.5 / 4.5), abs=1e-9)
    assert got[("b", "a")] == pytest.approx(math.log(1.5 / 3.5), abs=1e-9)

    uni = textanalysis.unigram_lm(docs, alpha=0.5)
    out = {
        r["doc_id"]: r
        for r in textanalysis.lm_cross_entropy_bigram(docs, bi, uni).collect()
    }
    assert out[1]["n_transitions"] == 3 and out[2]["n_transitions"] == 2
    # doc 2's a->b and b->c are both seen bigrams: exact cross-entropy
    want2 = -(math.log(3.5 / 4.5) + math.log(1.5 / 3.5)) / 2
    assert out[2]["cross_entropy"] == pytest.approx(want2, abs=1e-6)
    # unseen bigram backs off: score a doc with a novel transition
    probe = spark.createDataFrame([(9, "c a")], "doc_id long, text string")
    r9 = textanalysis.lm_cross_entropy_bigram(probe, bi, uni).collect()[0]
    # c->a unseen -> ln(0.4) + uni(a); uni(a) = ln((3+.5)/(7+.5*3))
    want9 = -(math.log(0.4) + math.log(3.5 / 8.5))
    assert r9["cross_entropy"] == pytest.approx(want9, abs=1e-6)
    # single-token docs drop out (no transitions)
    single = spark.createDataFrame([(5, "only")], "doc_id long, text string")
    assert textanalysis.lm_cross_entropy_bigram(single, bi, uni).count() == 0
