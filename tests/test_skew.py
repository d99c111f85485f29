"""Skew-mitigation helper tests: salted results must equal unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from grape_vector_db_spark.operators import skew


def test_salted_count_equals_plain(spark):
    df = spark.createDataFrame(
        [("hot",)] * 500 + [("cold",)] * 3, "k string"
    )
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in skew.salted_count(df, ["k"]).collect()}
    assert salted == plain == {"hot": 500, "cold": 3}


def test_salted_sum_equals_plain(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)] + [("b", 1.0)], "k string, v double"
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["total"] for r in skew.salted_sum(df, ["k"], "v").collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold", -1)], "k string, payload int"
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, tag string")
    plain = sorted(
        (r["k"], r["payload"], r["tag"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in skew.salted_join(big, small, "k").collect()
    )
    assert salted == plain and len(salted) == 201


def test_cap_hot_keys(spark):
    df = spark.createDataFrame(
        [("stop", i) for i in range(50)] + [("rare", 0), ("rare", 1)],
        "shingle string, doc int",
    )
    out = skew.cap_hot_keys(df, "shingle", max_freq=10)
    keys = {r["shingle"] for r in out.collect()}
    assert keys == {"rare"}
    assert out.count() == 2


def test_pack_sequences_subgroup_presplit(spark):
    """One giant source: subgroups=k must split the window's partition key
    into k independent streams (the hot-group remedy) while keeping every
    stream self-consistent."""
    from grape_vector_db_spark.operators import curation

    rows = [(i, "w " * ((i % 7) + 1), "giant") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.pack_sequences(df, max_tokens=10, subgroups=8).collect()

    # every doc exactly once; the hot group split into several streams
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    groups = {r["group"] for r in out}
    assert len(groups) > 1 and all(g.startswith("giant#") for g in groups)

    # each subgroup is a self-consistent stream: doc-id-ordered running
    # offsets and per-subgroup bin arithmetic
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
    for members in by_group.values():
        members.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in members:
            assert r["start_offset"] == off
            assert r["bin_first"] == off // 10
            assert r["bin_last"] == (off + max(r["n_tokens"], 1) - 1) // 10
            off += r["n_tokens"]

    # deterministic assignment: a second run lands every doc in the same
    # subgroup (h32-derived, not partition-dependent)
    again = {
        r["doc_id"]: r["group"]
        for r in curation.pack_sequences(df, max_tokens=10, subgroups=8).collect()
    }
    assert {r["doc_id"]: r["group"] for r in out} == again
