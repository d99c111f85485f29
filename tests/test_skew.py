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
