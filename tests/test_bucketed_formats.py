"""Tests for persistent bucketed tables (exchange-free co-located joins)
and multi-format IO sinks."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.sources.tables import (
    drop_bucketed,
    read_format,
    save_bucketed,
    write_format,
)


class TestBucketedJoin:
    def test_cobucketed_join_has_no_exchange(self, spark, docs):
        d = tempfile.mkdtemp(prefix="gvdb_bucketed_")
        left = docs.select("doc_id", "source")
        right = docs.select("doc_id", "n_chars")
        try:
            save_bucketed(left, "t_bleft", f"{d}/left", 4, "doc_id")
            save_bucketed(right, "t_bright", f"{d}/right", 4, "doc_id")
            lt, rt = spark.table("t_bleft"), spark.table("t_bright")
            joined = lt.hint("merge").join(rt, "doc_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert joined.count() == docs.count()
        finally:
            drop_bucketed(spark, "t_bleft")
            drop_bucketed(spark, "t_bright")

    def test_unbucketed_same_join_shuffles(self, spark, docs):
        # control: the identical join without bucketing DOES exchange —
        # proving the bucketed plan's shuffle elision is real, not AQE luck
        left = docs.select("doc_id", "source")
        right = docs.select("doc_id", "n_chars")
        plan = (
            left.hint("merge")
            .join(right, "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan


class TestMultiFormatIO:
    @pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
    def test_roundtrip_typed(self, spark, docs, fmt):
        d = tempfile.mkdtemp(prefix=f"gvdb_fmt_{fmt}_")
        write_format(docs, f"{d}/t", fmt)
        back = read_format(spark, f"{d}/t", fmt, schema=docs.schema)
        assert back.count() == docs.count()
        a = sorted(tuple(r) for r in docs.collect())
        b = sorted(tuple(r) for r in back.collect())
        assert a == b

    def test_roundtrip_csv_with_newlines(self, spark, docs):
        # documents.text embeds newlines — multiLine + quote/escape options
        # must preserve them exactly
        d = tempfile.mkdtemp(prefix="gvdb_fmt_csv_")
        write_format(docs, f"{d}/t", "csv")
        back = read_format(spark, f"{d}/t", "csv", schema=docs.schema)
        a = sorted(tuple(r) for r in docs.collect())
        b = sorted(tuple(r) for r in back.collect())
        assert a == b

    def test_csv_null_vs_empty_disclosed(self, spark):
        # known CSV lossiness: empty string and null collapse — the reader
        # must pin schema and accept this; typed formats are the scale path
        df = spark.createDataFrame([(1, "x"), (2, "")], ["id", "s"])
        d = tempfile.mkdtemp(prefix="gvdb_fmt_csvnull_")
        write_format(df, f"{d}/t", "csv")
        back = read_format(spark, f"{d}/t", "csv", schema=df.schema)
        vals = {r["id"]: r["s"] for r in back.collect()}
        assert vals[1] == "x" and vals[2] in ("", None)
