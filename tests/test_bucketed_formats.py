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


class TestPartitionPruning:
    def test_date_partitioned_scan_prunes(self, spark, docs):
        # partition the corpus by source and filter one source: the scan
        # must show a PartitionFilters entry (directory-level pruning),
        # the scale analogue of reading 1 day out of 3 years of events
        d = tempfile.mkdtemp(prefix="gvdb_part_")
        docs.write.mode("overwrite").partitionBy("source").parquet(f"{d}/t")
        one = spark.read.parquet(f"{d}/t").where(F.col("source") == "web")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        seg = plan.split("PartitionFilters")[1][:200]
        assert "source" in seg


class TestTimeTravel:
    def test_read_back_versions_and_diff(self, spark):
        from grape_vector_db_spark.sources.tables import (
            publish_table,
            read_table_version,
            snapshot_diff,
            table_versions,
        )

        d = tempfile.mkdtemp(prefix="gvdb_tt_")
        v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        v2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], ["id", "v"])
        publish_table(spark, f"{d}/t", v1)
        publish_table(spark, f"{d}/t", v2)
        vs = table_versions(spark, f"{d}/t")
        assert len(vs) == 2
        old = read_table_version(spark, f"{d}/t", vs[0])
        new = read_table_version(spark, f"{d}/t", vs[1])
        diff = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
        assert diff == {1: "unchanged", 2: "changed", 3: "added"}
        with pytest.raises(ValueError):
            read_table_version(spark, f"{d}/t", 999)


class TestPlanAudit:
    def test_counts_match_known_shapes(self, spark, docs):
        from grape_vector_db_spark.plans.audit import audit_plan

        # narrow map: zero everything
        narrow = docs.select("doc_id", F.length("text").alias("n"))
        a = audit_plan(narrow)
        assert a.shuffles == 0 and a.cartesian_products == 0
        assert a.python_evals == 0 and a.scans == 1

        # groupBy: exactly one data-moving shuffle
        agg = docs.groupBy("source").count()
        b = audit_plan(agg)
        assert b.shuffles == 1 and b.single_partition_exchanges == 0

        # broadcast join: a broadcast exchange but no data shuffle
        small = docs.select("doc_id").limit(10)
        j = docs.join(F.broadcast(small), "doc_id")
        c = audit_plan(j)
        assert c.broadcast_hash_joins == 1
        assert c.broadcast_exchanges >= 1

    def test_reused_exchange_not_counted_as_shuffle(self, spark, docs):
        """A self-joined aggregate reuses one shuffle: the ReusedExchange
        node contains the substring 'Exchange' (and repeats its child's
        description), but it moves no new data — it must count in
        reused_exchanges, not inflate shuffles."""
        from grape_vector_db_spark.plans.audit import audit_plan, plan_string

        agg = docs.groupBy("source").agg(F.count("*").alias("n"))
        joined = agg.alias("x").join(
            agg.alias("y"), F.col("x.source") == F.col("y.source")
        )
        p = plan_string(joined)
        a = audit_plan(joined)
        if "ReusedExchange" in p:
            assert a.reused_exchanges >= 1
            # naive substring counting would report one more shuffle per
            # reuse; node-name classification keeps them apart
            assert a.shuffles + a.reused_exchanges <= p.count("Exchange")
            assert a.shuffles < p.count("Exchange") - a.broadcast_exchanges

    def test_pushed_filter_flag(self, spark):
        from grape_vector_db_spark.plans.audit import audit_plan

        # lineitem is NOT cached by any fixture — a cached table would
        # resolve to InMemoryTableScan and hide the parquet scan node
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        assert audit_plan(df.where(F.col("l_orderkey") == 7)).pushed_filters
        assert not audit_plan(df).pushed_filters
