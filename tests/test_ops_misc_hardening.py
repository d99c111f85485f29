"""skew/topk/rank/payload/geo/planner hardening pins (self-review):

1. cap_hot_keys anti-joins the tiny HOT set (it force-broadcast the
   huge keep set — the 8GB-limit/driver-OOM shape at exactly the scale
   it exists for) and keeps null-key rows.
2. minmax_normalize's global form is a scalar aggregate, never an
   unpartitioned window (Exchange SinglePartition).
3. global_row_number/global_prefix_sum rank an all-null key column by
   the tiebreaks (they returned NULL ranks / total 0 for real rows,
   silently zeroing budget_select downstream); internal temp-column
   collisions raise instead of clobbering caller data.
4. The payload sidecar records wide-histogram fields explicitly — an
   exact histogram whose only VALUE is the string 'n_distinct' no
   longer masquerades as a wide one.
5. The geo bbox prefilter uses the exact cap-extent bound at the
   CENTER latitude (high-latitude queries used to bail to
   all-longitudes far too early).
6. The planner's fallback reason distinguishes 'graph exists but
   selectivity-gated' from 'no index tables'.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import geo, rank, skew, topk
from grape_vector_db_spark.operators.payload import (
    payload_postings,
    payload_sidecar_stats,
)
from grape_vector_db_spark.plans.planner import choose_search_strategy


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestCapHotKeys:
    def test_anti_joins_hot_and_keeps_nulls(self, spark):
        rows = [(i, "hot") for i in range(10)] + [
            (100, "cold"), (101, None)
        ]
        df = spark.createDataFrame(rows, "id long, k string")
        out = skew.cap_hot_keys(df, "k", max_freq=5)
        got = {r["id"] for r in out.collect()}
        assert got == {100, 101}  # null-key row kept (was dropped)
        # the BROADCAST side is the hot set (anti), not keep (semi)
        plan = _plan(out)
        assert "LeftAnti" in plan


def test_minmax_global_form_has_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, score double"
    )
    out = topk.minmax_normalize(df)
    assert "Exchange SinglePartition" not in _plan(out).replace(
        # the scalar aggregate's own final-merge exchange is fine; the
        # hazard is a WINDOW over a single partition
        "Exchange SinglePartition\n", "", 1
    ) or "Window" not in _plan(out)
    vals = {r["id"]: r["norm_score"] for r in out.collect()}
    assert vals[0] == 0.0 and vals[99] == 1.0


class TestGlobalRankAllNullKeys:
    def test_all_null_keys_rank_by_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(i, None) for i in range(5)], "id long, score double"
        )
        out = rank.global_row_number(
            df, "score", ["id"], total_col="n", materialize="none"
        )
        rows = {r["id"]: (r["rn"], r["n"]) for r in out.collect()}
        assert [rows[i][0] for i in range(5)] == [1, 2, 3, 4, 5]
        assert rows[0][1] == 5  # was total 0 + NULL ranks

    def test_temp_column_collision_raises(self, spark):
        df = spark.createDataFrame([(1, 1.0, 2)], "id long, score double, _b int")
        with pytest.raises(ValueError, match="_b"):
            rank.global_row_number(df, "score", ["id"], materialize="none")

    def test_topk_rank_collision_raises(self, spark):
        df = spark.createDataFrame([(1, 1.0, 2)], "id long, score double, rank int")
        with pytest.raises(ValueError, match="rank"):
            topk.topk_per_group(df, ["id"], "score", 1)


def test_wide_histogram_discriminator(spark):
    # a field whose ONLY value is the literal string 'n_distinct'
    docs = spark.createDataFrame(
        [(i, "n_distinct") for i in range(7)], "doc_id long, tag string"
    )
    p = payload_postings(docs, ["tag"])
    st = payload_sidecar_stats(p, ["tag"], 7)
    assert st["histograms"]["tag"] == {"n_distinct": 7}  # exact counts
    assert st["wide_hist_fields"] == []  # and NOT recorded as wide


def test_geo_bbox_prunes_longitude_at_high_latitude(spark):
    df = spark.createDataFrame(
        [(1, 80.0, 0.0), (2, 80.0, 100.0)], "id long, lat double, lon double"
    )
    out = geo.within_distance(df, 80.0, 0.0, 1000.0)
    assert {r["id"] for r in out.collect()} == {1}
    # the prefilter itself must carry a lon predicate (pre-fix it bailed
    # to all-longitudes past ~lat 60 for large radii)
    pred = geo._bbox_filter("lat", "lon", 80.0, 0.0, 1000.0)
    assert "lon" in str(pred)


def test_planner_reason_names_the_selectivity_gate():
    choice = choose_search_strategy(
        10_000_000, has_ivf=False, has_packed=False, has_sq=False,
        has_graph=True, filter_selectivity=0.01,
    )
    assert choice.strategy == "brute_force"
    assert "selectivity" in choice.reason
    assert "build an index" not in choice.reason
