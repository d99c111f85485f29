"""sketches/quantization/classifier hardening pins (self-review):

1. sq_dim_quantize / sq_dim_error_report survive empty vectors
   (sequence(1, 0) descends to [1, 0] and element_at(.., 0) raised).
2. pack_bits packs NaN as bit 0 — the reference/Python-side rule
   (Spark's NaN-is-largest made `NaN > 0` true, inflating hamming
   similarity against every 0-bit query).
3. sq_dim_search gains the siblings' index_covers_df gate (a superset
   codes table silently under-filled k).
4. logreg_train fails LOUDLY on NULL/mis-sized feature rows (the
   gradient sums silently skipped them while n counted them);
   train_loss raises the empty-input ValueError, not float(None).
5. HLL small-m alpha uses Flajolet's exact constants (m=16/32/64).
6. histogram sketches record their own bin count; quantiles read it
   (a bins-parameter mismatch silently mis-scaled every bin width).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import classifier, quantization, sketches


class TestSqDimEmptyVector:
    def test_quantize_empty_vector_yields_empty_codes(self, spark):
        df = spark.createDataFrame(
            [(1, [0.5, 1.5]), (2, [])],
            "vec_id long, embedding array<double>",
        )
        out = {
            r["vec_id"]: r["codes"]
            for r in quantization.sq_dim_quantize(
                df, [0.0, 1.0], [1.0, 1.0]
            ).collect()
        }
        assert out[2] == []  # raised INVALID_INDEX_OF_ZERO pre-fix
        assert len(out[1]) == 2


def test_pack_bits_nan_packs_zero(spark):
    df = spark.createDataFrame(
        [(1, [float("nan"), 1.0, -1.0, float("nan")])],
        "vec_id long, embedding array<double>",
    )
    row = quantization.pack_bits(df).collect()[0]
    # bits (MSB first): NaN->0, 1.0->1, -1.0->0, NaN->0
    assert row["packed"][0] == 0b0100 << 28


def test_sq_dim_search_superset_codes_fills_k(spark):
    rows = [(i, [float(i), 1.0]) for i in range(20)]
    full = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sub = full.where(F.col("vec_id") >= 10)
    bounds = quantization.sq_dim_train(full)
    codes = quantization.sq_dim_quantize(full, *bounds)
    out = quantization.sq_dim_search(
        sub, [19.0, 1.0], k=5, rescore=5,
        bounds=bounds, codes_df=codes, index_covers_df=False,
    ).collect()
    # a corpus-wide codes table + filtered df: the stage-1 budget must
    # be spent on RETURNABLE ids (pre-fix the top-5 approx candidates
    # could all be filtered ids -> fewer than k rows)
    assert len(out) == 5
    assert all(r["vec_id"] >= 10 for r in out)


class TestClassifierGuards:
    def test_train_rejects_mis_sized_features(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0], 1), ([1.0], 0)],
            "features array<double>, label int",
        )
        with pytest.raises(ValueError, match="feature length"):
            classifier.logreg_train(df, dim=2, iterations=1)

    def test_train_loss_empty_input_raises_value_error(self, spark):
        df = spark.createDataFrame([], "features array<double>, label int")
        with pytest.raises(ValueError, match="empty"):
            classifier.train_loss(df, [0.0], 0.0)


def test_hll_small_m_uses_exact_alpha(spark):
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(2000)], "v string"
    )
    regs = sketches.hll_registers(df, "v", p=4)
    est = sketches.hll_estimate(regs, p=4).collect()[0]["estimate"]
    # raw branch at m=16 with alpha=0.673; the estimate is rough at
    # p=4 by design — pin that it is in a sane band and FINITE
    assert 500 < est < 8000


def test_histogram_quantiles_reads_recorded_bins(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    hist = sketches.histogram_sketch(df, "v", bins=128)
    # caller passes a WRONG bins param — the recorded grid must win
    est = {
        r["q"]: r["est"]
        for r in sketches.histogram_quantiles(
            hist, (0.5,), bins=256
        ).collect()
    }
    assert abs(est[0.5] - 500.0) < (999.0 / 128) + 1e-6
