"""End-to-end training-data pipeline integration test.

Each stage is oracle-checked individually in the registry; this pins that
the stages COMPOSE — the output of one is a legal, semantically correct
input to the next — all the way from raw corpus to the on-disk training
artifact a loader would stream. Asserts the invariants a real pipeline
owner checks before a run: gates actually applied, no exact dup survives,
held-out contamination excluded, quota respected, every surviving token
lands in exactly one shard position, and the whole thing is
deterministic end to end.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from grape_vector_db_spark.operators import curation, dedup
from grape_vector_db_spark.operators.sketches import bloom_bits, bloom_gate


def _run_pipeline(spark, docs, tmpdir, out_name):
    # 1. normalize + quality/repetition gates
    clean = curation.normalize_text(docs).select(
        "doc_id", F.col("norm_text").alias("text")
    ).join(docs.select("doc_id", "source"), "doc_id")
    gates = curation.repetition_signals(clean).where(
        F.col("dup_line_frac") <= 0.5
    )
    gated = clean.join(gates.select("doc_id"), "doc_id")

    # 2. exact dedup (keep smallest doc_id per md5)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    uniq = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 3. decontamination: Bloom-gate against a held-out benchmark set
    bench = docs.where(F.col("doc_id") % 17 == 0).select("text")
    bits = {
        r["bit"]
        for r in bloom_bits(bench, F.col("text"), m_bits=4096, k=3).collect()
    }
    decon = uniq.where(~bloom_gate(F.col("text"), bits, 4096, 3))

    # 4. per-source quota
    quota = curation.source_quota(
        decon.select("doc_id", "source"), per_group=12
    ).select("doc_id")
    final = decon.join(quota, "doc_id")

    # 5. materialize the shuffled training shards
    path = f"{tmpdir}/{out_name}"
    curation.write_training_shards(final, path, n_shards=4, seed=11)
    return spark.read.parquet(path)


def test_training_pipeline_end_to_end(spark, docs, tmpdir):
    out = _run_pipeline(spark, docs, tmpdir, "run1").cache()
    rows = out.collect()
    assert len(rows) > 50  # the gates select, they don't annihilate

    # no exact duplicate text survives
    n_text = out.select("text").distinct().count()
    assert n_text == len(rows)

    # nothing from the benchmark set leaks through (Bloom has no false
    # negatives, so exclusion is exact on true members)
    bench_texts = {
        r["text"] for r in docs.where(F.col("doc_id") % 17 == 0).collect()
    }
    assert all(r["text"] not in bench_texts for r in rows)

    # quota respected per source
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= 12 for r in per_src)

    # shard artifact is a permutation: dense pos per shard, all docs once
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for d in glob.glob(f"{tmpdir}/run1/shard=*"):
        pos = sorted(
            r["pos"] for r in spark.read.parquet(d).select("pos").collect()
        )
        assert pos == list(range(1, len(pos) + 1))

    # end-to-end determinism: a second full run writes the same artifact
    out2 = _run_pipeline(spark, docs, tmpdir, "run2")
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in out2.collect()}
    assert a == b
