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


# --- grouped HLL ------------------------------------------------------------


def test_grouped_hll_matches_global_per_group(spark, docs):
    from grape_vector_db_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_grouped,
        hll_registers,
        hll_registers_grouped,
    )

    grouped = hll_estimate_grouped(
        hll_registers_grouped(docs, "text", "lang", p=8), p=8
    ).collect()
    by_lang = {r["grp"]: r for r in grouped}
    for lang in by_lang:
        solo = hll_estimate(
            hll_registers(docs.where(F.col("lang") == lang), "text", p=8), p=8
        ).first()
        assert by_lang[lang]["estimate"] == solo["estimate"]
        assert by_lang[lang]["n_used"] == solo["n_used"]


def test_grouped_hll_accuracy(spark, docs):
    from grape_vector_db_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    est = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_grouped(
            hll_registers_grouped(docs, "text", "lang", p=12), p=12
        ).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    for lang, n in exact.items():
        assert abs(est[lang] - n) / n < 0.15


# --- band self-join ---------------------------------------------------------


def test_band_join_matches_bruteforce(spark):
    from grape_vector_db_spark.operators.asof import value_band_self_join

    rows = [(i, "a" if i % 2 else "b", float(i) * 0.013) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    eps = 0.05
    got = {
        (r["k"], r["a"], r["b"])
        for r in value_band_self_join(df, "v", eps, "id", ["k"]).collect()
    }
    data = [(i, k, v) for i, k, v in rows]
    want = {
        (k1, min(i1, i2), max(i1, i2))
        for i1, k1, v1 in data
        for i2, k2, v2 in data
        if i1 < i2 and k1 == k2 and abs(v1 - v2) <= eps
    }
    assert got == want


def test_band_join_no_duplicate_pairs(spark):
    from grape_vector_db_spark.operators.asof import value_band_self_join

    # values straddling bucket boundaries exactly
    rows = [(1, 0.10), (2, 0.10), (3, 0.15), (4, 0.2000001)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = value_band_self_join(df, "v", 0.1, "id").collect()
    pairs = [(r["a"], r["b"]) for r in out]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {(1, 2), (1, 3), (2, 3), (3, 4)}


def test_band_join_eps_validation(spark):
    from grape_vector_db_spark.operators.asof import value_band_self_join

    with pytest.raises(ValueError):
        value_band_self_join(None, "v", 0.0, "id")


# --- k-anonymity ------------------------------------------------------------


def test_k_anonymity_flags_small_groups(spark):
    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("fr", "a")]
    df = spark.createDataFrame(rows, "lang string, src string")
    out = curation.k_anonymity_report(df, ["lang", "src"], k=5)
    got = {(r["lang"], r["src"]): r["group_size"] for r in out.collect()}
    assert got == {("en", "b"): 2, ("fr", "a"): 1}


def test_k_anonymity_validation(spark):
    with pytest.raises(ValueError):
        curation.k_anonymity_report(None, [], k=5)
    with pytest.raises(ValueError):
        curation.k_anonymity_report(None, ["x"], k=1)


# --- code signals -----------------------------------------------------------


def test_code_signals_separates_code_from_prose(spark):
    from grape_vector_db_spark.operators.textanalysis import code_signals

    code = "def f(x):\n    return x + 1;\nimport os\nvar y = f(2);"
    prose = "The quiet afternoon passed slowly as the rain kept falling."
    df = spark.createDataFrame(
        [(1, code), (2, prose)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in code_signals(df).collect()}
    assert got[1]["code_like"] is True
    assert got[2]["code_like"] is False
    assert got[1]["symbol_ratio"] > got[2]["symbol_ratio"]
    assert got[1]["keyword_hits"] >= 3


# --- forward as-of ----------------------------------------------------------


def test_asof_forward_matches_earliest_at_or_after(spark):
    from grape_vector_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "u"), (2, 25, "u"), (3, 99, "u")],
        "lid long, ts long, user string",
    )
    right = spark.createDataFrame(
        [(100, 10, "u", "a"), (101, 20, "u", "b"), (102, 30, "u", "c")],
        "rid long, ts long, user string, payload string",
    )
    out = asof_join(
        left, right, on="ts", by=["user"], right_id="rid",
        right_cols=["payload"], direction="forward",
    )
    got = {r["lid"]: (r["rid_matched"], r["payload_matched"])
           for r in out.collect()}
    # ts=10 matches SAME-ts right (>=); ts=25 -> next at 30; ts=99 -> none
    assert got == {1: (100, "a"), 2: (102, "c"), 3: (None, None)}


def test_asof_forward_tie_lowest_id(spark):
    from grape_vector_db_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "u")], "lid long, ts long, user string")
    right = spark.createDataFrame(
        [(200, 7, "u", "hi"), (100, 7, "u", "lo")],
        "rid long, ts long, user string, payload string",
    )
    out = asof_join(
        left, right, on="ts", by=["user"], right_id="rid",
        right_cols=["payload"], direction="forward",
    ).first()
    assert out["rid_matched"] == 100 and out["payload_matched"] == "lo"


def test_asof_direction_validation(spark):
    from grape_vector_db_spark.operators.asof import asof_join

    with pytest.raises(ValueError):
        asof_join(None, None, right_id="x", direction="sideways")


# --- bloom gate (stateless column form) -------------------------------------


def test_bloom_gate_matches_probe(spark, docs):
    bench = docs.where(F.col("source") == "src0")
    bits = sketches.bloom_bits(bench, F.col("text"), m_bits=2048, k=3)
    via_probe = {
        r["id"]: r["member"]
        for r in sketches.bloom_probe(
            docs, F.col("text"), bits, m_bits=2048, k=3
        ).collect()
    }
    via_gate = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id",
            sketches.bloom_gate(F.col("text"), bits, 2048, 3).alias("g"),
        ).collect()
    }
    assert via_probe == via_gate


def test_bloom_gate_streaming_parity(spark, tmpdir):
    """The gate is a static narrow filter, so it applies to a stream
    unchanged — micro-batch output must equal the batch filter."""
    src = f"{tmpdir}/in"
    out = f"{tmpdir}/out"
    rows = [(i, f"text number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(src)
    bench = df.where(F.col("doc_id") < 10)
    bits = sketches.bloom_bits(bench, F.col("text"), m_bits=512, k=3)
    gate = sketches.bloom_gate(F.col("text"), bits, 512, 3)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.where(gate)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"] for r in df.where(gate).collect()}
    assert got == want
    assert set(range(10)) <= got  # no false negatives


def test_bloom_gate_accepts_iterable(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    col = sketches.bloom_gate(F.col("text"), {1, 2, 3}, 64, 2)
    assert df.select(col.alias("g")).first()["g"] in (True, False)
    with pytest.raises(ValueError):
        sketches.bloom_gate(F.col("text"), {99}, 64, 2)


# --- k-core peel ------------------------------------------------------------


def test_kcore_keeps_clique_drops_pendant(spark):
    # 4-clique {1,2,3,4} + pendant chain 4-5-6: k=3 peeling keeps only
    # the clique (each clique node has degree 3 inside it)
    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    pairs = spark.createDataFrame(
        clique + [(4, 5), (5, 6)], "a long, b long"
    )
    out = ann.kcore_peel(pairs, k=3, rounds=3).collect()
    got = {r["id"]: r["degree"] for r in out}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_needs_rounds(spark):
    # chain 1-2-3-4-5 with k=2: endpoints peel first, then the cascade
    # unravels everything — but only with enough rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    after1 = ann.kcore_peel(pairs, k=2, rounds=1)
    assert after1.count() == 3  # endpoints gone, 2-3-4 survive round 1
    after3 = ann.kcore_peel(pairs, k=2, rounds=3)
    assert after3.count() == 0  # fully unraveled


def test_kcore_validation(spark):
    with pytest.raises(ValueError):
        ann.kcore_peel(None, k=0)


# --- streaming bloom maintenance --------------------------------------------


def test_stream_bloom_equals_one_shot(spark, tmpdir):
    """Two micro-batches merged by union must equal one-shot bloom_bits
    over the full history (bit-position union IS bitwise OR)."""
    from grape_vector_db_spark.sources.tables import read_table
    from grape_vector_db_spark.streaming.ingest import stream_bloom_to_parquet

    src = f"{tmpdir}/in"
    table = f"{tmpdir}/bloom_table"
    b1 = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(20)], "doc_id long, text string"
    )
    b1.write.parquet(src)
    q = stream_bloom_to_parquet(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        table, "text", m_bits=512, k=3, checkpoint=f"{tmpdir}/ckpt",
    )
    q.awaitTermination(60)

    b2 = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(20, 40)], "doc_id long, text string"
    )
    b2.write.mode("append").parquet(src)
    q = stream_bloom_to_parquet(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        table, "text", m_bits=512, k=3, checkpoint=f"{tmpdir}/ckpt",
    )
    q.awaitTermination(60)

    standing = {r["bit"] for r in read_table(spark, table).collect()}
    full = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(40)], "doc_id long, text string"
    )
    one_shot = {
        r["bit"]
        for r in sketches.bloom_bits(full, F.col("text"), 512, 3).collect()
    }
    assert standing == one_shot
    # and the standing filter gates the full history with no false negatives
    gated = full.where(
        sketches.bloom_gate(F.col("text"), standing, 512, 3)
    ).count()
    assert gated == 40


# --- shuffle shards / token budget ------------------------------------------


def test_shuffle_shards_partition_and_balance(spark):
    from grape_vector_db_spark.operators import curation

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = curation.shuffle_shards(df, n_shards=8, seed=1).collect()
    assert len(out) == 1000
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # every shard present, roughly balanced (uniform 32-bit key)
    assert set(by_shard) == set(range(8))
    assert all(50 <= len(v) <= 250 for v in by_shard.values())
    # pos is a dense 1..n_shard permutation inside each shard
    for v in by_shard.values():
        assert sorted(v) == list(range(1, len(v) + 1))


def test_shuffle_shards_deterministic_and_seed_sensitive(spark):
    from grape_vector_db_spark.operators import curation

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, curation.shuffle_shards(df, 4, seed=1).collect()))
    b = sorted(map(tuple, curation.shuffle_shards(df, 4, seed=1).collect()))
    c = sorted(map(tuple, curation.shuffle_shards(df, 4, seed=2).collect()))
    assert a == b
    assert a != c  # epoch reshuffle = new seed
    with pytest.raises(ValueError):
        curation.shuffle_shards(df, n_shards=0)


def test_global_prefix_sum_matches_serial(spark):
    from grape_vector_db_spark.operators.rank import global_prefix_sum

    rows = [(i, (i * 37) % 11, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    out = global_prefix_sum(df, "k", ["id"], "v", num_buckets=8)
    got = {r["id"]: r["cum"] for r in out.collect()}
    acc = 0
    for i, k, v in sorted(rows, key=lambda t: (t[1], t[0])):
        acc += v
        assert got[i] == acc


def test_token_budget_select_never_overshoots(spark):
    from grape_vector_db_spark.operators import curation

    df = spark.createDataFrame(
        [(i, float(100 - i), 10 + i % 5) for i in range(100)],
        "doc_id long, score double, n_tokens int",
    )
    out = curation.token_budget_select(df, budget=200).collect()
    assert sum(r["n_tokens"] for r in out) <= 200
    # selection is the PREFIX of the score-desc order: ids 0,1,2,...
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(len(ids)))
    assert max(r["cum_tokens"] for r in out) <= 200


def test_shuffle_shards_single_exchange(spark):
    from grape_vector_db_spark.operators import curation
    from grape_vector_db_spark.plans.audit import audit_plan

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = audit_plan(curation.shuffle_shards(df, n_shards=8))
    assert a.shuffles == 1
    assert a.single_partition_exchanges == 0


# --- perceptual image hash --------------------------------------------------


def test_average_hash_known_image(spark):
    """2x2 P6 with pixels summing (dark, dark, bright, bright) must hash
    to 0b0011 at 2x2 (MSB0: first pixel = highest bit)."""
    from grape_vector_db_spark.operators import multimodal

    pixels = bytes([0, 0, 0, 10, 10, 10, 200, 200, 200, 250, 250, 250])
    blob = b"P6\n2 2\n255\n" + pixels
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    row = multimodal.average_hash(df, hash_h=2, hash_w=2).first()
    assert row["ahash"] == 0b0011
    assert row["n_bits"] == 4


def test_average_hash_resilient_to_small_edit(spark):
    """Brightening one channel by 1 must not flip far-from-threshold
    bits: the two blobs hash within hamming <= 1 of each other."""
    from grape_vector_db_spark.operators import multimodal

    base = bytes([0, 0, 0, 10, 10, 10, 200, 200, 200, 250, 250, 250])
    edit = bytes([1]) + base[1:]
    rows = [(1, bytearray(b"P6\n2 2\n255\n" + base)),
            (2, bytearray(b"P6\n2 2\n255\n" + edit))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r["ahash"]
           for r in multimodal.average_hash(df, 2, 2).collect()}
    assert bin(got[1] ^ got[2]).count("1") <= 1


def test_average_hash_validation(spark):
    from grape_vector_db_spark.operators import multimodal

    with pytest.raises(ValueError):
        multimodal.average_hash(None, hash_h=8, hash_w=9)


def test_average_hash_64bit_signed_pack(spark):
    """8x8 = 64-bit hash: a first pixel brighter than average sets bit
    63 -> negative long (two's complement, same convention as simhash);
    hamming via xor/bit_count still counts the true bit difference."""
    from grape_vector_db_spark.operators import dedup, multimodal

    bright_first = bytes([255, 255, 255]) + bytes([0] * (64 * 3 - 3))
    dark_first = bytes([0, 0, 0]) + bytes([255, 255, 255]) + bytes(
        [0] * (64 * 3 - 6)
    )
    rows = [(1, bytearray(b"P6\n8 8\n255\n" + bright_first)),
            (2, bytearray(b"P6\n8 8\n255\n" + dark_first))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r["ahash"]
           for r in multimodal.average_hash(df, 8, 8).collect()}
    assert got[1] == -(1 << 63)  # only bit 63 set
    assert got[2] == 1 << 62  # only bit 62 set
    pairs = dedup.hamming_pairs(
        df.sparkSession.createDataFrame(
            [(1, got[1]), (2, got[2])], "doc_id long, ahash long"
        ),
        bits=64, max_hamming=2, hash_col="ahash",
    ).collect()
    assert [(p["a"], p["b"], p["hamming"]) for p in pairs] == [(1, 2, 2)]


def test_hamming_pairs_generic_finds_all(spark):
    """Generic banded hamming_pairs must equal the exhaustive scan on a
    random 16-bit fingerprint table (pigeonhole guarantee)."""
    import itertools

    from grape_vector_db_spark.operators import dedup

    vals = [(i, (i * 2654435761) % 65536) for i in range(80)]
    df = spark.createDataFrame(vals, "doc_id long, fp long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.hamming_pairs(
            df, bits=16, max_hamming=3, hash_col="fp"
        ).collect()
    }
    want = {
        (a, b, bin(x ^ y).count("1"))
        for (a, x), (b, y) in itertools.combinations(vals, 2)
        if bin(x ^ y).count("1") <= 3
    }
    assert got == want
    with pytest.raises(ValueError):
        dedup.hamming_pairs(df, bits=2, max_hamming=3, hash_col="fp")


# --- audio energy hash ------------------------------------------------------


def _wav_blob(samples):
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(body).to_bytes(4, "little")
    )
    return bytearray(hdr + body)


def test_audio_energy_hash_known_track(spark):
    """4 windows of 2 samples: quiet, quiet, loud, loud -> 0b0011."""
    from grape_vector_db_spark.operators import multimodal

    blob = _wav_blob([0, 1, 2, 1, 1000, -1000, 900, 1100])
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    row = multimodal.audio_energy_hash(df, n_windows=4).first()
    assert row["ehash"] == 0b0011
    assert row["n_bits"] == 4


def test_audio_energy_hash_trailing_samples_ignored(spark):
    """9th sample beyond 4*2 windows must not change the hash."""
    from grape_vector_db_spark.operators import multimodal

    a = _wav_blob([0, 1, 2, 1, 1000, -1000, 900, 1100])
    b = _wav_blob([0, 1, 2, 1, 1000, -1000, 900, 1100, 32767])
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, blob binary"
    )
    got = {r["doc_id"]: r["ehash"]
           for r in multimodal.audio_energy_hash(df, 4).collect()}
    assert got[1] == got[2]


def test_audio_energy_hash_validation(spark):
    from grape_vector_db_spark.operators import multimodal

    with pytest.raises(ValueError):
        multimodal.audio_energy_hash(None, n_windows=65)
    df = spark.createDataFrame(
        [(1, _wav_blob([1, 2]))], "doc_id long, blob binary"
    )
    with pytest.raises(Exception):  # 2 samples cannot fill 4 windows
        multimodal.audio_energy_hash(df, n_windows=4).collect()


def test_audio_energy_hash_64bit_signed_pack(spark):
    """64 one-sample windows with the loud sample FIRST: bit 0 (MSB)
    set -> the packed value must be NEGATIVE (two's-complement into a
    signed long, same convention as average_hash and text simhash)."""
    from grape_vector_db_spark.operators import multimodal

    samples = [30000] + [1] * 63
    df = spark.createDataFrame(
        [(1, _wav_blob(samples))], "doc_id long, blob binary"
    )
    row = multimodal.audio_energy_hash(df, n_windows=64).first()
    assert row["n_bits"] == 64
    # only window 0 is above average: exactly bit 63 of the unsigned
    # pack -> -(2^63) as a signed long
    assert row["ehash"] == -(1 << 63)


# --- streaming CMS maintenance ----------------------------------------------


def test_stream_cms_equals_one_shot(spark, tmpdir):
    """Two micro-batches merged by cell-wise sum must equal one-shot
    cms_table over the full history, and estimates stay one-sided."""
    from grape_vector_db_spark.operators.sketches import cms_estimate, cms_table
    from grape_vector_db_spark.sources.tables import read_table
    from grape_vector_db_spark.streaming.ingest import stream_cms_to_parquet

    src = f"{tmpdir}/in"
    table = f"{tmpdir}/cms_table"
    rows1 = [(i, f"key-{i % 7}") for i in range(30)]
    rows2 = [(i, f"key-{i % 5}") for i in range(30, 60)]
    spark.createDataFrame(rows1, "id long, v string").write.parquet(src)
    for _ in range(2):
        q = stream_cms_to_parquet(
            spark.readStream.schema("id long, v string").parquet(src),
            table, "v", depth=4, width=64, checkpoint=f"{tmpdir}/ckpt",
        )
        q.awaitTermination(60)
        spark.createDataFrame(rows2, "id long, v string").write.mode(
            "append"
        ).parquet(src)

    standing = {
        (r["row"], r["cell"]): r["cnt"] for r in read_table(spark, table).collect()
    }
    full = spark.createDataFrame(rows1 + rows2, "id long, v string")
    one_shot = {
        (r["row"], r["cell"]): r["cnt"]
        for r in cms_table(full, "v", depth=4, width=64).collect()
    }
    assert standing == one_shot
    # one-sided guarantee on the standing sketch
    import collections

    truth = collections.Counter(v for _, v in rows1 + rows2)
    qdf = full.select("v").distinct()
    est = {
        r["value"]: r["estimate"]
        for r in cms_estimate(
            read_table(spark, table), qdf, "v", depth=4, width=64
        ).collect()
    }
    assert all(est[k] >= n for k, n in truth.items())


# --- watermarked stream-stream join -----------------------------------------


def _attr_rows():
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    imps = [(1, ts(0), "ad-a"), (1, ts(30), "ad-b"), (2, ts(5), "ad-c"),
            (3, ts(10), "ad-d")]
    clicks = [(1, ts(4), "c1"),      # within 10m of ad-a
              (1, ts(31), "c2"),     # within 10m of ad-b only
              (2, ts(25), "c3"),     # too late for ad-c
              (4, ts(1), "c4")]      # no impression
    return imps, clicks


def test_attribution_join_batch_semantics(spark):
    from grape_vector_db_spark.streaming.joins import attribution_join

    imps, clicks = _attr_rows()
    li = spark.createDataFrame(imps, "user_id long, imp_ts timestamp, ad string")
    rc = spark.createDataFrame(clicks, "user_id long, click_ts timestamp, click string")
    got = {(r["ad"], r["click"]) for r in attribution_join(li, rc).collect()}
    assert got == {("ad-a", "c1"), ("ad-b", "c2")}
    outer = attribution_join(li, rc, how="left_outer").collect()
    matched = {(r["ad"], r["click"]) for r in outer if r["click"] is not None}
    unmatched = {r["ad"] for r in outer if r["click"] is None}
    assert matched == {("ad-a", "c1"), ("ad-b", "c2")}
    assert unmatched == {"ad-c", "ad-d"}
    # delay carried through
    d = {r["click"]: r["delay_sec"] for r in outer if r["click"] is not None}
    assert d == {"c1": 240.0, "c2": 60.0}


def test_attribution_join_streaming_equals_batch(spark, tmpdir):
    from grape_vector_db_spark.streaming.joins import attribution_join

    imps, clicks = _attr_rows()
    li = spark.createDataFrame(imps, "user_id long, imp_ts timestamp, ad string")
    rc = spark.createDataFrame(clicks, "user_id long, click_ts timestamp, click string")
    li.write.parquet(f"{tmpdir}/imp")
    rc.write.parquet(f"{tmpdir}/clk")
    si = spark.readStream.schema(li.schema).parquet(f"{tmpdir}/imp")
    sc = spark.readStream.schema(rc.schema).parquet(f"{tmpdir}/clk")
    q = (
        attribution_join(si, sc)
        .writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ad"], r["click"])
        for r in spark.read.parquet(f"{tmpdir}/out").collect()
    }
    assert got == {("ad-a", "c1"), ("ad-b", "c2")}


def test_attribution_join_validation(spark):
    from grape_vector_db_spark.streaming.joins import attribution_join

    df = spark.createDataFrame(
        [(1, None, None)], "user_id long, imp_ts timestamp, x string"
    )
    with pytest.raises(ValueError):
        attribution_join(df, df)  # column collision
    with pytest.raises(ValueError):
        attribution_join(df, df.withColumnRenamed("x", "y"), how="full")


# --- market basket ----------------------------------------------------------


def test_basket_pairs_hand_example(spark):
    from grape_vector_db_spark.operators import baskets

    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "z"), (4, "z"),  # within-basket dup must collapse
    ]
    df = spark.createDataFrame(rows, "o long, item string")
    out = {
        (r["item_a"], r["item_b"]): (r["n_pair"], r["support"], r["lift"])
        for r in baskets.basket_pairs(df, "o", "item", min_pair_count=2).collect()
    }
    # (x,y) in baskets 1,2,3 of 4 total; x in 3, y in 3 baskets
    assert out == {("x", "y"): (3, 0.75, round(3 * 4 / (3 * 3), 6))}


def test_basket_pairs_size_cap_drops_basket(spark):
    from grape_vector_db_spark.operators import baskets

    rows = [(1, c) for c in "abcdefgh"] + [(2, "a"), (2, "b"),
                                           (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "o long, item string")
    capped = baskets.basket_pairs(
        df, "o", "item", min_pair_count=2, max_basket_items=4
    ).collect()
    assert {(r["item_a"], r["item_b"], r["n_pair"]) for r in capped} == {
        ("a", "b", 2)
    }
    # support/lift computed over the KEPT baskets only (2 of 3)
    assert capped[0]["support"] == 1.0
    with pytest.raises(ValueError):
        baskets.basket_pairs(df, "o", "item", min_pair_count=0)


# --- fill-in-the-middle -----------------------------------------------------


def test_fim_segments_reassemble_original(spark):
    """PSM reorder must conserve tokens: prefix + middle + suffix ==
    the original token stream for every doc."""
    rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 9))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.fim_transform(df).collect()
    orig = dict(rows)
    for r in out:
        parts = r["fim_text"].split(" ")
        ip, isf, im = (parts.index("<PRE>"), parts.index("<SUF>"),
                       parts.index("<MID>"))
        assert (ip, r["n_tokens"]) == (0, len(orig[r["doc_id"]].split()))
        prefix, suffix, middle = parts[1:isf], parts[isf + 1:im], parts[im + 1:]
        assert prefix + middle + suffix == orig[r["doc_id"]].split()
        assert len(middle) == r["mid_len"]
        assert len(prefix) == r["mid_start"]


def test_fim_deterministic(spark):
    df = spark.createDataFrame([(7, "a b c d e f g")], "doc_id long, text string")
    a = curation.fim_transform(df).first()["fim_text"]
    b = curation.fim_transform(df).first()["fim_text"]
    assert a == b


def test_write_training_shards_roundtrip(spark, tmpdir):
    from grape_vector_db_spark.operators.curation import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    path = f"{tmpdir}/shards"
    write_training_shards(df, path, n_shards=4, seed=3)
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert {r["doc_id"] for r in back.collect()} == set(range(300))
    # one data file per shard; rows inside stored in pos order
    import glob

    for d in glob.glob(f"{path}/shard=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1
        import pyarrow.parquet as pq

        t = pq.read_table(files[0]).to_pydict()
        assert t["pos"] == sorted(t["pos"])
    # determinism: same seed rewrites the same placement
    order1 = {(r["doc_id"], r["shard"], r["pos"]) for r in back.collect()}
    write_training_shards(df, path, n_shards=4, seed=3)
    order2 = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in spark.read.parquet(path).collect()
    }
    assert order1 == order2


# --- Luhn card redaction ----------------------------------------------------


def test_card_redact_luhn_separates_valid(spark):
    rows = [
        (1, "pay 4111 1111 1111 1111 now"),   # valid Visa test PAN
        (2, "ref 4111-1111-1111-1112 bad"),   # checksum fails
        (3, "amex 378282246310005 ok and 1234 too short"),
        (4, "no numbers here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_candidates"], r["n_valid_cards"], r["clean_text"])
        for r in curation.card_redact(df).collect()
    }
    assert got[1] == (1, 1, "pay [CARD] now")
    assert got[2] == (1, 0, "ref [CARD] bad")
    assert got[3] == (1, 1, "amex [CARD] ok and 1234 too short")
    assert got[4] == (0, 0, "no numbers here")


def test_stream_cms_replayed_batch_not_double_counted(spark, tmpdir):
    """A CRASH-replayed batch (same checkpoint lineage, same batch_id
    re-delivered after a crash between the publish and the checkpoint
    commit) must be skipped by the last_batch guard: cell-wise SUM is
    not idempotent, so without it the replay double-counts. Exercised
    through the exported foreachBatch body — the previous emulation
    (fresh checkpoint over the same source) pinned the WRONG semantics:
    a lineage-blind guard silently no-ops a fresh checkpoint's entire
    reprocess (batches 0..last_batch swallowed)."""
    from grape_vector_db_spark.operators.sketches import cms_table
    from grape_vector_db_spark.sources.tables import read_table
    from grape_vector_db_spark.streaming.ingest import cms_merge_batch

    table = f"{tmpdir}/cms"
    rows = [(i, f"k-{i % 5}") for i in range(25)]
    batch = spark.createDataFrame(rows, "id long, v string")
    for _ in range(2):  # second call = the crash replay of batch 0
        cms_merge_batch(
            spark, batch, table, 0, "v", depth=2, width=32, ckpt_tag="c1"
        )
    standing = {
        (r["row"], r["cell"]): r["cnt"]
        for r in read_table(spark, table).collect()
    }
    once = {
        (r["row"], r["cell"]): r["cnt"]
        for r in cms_table(batch, "v", 2, 32).collect()
    }
    assert standing == once


def test_stream_cms_fresh_checkpoint_reprocess_is_counted(spark, tmpdir):
    """A DIFFERENT checkpoint lineage deactivates the replay guard: a
    table standing at last_batch=0 must not swallow a new checkpoint's
    batch 0 (previously an availableNow reprocess with a fresh
    checkpoint was a silent no-op — data loss for any new rows in it)."""
    from grape_vector_db_spark.sources.tables import read_table
    from grape_vector_db_spark.streaming.ingest import cms_merge_batch

    table = f"{tmpdir}/cms2"
    b1 = spark.createDataFrame([(1, "a")], "id long, v string")
    b2 = spark.createDataFrame([(2, "b")], "id long, v string")
    cms_merge_batch(spark, b1, table, 0, "v", depth=2, width=32,
                    ckpt_tag="old")
    cms_merge_batch(spark, b2, table, 0, "v", depth=2, width=32,
                    ckpt_tag="new")
    total = sum(
        r["cnt"] for r in read_table(spark, table).collect()
    )
    # both rows counted in every CMS row of the depth-2 sketch
    assert total == 2 * 2


def test_hamming_pairs_cap_keeps_cold_band_pair(spark):
    """A pair whose LOWEST matching band is hot (capped away) but whose
    higher band is cold must still be found — the first-matching-band
    filter is only valid uncapped."""
    from grape_vector_db_spark.operators import dedup

    # d1=0, d2=0x30: hamming 2; matching bands {0, 2, 3}. Hot docs share
    # band0 value 0 and band3 value 0 (capping both) but have unique
    # nonzero band2 values, so band2's bucket {0} = exactly {d1, d2}.
    rows = [(1, 0), (2, 0x30)] + [
        (10 + i, (i << 8) | 0xF0) for i in range(1, 13)
    ]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.hamming_pairs(
            df, bits=16, max_hamming=3, hash_col="fp", bucket_cap=4
        ).collect()
    }
    assert (1, 2, 2) in got


def test_hamming_pairs_chunked_equals_unchunked(spark):
    """pair_chunk must not change results — only bound per-row memory."""
    from grape_vector_db_spark.operators import dedup

    # clusters of near-identical fingerprints (1-2 bit perturbations of
    # three bases) so the truth set is non-trivial
    bases = [0x1234, 0xBEEF, 0x0F0F]
    vals = [
        (20 * b + j, bases[b] ^ (1 << (j % 16)) ^ ((j % 3) << 8))
        for b in range(3)
        for j in range(20)
    ]
    import itertools

    truth = {
        (a, b, bin(x ^ y).count("1"))
        for (a, x), (b, y) in itertools.combinations(sorted(vals), 2)
        if bin(x ^ y).count("1") <= 3
    }
    assert truth  # sanity: the fixture really has close pairs
    df = spark.createDataFrame(vals, "doc_id long, fp long")
    big = {
        tuple(r)
        for r in dedup.hamming_pairs(
            df, bits=16, max_hamming=3, hash_col="fp", pair_chunk=512
        ).collect()
    }
    tiny = {
        tuple(r)
        for r in dedup.hamming_pairs(
            df, bits=16, max_hamming=3, hash_col="fp", pair_chunk=7
        ).collect()
    }
    assert big == tiny == truth


def test_shingles_tokenless_docs_emit_nothing(spark):
    """All-stopword / short-token docs must emit NO shingle — the old ''
    fallback made every such doc a mutual jaccard-1.0 duplicate of
    unrelated texts and a quadratic hot join key."""
    from grape_vector_db_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "the of and"), (2, "a b c"),
         (3, "quick brown foxes jumping high"), (4, "x y the of")],
        "doc_id long, text string",
    )
    sh = dedup.shingles(df).collect()
    assert {r["doc_id"] for r in sh} == {3}
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
    assert pairs == []  # 1,2,4 are NOT each other's duplicates


def test_cluster_pairs_rejects_string_ids(spark):
    from grape_vector_db_spark.operators import dedup

    pairs = spark.createDataFrame(
        [("doc-a", "doc-b")], "a string, b string"
    )
    with pytest.raises(ValueError, match="integer ids"):
        dedup.cluster_pairs(pairs)


def test_card_redact_never_carves_longer_runs(spark):
    """A 20-digit spaced number must be redacted WHOLE (no residual
    digits) and must not count as a valid card (length > 19)."""
    df = spark.createDataFrame(
        [(1, "ref 9876 5432 1098 7654 3210 end")], "doc_id long, text string"
    )
    r = curation.card_redact(df).first()
    assert r["clean_text"] == "ref [CARD] end"
    assert (r["n_candidates"], r["n_valid_cards"]) == (1, 0)


def test_dedup_doc_lines_preserves_blank_structure(spark):
    """Blank separator lines survive; repeated CONTENT lines dedup."""
    df = spark.createDataFrame(
        [(1, "menu\npara1\n\npara2\n\npara3\nmenu")],
        "doc_id long, text string",
    )
    r = curation.dedup_doc_lines(df).first()
    assert r["clean_text"] == "menu\npara1\n\npara2\n\npara3"
    assert (r["n_lines"], r["n_kept"]) == (7, 6)


def test_repetition_signals_covers_lineless_docs(spark):
    """Empty / whitespace-only docs get zeroed signals, not dropped."""
    df = spark.createDataFrame(
        [(1, ""), (2, "  \n \n"), (3, "real line\nreal line")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in curation.repetition_signals(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_lines"] == 0 and got[1]["dup_line_frac"] == 0.0
    assert got[2]["n_lines"] == 0
    assert got[3]["dup_line_frac"] == 0.5


def test_c4_line_filter_literal_delimiter(spark):
    """A regex-metacharacter delimiter must split literally."""
    df = spark.createDataFrame(
        [(1, "good sentence here.|ok another line.")],
        "doc_id long, text string",
    )
    r = curation.c4_line_filter(df, min_words=2, delim="|").first()
    assert r["clean_text"] == "good sentence here.|ok another line."


# --- canonical whitespace tokenization ---------------------------------------


def test_ws_tokens_edge_whitespace_and_unicode(spark):
    from grape_vector_db_spark.functions.text import ws_tokens
    from grape_vector_db_spark.operators import textanalysis

    rows = [
        (1, "hello world\n"),        # trailing newline: no phantom token
        (2, "\tthe quick fox"),  # NBSP is whitespace (Unicode class)
        (3, " \n\t "),                # whitespace-only: ZERO tokens
        (4, "a  b"),                  # double space: no interior phantom
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["t"])
        for r in df.select("doc_id", ws_tokens("text").alias("t")).collect()
    }
    assert got == {
        1: ["hello", "world"],
        2: ["the", "quick", "fox"],
        3: [],
        4: ["a", "b"],
    }
    tc = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in textanalysis.token_counts(df).collect()
    }
    assert tc == {1: 2, 2: 3, 3: 0, 4: 2}


def test_quality_mean_token_len_exact(spark):
    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(1, "aa  bb"), (2, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["mean_token_len"])
        for r in textanalysis.quality_score(df).collect()
    }
    assert got[1] == (2, 2.0)  # the old (len-(n-1))/n gave 2.5
    assert got[2] == (0, 0.0)


def test_token_entropy_total_over_docs(spark):
    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(1, "a an the of"), (2, "alpha beta alpha beta")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"])
        for r in textanalysis.token_entropy(df).collect()
    }
    assert got[1] == (0, 0.0)  # all stopwords/short: present, zeroed
    assert got[2] == (4, 1.0)


def test_bpe_train_sanitizes_separator_and_end_token(spark):
    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(1, "a\x1fb a\x1fb ab ab"), (2, "x</w>y x</w>y xy")],
        "doc_id long, text string",
    )
    merges = textanalysis.bpe_train(df, n_merges=2)
    # separator never leaks into a symbol, and the training is EXACTLY
    # what the sanitized text would produce (the '\x1f'/'</w>' input
    # variants collapse to plain 'ab'/'xy')
    for _, a, b, _n in merges:
        assert "\x1f" not in a + b
    clean = spark.createDataFrame(
        [(1, "ab ab ab ab"), (2, "xy xy xy")], "doc_id long, text string"
    )
    assert merges == textanalysis.bpe_train(clean, n_merges=2)
    seg = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in textanalysis.bpe_segment_counts(df, merges).collect()
    }
    assert seg[1][0] == 4 and seg[1][1] >= 4


# --- storage-layer hardening --------------------------------------------------


def test_delete_where_keeps_null_predicate_rows(spark):
    from grape_vector_db_spark.sources.tables import delete_where

    df = spark.createDataFrame(
        [(1, "spam"), (2, "ok"), (3, None)], "id long, category string"
    )
    kept = {r["id"] for r in delete_where(df, "category = 'spam'").collect()}
    assert kept == {2, 3}  # SQL DELETE keeps the NULL row


def test_merge_upsert_collapses_duplicate_update_ids(spark):
    from grape_vector_db_spark.sources.tables import merge_upsert

    existing = spark.createDataFrame([(42, "old", 1)], "id long, v string, k int")
    updates = spark.createDataFrame(
        [(42, "b", None), (42, "a", 9)], "id long, v string, k int"
    )
    out = merge_upsert(existing, updates).collect()
    assert len(out) == 1
    # deterministic greatest-row pick, null update field preserved
    assert (out[0]["v"], out[0]["k"]) == ("b", 1)


def test_compact_preserves_partition_layout(spark, tmpdir):
    import glob

    from grape_vector_db_spark.sources.tables import (
        compact, publish_table, read_table,
    )

    path = f"{tmpdir}/ptable"
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(60)], "id long, cluster int, v string"
    )
    publish_table(spark, path, df, partition_by=["cluster"])
    compact(spark, path, target_partitions=2)
    dirs = glob.glob(f"{path}/t=2/cluster=*")
    assert len(dirs) == 3  # layout survived the compaction
    assert read_table(spark, path).count() == 60


def test_snapshot_diff_schema_evolution(spark):
    from grape_vector_db_spark.sources.tables import snapshot_diff

    old = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    new = spark.createDataFrame(
        [(1, "x", 0.9), (2, "y", None)], "id long, v string, score double"
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    # row 1 gained a score value -> changed; row 2's new column is null
    # on both sides -> unchanged
    assert got == {1: "changed", 2: "unchanged"}


def test_table_exists_rejects_bare_directory(spark, tmpdir):
    import os

    from grape_vector_db_spark.sources.tables import table_exists

    bare = f"{tmpdir}/bare"
    os.makedirs(bare)
    assert not table_exists(spark, bare)
    os.makedirs(f"{bare}/t=1")  # uncommitted partial version
    assert not table_exists(spark, bare)


def test_rendezvous_null_id_gets_real_shard(spark):
    from grape_vector_db_spark.sources.tables import rendezvous_shard

    df = spark.createDataFrame([(None,), ("a",)], "id string")
    got = [r["s"] for r in df.select(rendezvous_shard("id", 4).alias("s")).collect()]
    assert all(s is not None and 0 <= s < 4 for s in got)


def test_bm25_empty_query_keeps_corpus_id_type(spark):
    from grape_vector_db_spark.operators import sparse

    df = spark.createDataFrame(
        [("d1", "alpha beta")], "id string, text string"
    )
    empty = sparse.bm25_search(df, "the of and", id_col="id")
    full = sparse.bm25_search(df, "alpha", id_col="id")
    assert empty.dtypes == full.dtypes
    assert empty.count() == 0


def test_tokenize_query_py_matches_jvm_on_edges(spark):
    """Driver replica must equal the JVM tokenizer for astral-plane
    chars and C0 separators (the corpus side strips/fuses them)."""
    from grape_vector_db_spark.functions.text import tokens
    from grape_vector_db_spark.operators.sparse import tokenize_query_py

    cases = ["hello \U0001d400bold world", "aa\x1cbb cc", "café résumé",
             "x y zz"]
    for q in cases:
        jvm = [
            r["t"]
            for r in spark.createDataFrame([(q,)], "s string")
            .select(F.explode(tokens("s")).alias("t"))
            .collect()
        ]
        import collections

        n = float(len(jvm))
        want = (
            {t: c / n for t, c in collections.Counter(jvm).items()} if jvm else {}
        )
        assert tokenize_query_py(q) == want, q


def test_adaptive_fuse_null_history_rows_ignored(spark):
    """NULL query_text history rows must not count as similar queries
    (legacy size(NULL)=-1 made their jaccard (-1)/(-1)=1.0)."""
    from grape_vector_db_spark.operators import fusion

    lists = {
        "dense": spark.createDataFrame([(1, 0.9)], "doc_id long, score double"),
        "sparse": spark.createDataFrame([(1, 0.5)], "doc_id long, score double"),
        "text": spark.createDataFrame([(1, 0.2)], "doc_id long, score double"),
    }
    hist = spark.createDataFrame(
        [(None, 0.1)], "query_text string, satisfaction double"
    )
    with_null = fusion.adaptive_fuse(lists, "some query words", history=hist)
    without = fusion.adaptive_fuse(lists, "some query words", history=None)
    assert with_null.first()["score"] == without.first()["score"]


def test_fuse_limit_zero_returns_no_rows(spark):
    from grape_vector_db_spark.operators import fusion

    lists = {
        "dense": spark.createDataFrame(
            [(1, 0.9), (2, 0.8)], "doc_id long, score double"
        ),
    }
    assert fusion.rrf_fuse(lists, limit=0).count() == 0
    assert fusion.linear_fuse(lists, limit=0).count() == 0


def test_hydrate_columns_edge_cases(spark):
    from grape_vector_db_spark.operators.search import hydrate

    res = spark.createDataFrame([(1, 0.9)], "doc_id long, score double")
    docs = spark.createDataFrame(
        [(1, "t1", "b1"), (2, "t2", "b2")], "doc_id long, title string, body string"
    )
    # id_col inside columns must not become ambiguous
    out = hydrate(res, docs, columns=["doc_id", "title"])
    assert set(out.columns) == {"doc_id", "score", "title"}
    # explicit empty list = no extra columns (not "all columns")
    out2 = hydrate(res, docs, columns=[])
    assert set(out2.columns) == {"doc_id", "score"}
    # result ids missing from documents survive (left-join semantics)
    res3 = spark.createDataFrame([(99, 0.5)], "doc_id long, score double")
    row = hydrate(res3, docs).first()
    assert row["doc_id"] == 99 and row["title"] is None


def test_matryoshka_rejects_short_query(spark, emb):
    from grape_vector_db_spark.operators.search import matryoshka_search

    with pytest.raises(ValueError, match="dims"):
        matryoshka_search(emb, [0.1] * 8, dims=16)


def test_knn_label_vote_honors_id_col(spark, emb):
    from grape_vector_db_spark.operators.search import knn_label_vote

    renamed = emb.withColumnRenamed("vec_id", "item_id")
    out = knn_label_vote(
        renamed.limit(64), renamed.limit(4), k=3, id_col="item_id"
    )
    assert "item_id" in out.columns


# --- stateful streaming hardening --------------------------------------------


def test_sessionize_stream_late_event_extends_start(spark, tmpdir):
    """A late event within gap of the open session must LOWER
    session_start (interval merge), matching the batch sessionizer."""
    from grape_vector_db_spark.streaming.stateful import sessionize_stream

    src = f"{tmpdir}/in"
    M = 1_000_000
    b1 = spark.createDataFrame([(1, 1000 * M)], "user_id long, ts_us long")
    b1.write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts_us long").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=600)
        .writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # batch 2: a late event 500s BEFORE the open session, then a far
    # future event that closes the merged session
    b2 = spark.createDataFrame(
        [(1, 500 * M), (1, 5000 * M), (1, None)], "user_id long, ts_us long"
    )
    b2.write.mode("append").parquet(src)
    q = (
        sessionize_stream(
            spark.readStream.schema("user_id long, ts_us long").parquet(src),
            gap_seconds=600,
        )
        .writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.read.parquet(f"{tmpdir}/out").collect()
    assert len(rows) == 1
    r = rows[0]
    # merged session spans the late event through the original one
    assert (r["session_start"], r["session_end"], r["n_events"]) == (
        500 * M, 1000 * M, 2,
    )


def test_dedup_stream_string_ids(spark, tmpdir):
    from grape_vector_db_spark.streaming.stateful import dedup_stream

    src = f"{tmpdir}/in"
    spark.createDataFrame(
        [("b", "same text"), ("a", "same text"), ("c", "other")],
        "doc_id string, text string",
    ).write.parquet(src)
    q = (
        dedup_stream(
            spark.readStream.schema("doc_id string, text string").parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.read.parquet(f"{tmpdir}/out").collect()}
    assert got == {"a", "c"}  # lowest string id wins; string schema works


# --- evaluation hardening -----------------------------------------------------


def test_retrieval_metrics_dedups_truth(spark):
    from grape_vector_db_spark.operators.evaluation import retrieval_metrics

    res = spark.createDataFrame(
        [("q1", 7, 1), ("q1", 8, 2)], "query_id string, doc_id long, rank int"
    )
    truth = spark.createDataFrame(
        [("q1", 7), ("q1", 7)], "query_id string, doc_id long"
    )
    r = retrieval_metrics(res, truth, k=2).first()
    assert r["precision_2"] == 0.5 and r["recall_2"] == 1.0


def test_knn_label_probe_string_labels(spark):
    from grape_vector_db_spark.operators import evaluation

    corpus = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "vec_id long, label string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, dst long"
    )
    got = {r["label"]: r["accuracy"]
           for r in evaluation.knn_label_probe(edges, corpus).collect()}
    assert got == {"en": 1.0, "de": 0.0}


def test_binary_classifier_null_rows_excluded(spark):
    from grape_vector_db_spark.operators.evaluation import (
        binary_classifier_metrics,
    )

    df = spark.createDataFrame(
        [(1, 0.9, True), (2, None, False), (3, 0.1, None), (4, 0.2, False)],
        "doc_id long, score double, label boolean",
    )
    r = binary_classifier_metrics(df, threshold=0.5).first()
    assert r["n"] == 2 and r["tp"] == 1 and r["tn"] == 1
    assert 0.0 <= r["auc"] <= 1.0


def test_embedding_covariance_skips_null_vectors(spark):
    from grape_vector_db_spark.operators.evaluation import embedding_covariance

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [9.0])],
        "vec_id long, embedding array<double>",
    )
    out = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()}
    assert out[(0, 0)] == 1.0  # var of {1,3} (population)


def test_asof_join_null_timestamps_never_match(spark):
    from grape_vector_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (2, None)], "lid long, ts long"
    )
    right = spark.createDataFrame(
        [(100, None, "x"), (200, 5, "y")], "event_id long, ts long, v string"
    )
    back = {r["lid"]: r["event_id_matched"]
            for r in asof_join(left, right, on="ts", right_id="event_id").collect()}
    assert back == {1: 200, 2: None}  # NULL right ts ignored; NULL left ts no match
    fwd = {r["lid"]: r["event_id_matched"]
           for r in asof_join(
               left, right, on="ts", right_id="event_id", direction="forward"
           ).collect()}
    assert fwd == {1: None, 2: None}


def test_interval_join_rejects_fractional_window(spark):
    from grape_vector_db_spark.operators.asof import interval_join

    df = spark.createDataFrame([(1,)], "ts long")
    with pytest.raises(ValueError, match="integral"):
        interval_join(df, df.withColumnRenamed("ts", "ts_r"), window=2.5, on="ts")


# --- sketch hardening ----------------------------------------------------------


def test_bloom_null_keys_are_ignored_and_gate_survives(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, text string"
    )
    bits = sketches.bloom_bits(df, F.col("text"), m_bits=64, k=2)
    rows = bits.collect()
    assert all(r["bit"] is not None for r in rows)
    gate = sketches.bloom_gate(F.col("text"), bits, 64, 2)
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", gate.alias("g")).collect()}
    assert got[1] is True and got[3] is True


def test_bloom_probe_duplicate_ids_no_false_negative(spark):
    member = spark.createDataFrame([(0, "key")], "doc_id long, text string")
    bits = sketches.bloom_bits(member, F.col("text"), m_bits=256, k=3)
    dup = spark.createDataFrame(
        [(7, "key"), (7, "key"), (8, "other")], "doc_id long, text string"
    )
    got = {
        r["id"]: r["member"]
        for r in sketches.bloom_probe(dup, F.col("text"), bits, 256, 3).collect()
    }
    assert got[7] is True  # duplicate rows must not sum into 2k != k
    assert got[8] is False


def test_hll_ignores_nulls_and_empty_is_zero(spark):
    from grape_vector_db_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), ("a",)], "v string"
    )
    regs = hll_registers(df, "v", p=8)
    assert all(r["register"] is not None for r in regs.collect())
    est = hll_estimate(regs, p=8).first()["estimate"]
    assert 1.5 < est < 2.5
    empty = hll_estimate(
        hll_registers(spark.createDataFrame([], "v string"), "v", p=8), p=8
    ).first()
    assert empty["estimate"] == 0.0


def test_histogram_nan_and_null_group_excluded(spark):
    from grape_vector_db_spark.operators.sketches import (
        histogram_quantiles, histogram_sketch,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", float("nan")), ("g", 3.0), (None, 9.0)],
        "grp string, v double",
    )
    sk = histogram_sketch(df, "v", bins=4, group_col="grp")
    rows = sk.collect()
    assert all(r["grp"] == "g" for r in rows)
    assert sum(r["cnt"] for r in rows) == 2  # NaN and null-group rows excluded
    q = histogram_quantiles(sk, quantiles=(0.5,), group_col="grp").collect()
    assert not any(map(lambda r: r["est"] != r["est"], q))  # no NaN estimates
    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantiles(sk, quantiles=(0.0,), group_col="grp")


# --- geo hardening --------------------------------------------------------------


def test_within_distance_dateline_and_latitude_exactness(spark):
    from grape_vector_db_spark.operators import geo

    rows = [(1, 0.0, -179.95), (2, 60.31, 9.01), (3, 85.0, 180.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    # circle across the dateline
    got = {r["id"] for r in geo.within_distance(df, 0.0, 179.95, 100.0).collect()}
    assert 1 in got
    # in-radius point beyond the center-latitude cos approximation
    got2 = {r["id"] for r in geo.within_distance(df, 60.0, 0.0, 500.0).collect()}
    assert 2 in got2
    # pole-containing circle spans all longitudes
    got3 = {r["id"] for r in geo.within_distance(df, 80.0, 0.0, 2000.0).collect()}
    assert 3 in got3


def test_distance_pairs_antimeridian_seam(spark):
    from grape_vector_db_spark.operators import geo

    rows = [(1, 66.0, 178.1), (2, 66.0, -179.8), (3, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    pairs = {(r["a"], r["b"]) for r in geo.distance_pairs(df, 100.0).collect()}
    assert (1, 2) in pairs  # ~95 km apart across the seam


def test_haversine_antipodal_not_nan(spark):
    import math

    from grape_vector_db_spark.operators.geo import haversine_km

    df = spark.createDataFrame([(10.0, 0.0, -10.0, 180.0)],
                               "a double, b double, c double, d double")
    v = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")
    ).first()["d"]
    assert not math.isnan(v) and v > 19000


def test_merge_upsert_partial_schema_preserves_columns(spark):
    """An update batch carrying only (id + changed fields) — the natural
    client shape — must merge cleanly: absent columns keep stored values
    for existing rows and are NULL for new rows."""
    from grape_vector_db_spark.sources.tables import merge_upsert

    existing = spark.createDataFrame(
        [(1, "old-a", "en"), (2, "old-b", "de")],
        "id long, text string, lang string",
    )
    updates = spark.createDataFrame(
        [(1, "new-a"), (3, "new-c")], "id long, text string"
    )
    out = {r["id"]: r for r in merge_upsert(existing, updates).collect()}
    assert out[1]["text"] == "new-a" and out[1]["lang"] == "en"
    assert out[2]["text"] == "old-b" and out[2]["lang"] == "de"
    assert out[3]["text"] == "new-c" and out[3]["lang"] is None


def test_textrank_chunk_semantics(spark):
    """A 2-clique of identical chunks outranks an isolated chunk; a
    single-chunk doc keeps the teleport floor (1-d)/1; ties break on
    the lower chunk_id."""
    from grape_vector_db_spark.operators import textanalysis

    docs = spark.createDataFrame(
        [(1, "a b c d a b c d w x y z"), (2, "one lonely chunk here")],
        "doc_id long, text string",
    )
    out = textanalysis.textrank_chunks(
        docs, chunk_tokens=4, top_s=3, iterations=4
    ).collect()
    d1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: r["rank"]
    )
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]  # clique first, id tie
    assert d1[0]["score"] == d1[1]["score"] > d1[2]["score"]
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and abs(d2[0]["score"] - 0.15) < 1e-9
