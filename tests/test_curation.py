"""Curation operators: Gopher repetition signals, C4 line filtering, PII
redaction, boilerplate stripping, per-source quotas.

Semantics pinned here on hand-built fixtures; engine-parity with the
DuckDB oracle is covered by tools/check_correctness.py
(repetition_signals / c4_clean / pii_redact / boilerplate_lines /
strip_boilerplate / source_quota).
"""

from __future__ import annotations

import pytest

from grape_vector_db_spark.operators import curation


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_duplicate_lines(spark):
    df = _mkdocs(spark, [(1, "a b\na b\nc d"), (2, "x y\nz w")])
    out = {r["doc_id"]: r for r in curation.repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 3
    # one excess occurrence of "a b" out of 3 lines
    assert r1["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # excess chars 3 ("a b") over total line chars 9
    assert r1["dup_line_char_frac"] == pytest.approx(3 / 9, abs=1e-6)
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_line_char_frac"] == 0.0


def test_repetition_signals_top_ngram(spark):
    # "go go go go" -> top 2-gram "go go" occurs 3x, len 5, doc chars 11
    df = _mkdocs(spark, [(1, "go go go go")])
    r = curation.repetition_signals(df).collect()[0]
    assert r["top2gram_char_frac"] == pytest.approx(3 * 5 / 11, abs=1e-6)
    assert r["top3gram_char_frac"] == pytest.approx(2 * 8 / 11, abs=1e-6)


def test_repetition_signals_short_doc_zero_grams(spark):
    df = _mkdocs(spark, [(1, "solo")])
    r = curation.repetition_signals(df).collect()[0]
    assert r["top2gram_char_frac"] == 0.0
    assert r["top3gram_char_frac"] == 0.0


def test_c4_line_filter(spark):
    text = "\n".join(
        [
            "this line is long enough.",  # kept
            "too short.",  # < 3 words
            "no terminal punctuation here",  # no punct
            "enable javascript to continue.",  # blocklist
            "accept our cookie policy today.",  # blocklist
            "a line with json { inside.",  # brace
            "another perfectly fine sentence!",  # kept
        ]
    )
    r = curation.c4_line_filter(
        _mkdocs(spark, [(1, text)])
    ).collect()[0]
    assert r["n_lines"] == 7
    assert r["n_kept_lines"] == 2
    assert r["clean_text"] == (
        "this line is long enough.\nanother perfectly fine sentence!"
    )
    assert r["keep"] is False  # 2*2 < 7


def test_c4_keep_flag_majority(spark):
    r = curation.c4_line_filter(
        _mkdocs(spark, [(1, "good solid line here.\nbad")])
    ).collect()[0]
    assert r["n_kept_lines"] == 1 and r["keep"] is True


def test_pii_redact(spark):
    df = _mkdocs(
        spark,
        [(1, "mail a.user@test.org or b@x.io, host 10.1.2.3, tel 555-123-4567 end")],
    )
    r = curation.pii_redact(df).collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (2, 1, 1)
    assert r["clean_text"] == (
        "mail [EMAIL] or [EMAIL], host [IP], tel [PHONE] end"
    )


def test_pii_redact_email_before_ip(spark):
    # the numeric local-part + dotted domain must be eaten by the email
    # pass, not double-counted by the IP pass
    r = curation.pii_redact(_mkdocs(spark, [(1, "x 1.2.3.4@ab.cd y")])).collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 0, 0)
    assert r["clean_text"] == "x [EMAIL] y"


def test_strip_boilerplate(spark):
    boiler = "all rights reserved"
    df = _mkdocs(
        spark,
        [
            (1, f"unique one\n{boiler}\nunique two"),
            (2, f"{boiler}\nother content"),
            (3, boiler),  # only boilerplate -> drops out
        ],
    )
    out = {r["doc_id"]: r for r in curation.strip_boilerplate(df, min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "unique one\nunique two"  # order kept
    assert out[2]["n_kept_lines"] == 1


def test_frequent_lines_distinct_per_doc(spark):
    # repeated inside ONE doc only -> not boilerplate
    df = _mkdocs(spark, [(1, "dup\ndup\ndup"), (2, "other")])
    assert curation.frequent_lines(df, min_docs=2).count() == 0


def test_source_quota_cap_and_determinism(spark):
    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = curation.source_quota(df, per_group=5, group_col="source")
    got1 = sorted((r["source"], r["doc_id"]) for r in out1.collect())
    assert len(got1) == 15
    assert max(r["rk"] for r in out1.collect()) == 5
    # deterministic: same selection on re-run
    got2 = sorted(
        (r["source"], r["doc_id"])
        for r in curation.source_quota(df, per_group=5, group_col="source").collect()
    )
    assert got1 == got2


def test_source_quota_small_group_untouched(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string")
    assert curation.source_quota(df, per_group=10, group_col="source").count() == 3


def test_pack_sequences_offsets_and_bins(spark):
    rows = [
        (1, "a " * 3, "s"),   # 4 tokens? "a a a " -> trim -> "a a a" = 3
        (2, "b " * 5, "s"),   # 5 tokens, starts at 3
        (3, "c " * 4, "s"),   # 4 tokens, starts at 8 -> crosses bin edge 10
        (4, "d d", "t"),      # separate group restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in curation.pack_sequences(df, max_tokens=10).collect()}
    assert (out[1]["start_offset"], out[1]["bin_first"], out[1]["bin_last"]) == (0, 0, 0)
    assert (out[2]["start_offset"], out[2]["bin_first"], out[2]["bin_last"]) == (3, 0, 0)
    # doc 3 spans tokens [8, 12) -> straddles bins 0 and 1
    assert (out[3]["start_offset"], out[3]["bin_first"], out[3]["bin_last"]) == (8, 0, 1)
    assert (out[4]["group"], out[4]["start_offset"]) == ("t", 0)


def test_mixture_stats_shares_sum_to_one(spark):
    rows = [(1, "w w w", "a"), (2, "w", "a"), (3, "w w w w", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["group"]: r for r in curation.mixture_stats(df).collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["n_tokens"] == 4
    assert out["a"]["token_share"] == pytest.approx(0.5, abs=1e-6)
    assert sum(r["token_share"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)


def test_top_ngrams_order_and_ties(spark):
    df = _mkdocs(spark, [(1, "x y x y z"), (2, "x y q")])
    out = curation.top_ngrams(df, n=2, k=3).collect()
    assert (out[0]["gram"], out[0]["n_occurrences"]) == ("x y", 3)
    # ties broken ascending by gram
    assert [r["gram"] for r in out[1:]] == ["y q", "y x"]


def test_mixture_rebalance_keeps_smallest_group_whole(spark):
    rows = [(i, "w " * 20, "big") for i in range(40)] + [
        (100 + i, "w w w", "small") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.mixture_rebalance(df)
    kept = {r["group"]: 0 for r in out.collect()}
    for r in out.collect():
        kept[r["group"]] = kept.get(r["group"], 0) + 1
    # frac = 1.0 for the smallest group -> every row kept
    assert kept["small"] == 3
    # the big group is downsampled toward the small group's token mass
    assert 0 < kept["big"] < 40
    # deterministic: identical selection on rerun
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in curation.mixture_rebalance(df).collect())
    assert a == b


def test_unigram_lm_and_cross_entropy(spark):
    import math

    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    lm = {r["term"]: r["logp"] for r in textanalysis.unigram_lm(df).collect()}
    # counts: a=2 b=2 c=1, N=5 V=3, alpha=0.5
    denom = 5 + 0.5 * 3
    assert lm["a"] == pytest.approx(math.log(2.5 / denom), abs=1e-12)
    assert lm["c"] == pytest.approx(math.log(1.5 / denom), abs=1e-12)
    scored = {
        r["doc_id"]: r
    for r in textanalysis.lm_cross_entropy(
        df, textanalysis.unigram_lm(df)
    ).collect()}
    h1 = -(2 * lm["a"] + lm["b"]) / 3
    assert scored[1]["cross_entropy"] == pytest.approx(h1, abs=1e-6)
    assert scored[1]["ppl"] == pytest.approx(math.exp(h1), abs=1e-4)


def test_lm_cross_entropy_oov_floor(spark):
    from grape_vector_db_spark.operators import textanalysis

    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    lm = textanalysis.unigram_lm(train)
    floor = min(r["logp"] for r in lm.collect())
    out = textanalysis.lm_cross_entropy(
        spark.createDataFrame([(9, "zzz zzz")], "doc_id long, text string"), lm
    ).collect()[0]
    assert out["cross_entropy"] == pytest.approx(-floor, abs=1e-6)


def test_chunk_documents_windows(spark):
    # 10 tokens, chunk=4, overlap=1 -> stride 3 -> chunks at 0,3,6 (+tail)
    df = _mkdocs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    out = sorted(
        curation.chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["start_token"] for r in out] == [0, 3, 6]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["n_chunk_tokens"] == 4 for r in out)


def test_chunk_documents_short_doc_single_chunk(spark):
    df = _mkdocs(spark, [(1, "only two")])
    out = curation.chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1
    assert out[0]["n_chunk_tokens"] == 2 and out[0]["chunk_text"] == "only two"


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _mkdocs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        curation.chunk_documents(df, chunk_tokens=8, overlap=8)


def test_span_corruption_semantics(spark):
    import hashlib

    def masked(doc_id, pos, denom=5):
        h = int(hashlib.md5(f"0:{doc_id}:{pos}".encode()).hexdigest()[:8], 16)
        return h % denom == 0

    text = " ".join(f"t{i}" for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from grape_vector_db_spark.operators import curation

    r = curation.span_corruption(df, mask_denom=5).collect()[0]
    flags = [masked(1, i) for i in range(40)]
    assert r["n_tokens"] == 40 and r["n_masked"] == sum(flags)
    spans = sum(1 for i, f in enumerate(flags) if f and (i == 0 or not flags[i - 1]))
    assert r["n_spans"] == spans

    # reconstruct expected strings
    inp, tgt, k = [], [], 0
    for i, f in enumerate(flags):
        if not f:
            inp.append(f"t{i}")
        elif i == 0 or not flags[i - 1]:
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> t{i}")
            k += 1
        else:
            tgt.append(f"t{i}")
    assert r["input_text"] == " ".join(inp)
    assert r["targets_text"] == " ".join(tgt)

    # round-trip invariant: every original token appears exactly once in
    # input-or-targets (minus sentinels)
    got = [
        t for t in (r["input_text"] + " " + r["targets_text"]).split()
        if not t.startswith("<extra_id_")
    ]
    assert sorted(got) == sorted(text.split())


def test_leakage_safe_split_clusters_never_straddle(spark):
    import pytest as _pytest

    from grape_vector_db_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    # pair graph: chains {0,1,2}, {10,11}, rest singletons
    pairs = spark.createDataFrame([(0, 1), (1, 2), (10, 11)], "a long, b long")
    out = {r["doc_id"]: r for r in dedup.leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 100
    # whole cluster shares one split and one representative
    assert {out[i]["cluster_id"] for i in (0, 1, 2)} == {0}
    assert len({out[i]["split"] for i in (0, 1, 2)}) == 1
    assert {out[i]["cluster_id"] for i in (10, 11)} == {10}
    assert len({out[i]["split"] for i in (10, 11)}) == 1
    # singletons represent themselves; all three splits appear over 100 docs
    assert out[50]["cluster_id"] == 50
    assert {r["split"] for r in out.values()} == {"train", "valid", "test"}
    # deterministic across runs
    again = {
        r["doc_id"]: r["split"]
        for r in dedup.leakage_safe_split(docs, pairs).collect()
    }
    assert {k: v["split"] for k, v in out.items()} == again
    with _pytest.raises(ValueError):
        dedup.leakage_safe_split(docs, pairs, fractions=(0.5, 0.2))
    with _pytest.raises(ValueError):
        dedup.leakage_safe_split(
            docs, pairs, fractions=(0.5, 0.2), labels=("a", "b", "c")
        )


def test_pack_bins_materializes_exact_windows(spark):
    from grape_vector_db_spark.operators import curation

    rows = [
        (1, " ".join(f"a{i}" for i in range(7)), "s"),   # tokens 0..6
        (2, " ".join(f"b{i}" for i in range(6)), "s"),   # tokens 7..12
        (3, "c0 c1", "t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["group"], r["bin"]): r for r in curation.pack_bins(df, max_tokens=5).collect()}
    # group s stream: a0..a6 b0..b5 -> bins of 5: [a0..a4], [a5 a6 b0 b1 b2], [b3 b4 b5]
    assert out[("s", 0)]["bin_text"] == "a0 a1 a2 a3 a4"
    assert out[("s", 1)]["bin_text"] == "a5 a6 b0 b1 b2"
    assert out[("s", 2)]["bin_text"] == "b3 b4 b5"
    assert out[("s", 1)]["n_docs"] == 2 and out[("s", 1)]["n_tokens"] == 5
    assert out[("s", 2)]["n_tokens"] == 3  # last partial window
    assert out[("t", 0)]["bin_text"] == "c0 c1"
    # full windows hold exactly max_tokens; stream reassembles exactly
    full = " ".join(
        out[("s", b)]["bin_text"] for b in range(3)
    )
    assert full == " ".join(f"a{i}" for i in range(7)) + " " + " ".join(
        f"b{i}" for i in range(6)
    )


def test_paragraph_dedup_keeps_first_occurrence(spark):
    df = _mkdocs(
        spark,
        [
            (1, "unique one\nshared para\nunique two"),
            (2, "shared para\nonly here"),
            (3, "shared para"),
        ],
    )
    out = {r["doc_id"]: r for r in curation.paragraph_dedup(df).collect()}
    # doc 1 holds the first occurrence of "shared para" -> keeps all 3
    assert out[1]["n_kept"] == 3
    assert out[1]["kept_text"] == "unique one\nshared para\nunique two"
    # doc 2 loses the duplicate but keeps its own line, order preserved
    assert out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "only here"
    # doc 3 is fully deduplicated away
    assert out[3]["n_kept"] == 0
    assert out[3]["kept_text"] == ""
    assert out[3]["n_paras"] == 1


def test_paragraph_dedup_within_doc_repeat(spark):
    df = _mkdocs(spark, [(1, "a\nb\na\na")])
    out = curation.paragraph_dedup(df).collect()[0]
    # repeated "a" inside one doc also dedups to its first position
    assert out["n_paras"] == 4
    assert out["n_kept"] == 2
    assert out["kept_text"] == "a\nb"


class TestPoolChunkEmbeddings:
    def test_mean_pool_and_renormalize(self, spark):
        from grape_vector_db_spark.operators.curation import pool_chunk_embeddings

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [3.0, 4.0])],
            "doc_id long, embedding array<double>",
        )
        out = {r["doc_id"]: r for r in pool_chunk_embeddings(df).collect()}
        import math

        v1 = out[1]["pooled"]
        assert out[1]["n_chunks"] == 2
        # mean (0.5, 0.5) renormalized -> (1/sqrt2, 1/sqrt2)
        assert abs(v1[0] - 1 / math.sqrt(2)) < 1e-12
        assert abs(v1[1] - 1 / math.sqrt(2)) < 1e-12
        v2 = out[2]["pooled"]
        assert abs(v2[0] - 0.6) < 1e-12 and abs(v2[1] - 0.8) < 1e-12

    def test_zero_vectors_stay_zero(self, spark):
        from grape_vector_db_spark.operators.curation import pool_chunk_embeddings

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (1, [0.0, 0.0])],
            "doc_id long, embedding array<double>",
        )
        row = pool_chunk_embeddings(df).collect()[0]
        assert row["pooled"] == [0.0, 0.0]

    def test_no_normalize_returns_mean(self, spark):
        from grape_vector_db_spark.operators.curation import pool_chunk_embeddings

        df = spark.createDataFrame(
            [(1, [2.0, 4.0]), (1, [0.0, 0.0])],
            "doc_id long, embedding array<double>",
        )
        row = pool_chunk_embeddings(df, normalize=False).collect()[0]
        assert row["pooled"] == [1.0, 2.0]


class TestLengthOutliers:
    def test_bounds_and_sides(self, spark):
        from grape_vector_db_spark.operators.textanalysis import length_outliers

        rows = [(i, "a", v) for i, v in enumerate([1, 10, 11, 12, 13, 14, 15, 16, 17, 100])]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = {r["doc_id"]: r["side"] for r in length_outliers(df).collect()}
        # p5 of 1..100 spread cuts the 1; p95 cuts the 100
        assert out[0] == "short" and out[9] == "long"
        assert len(out) == 2

    def test_groups_get_independent_bands(self, spark):
        from grape_vector_db_spark.operators.textanalysis import length_outliers

        rows = [(i, "a", 10 + i) for i in range(20)] + [
            (100 + i, "b", 1000 + i) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = length_outliers(df).collect()
        # a 1000-char doc is normal for source b — only each group's own
        # tails are flagged
        assert all(r["n_chars"] < 1000 or r["source"] == "b" for r in out)
        assert {r["source"] for r in out} == {"a", "b"}

    def test_approx_path_runs(self, spark):
        from grape_vector_db_spark.operators.textanalysis import length_outliers

        rows = [(i, "a", i) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = length_outliers(df, exact=False).collect()
        assert 0 < len(out) < 40


class TestMixtureApply:
    def test_budget_caps_kept_mass_and_flattens_mixture(self, spark):
        from grape_vector_db_spark.operators.curation import mixture_apply

        # 3 sources: 400/80/20 ten-token docs -> shares 0.8/0.16/0.04
        rows = []
        for g, n in [("big", 400), ("mid", 80), ("small", 20)]:
            for i in range(n):
                rows.append((hash((g, i)) % 10**9, " ".join(["w"] * 10), g))
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        kept = mixture_apply(df, tau=2.0, token_budget=2000).collect()
        by_g = {}
        for r in kept:
            by_g.setdefault(r["group"], 0)
            by_g[r["group"]] += 1
        # tau=2 takes sqrt of shares: the mixture flattens, so the big
        # group must be cut much harder than the small one
        frac_big = by_g.get("big", 0) / 400
        frac_small = by_g.get("small", 0) / 20
        assert frac_big < frac_small
        # kept token mass is in the budget's ballpark (hash gate is
        # probabilistic per group, so allow wide tolerance)
        assert sum(by_g.values()) * 10 < 2 * 2000

    def test_deterministic(self, spark, docs):
        from grape_vector_db_spark.operators.curation import mixture_apply

        a = sorted(r["doc_id"] for r in mixture_apply(docs, token_budget=3000).collect())
        b = sorted(r["doc_id"] for r in mixture_apply(docs, token_budget=3000).collect())
        assert a == b and len(a) > 0


class TestTrimDuplicateSpans:
    def test_owner_keeps_span_others_lose_it(self, spark):
        from grape_vector_db_spark.operators.dedup import trim_duplicate_spans

        shared = "one two three four five"
        rows = [
            (1, f"{shared} alpha beta"),
            (2, f"gamma delta {shared}"),
            (3, "totally different text here now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in trim_duplicate_spans(df, n=5).collect()}
        assert out[1]["n_removed"] == 0 and shared in out[1]["trimmed_text"]
        assert out[2]["n_removed"] == 5
        assert shared not in out[2]["trimmed_text"]
        assert out[2]["trimmed_text"] == "gamma delta"
        assert out[3]["n_removed"] == 0

    def test_fully_duplicated_doc_empties(self, spark):
        from grape_vector_db_spark.operators.dedup import trim_duplicate_spans

        text = "a b c d e"
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in trim_duplicate_spans(df, n=5).collect()}
        assert out[1]["trimmed_text"] == text
        assert out[2]["trimmed_text"] == "" and out[2]["n_removed"] == 5


class TestMixedLanguage:
    def test_mixed_doc_flagged(self, spark):
        from grape_vector_db_spark.operators.textanalysis import mixed_language

        rows = [
            (1, "the quick brown fox and the dog\nder hund und die katze sind da"),
            (2, "the cat and the hat is here\nthe dog and the fox are there"),
            (3, "zzz qqq xxx\nvvv www yyy"),  # no markers anywhere
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in mixed_language(df).collect()}
        assert out[1]["is_mixed"] is True and out[1]["n_langs"] == 2
        assert out[2]["is_mixed"] is False and out[2]["main_lang"] == "en"
        assert out[3]["main_lang"] == "unk" and out[3]["n_langs"] == 0

    def test_empty_lines_ignored(self, spark):
        from grape_vector_db_spark.operators.textanalysis import mixed_language

        df = spark.createDataFrame(
            [(1, "the cat and the dog\n\n\nthe fox and the hen")],
            "doc_id long, text string",
        )
        r = mixed_language(df).collect()[0]
        assert r["n_lines"] == 2
