"""textanalysis/curation hardening pins (self-review findings):

1. language_id: zero-evidence docs (no marker of ANY language) predict
   'unk' — the alphabetical tie-break used to label them all 'de'.
2. hashed_features emits a ZERO-vector row for token-less docs instead
   of silently dropping them from the feature table.
3. The split(trim(x), '\\s+') phantom-token family: whitespace-only and
   newline-terminated docs tokenize cleanly (ws_tokens_cased), so
   repetition_signals honors its zeroed-signals contract and
   pack_sequences' token budgets stop counting phantom '' tokens.
4. _lines trims the full Unicode whitespace class: a tab-only "line" is
   empty, not content (c4_line_filter denominators, strip_boilerplate
   reassembly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grape_vector_db_spark.operators import curation, textanalysis


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLanguageIdUnknownFloor:
    def test_zero_evidence_predicts_unk(self, spark):
        df = _docs(
            spark,
            [(1, "0x1F 0x2E 0x3D 12345 67890"),  # symbol/number-only
             (2, "the quick brown fox and the lazy dog"),  # english
             (3, "der hund und die katze sind nicht da")],  # german
        )
        out = {r["doc_id"]: r for r in textanalysis.language_id(df).collect()}
        assert out[1]["pred_lang"] == "unk"
        assert out[1]["lang_score"] == 0.0
        assert out[2]["pred_lang"] == "en"
        assert out[3]["pred_lang"] == "de"


class TestHashedFeaturesRowPerDoc:
    def test_tokenless_doc_gets_zero_vector(self, spark):
        df = _docs(spark, [(1, "the and of to"), (2, "vector merge")])
        out = {
            r["doc_id"]: r["features"]
            for r in textanalysis.hashed_features(df, dim=8).collect()
        }
        # doc 1 is all stopwords under the reference tokenizer: it must
        # still appear, with the zero vector
        assert set(out) == {1, 2}
        assert out[1] == [0] * 8
        assert sum(out[2]) == 2


class TestPhantomTokens:
    def test_whitespace_only_doc_has_zeroed_signals(self, spark):
        df = _docs(spark, [(1, "\n\n"), (2, "\t \t")])
        out = {
            r["doc_id"]: r
            for r in curation.repetition_signals(df).collect()
        }
        for i in (1, 2):
            # the phantom '' tokens made top2gram_char_frac 0.5 here
            assert out[i]["top2gram_char_frac"] == 0.0
            assert out[i]["dup_line_frac"] == 0.0

    def test_trailing_newline_does_not_inflate_token_budget(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma\n", "s"), (2, "alpha beta gamma", "s")],
            "doc_id long, text string, source string",
        )
        out = {
            r["doc_id"]: r["n_tokens"]
            for r in curation.pack_sequences(df, max_tokens=512).collect()
        }
        assert out[1] == out[2] == 3  # was 4 vs 3 pre-fix

    def test_nbsp_is_a_token_separator(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha\u00a0beta", "s")],  # interior NBSP
            "doc_id long, text string, source string",
        )
        row = curation.pack_sequences(df, max_tokens=512).collect()[0]
        assert row["n_tokens"] == 2  # was 1: interior NBSP never split


class TestLineTrimClass:
    def test_tab_only_line_is_not_content(self, spark):
        df = _docs(
            spark,
            [(1, "good line one stands here.\n\t\nanother good line here.")],
        )
        row = curation.c4_line_filter(df).collect()[0]
        # was n_lines=3 (the '\t' line counted), deflating the keep rule
        assert row["n_lines"] == 2
        assert row["n_kept_lines"] == 2
