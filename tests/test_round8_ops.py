"""Round-8 operators: discovery / context search, bounded distance
matrix, Gopher rule filter."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import search, textanalysis


def _vec(emb, vid):
    return [float(x) for x in emb.where(F.col("vec_id") == vid).head()["embedding"]]


def _cos(a, b):
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0 or nb == 0:
        return 0.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


class TestDiscover:
    def test_votes_and_tiebreak_match_python_replay(self, spark, emb):
        pairs = [(1, 3), (2, 4)]
        out = search.discover(emb, target_id=0, context_pairs=pairs, k=10).collect()
        assert len(out) == 10
        vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
        expected = []
        for vid, v in vecs.items():
            if vid in (0, 1, 2, 3, 4):
                continue
            votes = sum(
                1
                for p, n in pairs
                if round(_cos(v, vecs[p]), 6) > round(_cos(v, vecs[n]), 6)
            )
            expected.append((votes, round(_cos(v, vecs[0]), 6), vid))
        expected.sort(key=lambda t: (-t[0], -t[1], t[2]))
        got = [(r["votes"], r["score"], r["vec_id"]) for r in out]
        assert got == [(v, s, i) for v, s, i in expected[:10]]

    def test_votes_dominate_target_similarity(self, spark, emb):
        out = search.discover(
            emb, target_id=0, context_pairs=[(1, 3), (2, 4)], k=50
        ).collect()
        votes = [r["votes"] for r in out]
        assert votes == sorted(votes, reverse=True)

    def test_examples_excluded_and_empty_pairs_rejected(self, spark, emb):
        out = search.discover(emb, 0, [(1, 3)], k=200).collect()
        assert {0, 1, 3}.isdisjoint({r["vec_id"] for r in out})
        with pytest.raises(ValueError):
            search.discover(emb, 0, [])
        with pytest.raises(KeyError):
            search.discover(emb, 0, [(1, 10**12)])


class TestContextRank:
    def test_zero_is_best_and_penalty_is_quadratic(self, spark, emb):
        pairs = [(1, 3), (2, 4), (5, 7)]
        out = search.context_rank(emb, pairs, k=10).collect()
        assert all(r["score"] <= 0.0 for r in out)
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)
        vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
        top = out[0]
        v = vecs[top["vec_id"]]
        total = 0.0
        for p, n in pairs:
            pc = round(_cos(v, vecs[p]), 6)
            nc = round(_cos(v, vecs[n]), 6)
            total += 0.0 if pc > nc else -((nc - pc) ** 2)
        assert top["score"] == pytest.approx(round(total, 6), abs=1e-9)

    def test_ties_break_on_id(self, spark, emb):
        out = search.context_rank(emb, [(1, 3)], k=30).collect()
        zero = [r["vec_id"] for r in out if r["score"] == 0.0]
        assert zero == sorted(zero)


class TestDistanceMatrix:
    def test_shape_symmetric_sample_and_values(self, spark, emb):
        out = search.distance_matrix(emb, sample=8).collect()
        assert len(out) == 8 * 7 // 2
        ids = sorted(
            r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").head(8)
        )
        seen = {(r["id_a"], r["id_b"]) for r in out}
        assert all(a < b and a in ids and b in ids for a, b in seen)
        vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
        for r in out[:5]:
            assert r["cosine"] == pytest.approx(
                round(_cos(vecs[r["id_a"]], vecs[r["id_b"]]), 6), abs=1e-9
            )

    def test_sample_below_two_rejected(self, spark, emb):
        with pytest.raises(ValueError):
            search.distance_matrix(emb, sample=1)


class TestGopherRules:
    def test_rule_signals_on_crafted_docs(self, spark):
        rows = [
            # healthy English prose: passes every rule
            (1, "the quick brown fox jumps over " * 12 + "the lazy dog with it"),
            # too short
            (2, "the tiny one"),
            # symbol-heavy: ### and ellipses push symbol_ratio over 0.1
            (3, "the code ### block ... " * 20),
            # bullet list: every line starts with a bullet
            (4, "\n".join("- the item number %d of list" % i for i in range(12))),
            # non-alphabetic tokens
            (5, " ".join(str(i) for i in range(60)) + " the of"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in textanalysis.gopher_rules(df).collect()}
        assert out[1]["keep"] == 1
        assert out[2]["keep"] == 0 and out[2]["n_words"] < 50
        assert out[3]["symbol_ratio"] > 0.1 and out[3]["keep"] == 0
        assert out[4]["bullet_frac"] == 1.0 and out[4]["keep"] == 0
        assert out[5]["alpha_word_frac"] < 0.8 and out[5]["keep"] == 0

    def test_ellipsis_lines_and_stop_hits(self, spark):
        text = "\n".join(
            ["the first line trails off...", "have a solid line with that"]
            + ["the filler line %d goes on and on here" % i for i in range(10)]
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = textanalysis.gopher_rules(df).head()
        assert r["ellipsis_frac"] == pytest.approx(round(1 / 12, 6))
        # the, have, a->no, and, that, with, of->no, to->no, be->no
        assert r["stop_hits"] == 5

    def test_empty_lines_excluded_from_line_denominators(self, spark):
        df = spark.createDataFrame(
            [(1, "- the bullet one\n\n\n- the bullet two")],
            "doc_id long, text string",
        )
        r = textanalysis.gopher_rules(df).head()
        assert r["bullet_frac"] == 1.0

    def test_corpus_split_is_nontrivial(self, spark, docs):
        out = textanalysis.gopher_rules(
            docs, min_words=30, min_stop_hits=1
        ).agg(
            F.sum("keep").alias("kept"), F.count("*").alias("n")
        ).head()
        assert 0 < out["kept"] < out["n"]


class TestPlanPins:
    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_discover_is_shuffle_free_topk(self, spark, emb):
        """Votes + target cosine all fold into one scan: the plan must be
        the knn shape — TakeOrderedAndProject, zero Exchange."""
        plan = self._plan(search.discover(emb, 0, [(1, 3), (2, 4)], k=10))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan

    def test_context_rank_is_shuffle_free_topk(self, spark, emb):
        plan = self._plan(search.context_rank(emb, [(1, 3), (2, 4)], k=10))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan

    def test_distance_matrix_broadcasts_both_sides(self, spark, emb):
        """The corpus must never shuffle for the pair join — the sampled
        slice broadcasts (the cap makes it tiny by contract)."""
        plan = self._plan(search.distance_matrix(emb, sample=8))
        assert "BroadcastNestedLoopJoin" in plan
        assert "ShuffleExchange" not in plan and "hashpartitioning" not in plan

    def test_gopher_rules_is_pure_map(self, spark, docs):
        """Seven signals + keep in ONE narrow scan: no join, no
        aggregate, no shuffle anywhere in the plan."""
        plan = self._plan(textanalysis.gopher_rules(docs))
        assert "Exchange" not in plan
        assert "Join" not in plan and "Aggregate" not in plan


class TestFacadeDiscovery:
    @pytest.fixture()
    def db(self, spark, docs, emb):
        import shutil
        import tempfile

        from grape_vector_db_spark.db import GrapeVectorDB

        d = tempfile.mkdtemp(prefix="gvdb_r8_")
        inst = GrapeVectorDB(spark, d)
        inst.add_documents(docs, emb)
        yield inst
        shutil.rmtree(d, ignore_errors=True)

    def test_discover_matches_operator(self, db, emb):
        got = db.discover(0, [(1, 3), (2, 4)], limit=5).collect()
        want = search.discover(emb, 0, [(1, 3), (2, 4)], k=5).collect()
        assert [(r["vec_id"], r["votes"], r["score"]) for r in got] == [
            (r["vec_id"], r["votes"], r["score"]) for r in want
        ]

    def test_filtered_discover_can_reference_excluded_examples(self, db):
        """The filter restricts candidates only: example ids resolve
        against the full corpus even when the filter excludes them."""
        flt = {"must": [{"type": "equals", "field": "lang", "value": "en"}]}
        keep = {
            r["doc_id"]
            for r in db.documents().where("lang = 'en'").select("doc_id").collect()
        }
        ex = sorted(set(range(20)) - keep)[:2]
        if len(ex) < 2:
            pytest.skip("fixture has no non-en docs among ids 0..19")
        out = db.discover(ex[0], [(ex[1], ex[0])], limit=20, filter=flt).collect()
        assert out, "filtered discover returned nothing"
        ids = {r["vec_id"] for r in out}
        assert ids <= keep

    def test_context_search_and_distance_matrix(self, db, emb):
        got = db.context_search([(1, 3), (2, 4)], limit=5).collect()
        want = search.context_rank(emb, [(1, 3), (2, 4)], k=5).collect()
        assert [(r["vec_id"], r["score"]) for r in got] == [
            (r["vec_id"], r["score"]) for r in want
        ]
        dm = db.distance_matrix(sample=6).collect()
        assert len(dm) == 15

    def test_recommend_matches_operator(self, db, emb):
        for strategy in ("average_vector", "best_score"):
            got = db.recommend(
                [1, 2], [3], limit=5, strategy=strategy
            ).collect()
            want = search.recommend(
                emb, [1, 2], [3], k=5, strategy=strategy
            ).collect()
            assert [(r["vec_id"], r["score"]) for r in got] == [
                (r["vec_id"], r["score"]) for r in want
            ], strategy

    def test_filtered_recommend_resolves_excluded_examples(self, db):
        """Same contract as discover: the filter restricts CANDIDATES
        only — example ids outside the filter still resolve against the
        full corpus."""
        flt = {"must": [{"type": "equals", "field": "lang", "value": "en"}]}
        keep = {
            r["doc_id"]
            for r in db.documents().where("lang = 'en'")
            .select("doc_id").collect()
        }
        ex = sorted(set(range(20)) - keep)[:2]
        if len(ex) < 2:
            pytest.skip("fixture has no non-en docs among ids 0..19")
        out = db.recommend([ex[0]], [ex[1]], limit=20, filter=flt).collect()
        assert out, "filtered recommend returned nothing"
        assert {r["vec_id"] for r in out} <= keep

    def test_filtered_discovery_uses_posting_route(self, db, emb):
        """With a payload index built, the example-based endpoints'
        filter gates come from posting algebra — the wide documents
        table never appears in the plan."""
        db.build_index("payload", columns=["lang"])
        flt = {"must": [{"type": "equals", "field": "lang", "value": "en"}]}
        for df in (
            db.recommend([1, 2], limit=5, filter=flt),
            db.discover(0, [(1, 3)], limit=5, filter=flt),
            db.context_search([(1, 3)], limit=5, filter=flt),
        ):
            plan = (
                df._jdf.queryExecution().executedPlan().toString()
            )
            assert "documents" not in plan
            assert "index_payload" in plan
