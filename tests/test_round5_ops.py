"""Round-5 additions: kNN graph, classifier eval, n-gram diversity,
cluster-debiased sampling, Unicode normalization."""

from __future__ import annotations

import hashlib
import re
import unicodedata

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import ann, curation, dedup, sampling
from grape_vector_db_spark.operators.evaluation import binary_classifier_metrics
from grape_vector_db_spark.operators.textanalysis import language_scores


# ---------------------------------------------------------------- knn graph


def _brute_knn(ids, X, k):
    norm = np.sqrt((X * X).sum(axis=1))
    denom = norm[:, None] * norm[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        S = np.where(denom > 0, X @ X.T / denom, 0.0)
    S = np.round(S, 6)
    expect = {}
    for i in range(len(ids)):
        cands = sorted(
            (-S[i, j], ids[j]) for j in range(len(ids)) if ids[j] != ids[i]
        )
        expect[ids[i]] = [
            (int(d), round(-c, 6), r + 1) for r, (c, d) in enumerate(cands[:k])
        ]
    return expect


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_knn_graph_matches_brute_force(spark, emb, n_blocks):
    rows = emb.limit(80).collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    sub = emb.limit(80)
    got = {}
    for r in ann.knn_graph(sub, k=4, n_blocks=n_blocks).collect():
        got.setdefault(r.src, []).append((r.dst, round(r.cosine, 6), r.rank))
    for s in got:
        got[s].sort(key=lambda t: t[2])
    assert got == _brute_knn(ids, X, 4)


def test_knn_graph_k_larger_than_corpus(spark, emb):
    sub = emb.limit(5)
    out = ann.knn_graph(sub, k=10, n_blocks=2).collect()
    # every node sees all 4 others, never itself, ranks contiguous
    per = {}
    for r in out:
        assert r.src != r.dst
        per.setdefault(r.src, []).append(r.rank)
    assert len(per) == 5
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_mutual_knn_pairs_subset_and_symmetry(spark, emb):
    edges = ann.knn_graph(emb.limit(60), k=3, n_blocks=2)
    eset = {(r.src, r.dst) for r in edges.collect()}
    mut = ann.mutual_knn_pairs(edges).collect()
    seen = set()
    for r in mut:
        assert r.a < r.b
        assert (r.a, r.b) in eset and (r.b, r.a) in eset
        seen.add((r.a, r.b))
    # completeness: every reciprocated edge appears
    expect = {
        (min(a, b), max(a, b))
        for (a, b) in eset
        if (b, a) in eset
    }
    assert seen == expect


# ---------------------------------------------------------- classifier eval


def test_binary_classifier_metrics_vs_pandas(spark):
    rng = np.random.default_rng(11)
    n = 300
    y = rng.random(n) < 0.35
    s = np.round(np.where(y, rng.normal(0.6, 0.2, n), rng.normal(0.4, 0.2, n)), 2)
    df = spark.createDataFrame(
        [(i, float(s[i]), bool(y[i])) for i in range(n)],
        "doc_id long, score double, label boolean",
    )
    row = binary_classifier_metrics(df, threshold=0.5).collect()[0]
    ranks = pd.Series(s).rank(method="average")
    npos = int(y.sum())
    auc = (ranks[y].sum() - npos * (npos + 1) / 2) / (npos * (n - npos))
    tp = int(((s >= 0.5) & y).sum())
    fp = int(((s >= 0.5) & ~y).sum())
    fn = int(((s < 0.5) & y).sum())
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert (row.n, row.n_pos, row.tp, row.fp, row.fn) == (n, npos, tp, fp, fn)
    assert row.auc == round(auc, 6)
    assert row.f1 == round(2 * prec * rec / (prec + rec), 6)


def test_binary_classifier_metrics_degenerate(spark):
    # empty input -> zero row with auc 0.5
    empty = spark.createDataFrame([], "doc_id long, score double, label boolean")
    row = binary_classifier_metrics(empty).collect()[0]
    assert (row.n, row.tp, row.auc) == (0, 0, 0.5)
    # single class -> auc 0.5, recall well-defined
    one = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.1, True)],
        "doc_id long, score double, label boolean",
    )
    r1 = binary_classifier_metrics(one, threshold=0.5).collect()[0]
    assert r1.auc == 0.5 and r1.recall == 0.5 and r1.precision == 1.0


def test_language_scores_consistent_with_language_id(spark, docs):
    from grape_vector_db_spark.operators.textanalysis import language_id

    sc = language_scores(docs.limit(50))
    lid = language_id(docs.limit(50))
    j = sc.join(lid, "doc_id").collect()
    langs = ["de", "en", "es", "fr", "zh"]
    for r in j:
        best = max(r[f"s_{lang}"] for lang in langs)
        assert r.lang_score == best
        # argmax ties break alphabetically
        first = next(lang for lang in langs if r[f"s_{lang}"] == best)
        assert r.pred_lang == first


# --------------------------------------------------------- ngram diversity


def test_ngram_diversity_small(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "x y x y"),       # grams: "x y","y x","x y" -> 3 total 2 distinct
            (2, "a", "z"),             # too short: no grams, still counted as doc
            (3, "b", "p q r"),         # "p q","q r"
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in curation.ngram_diversity(df, n=2).collect()}
    assert rows["a"].n_docs == 2
    assert rows["a"].total_ngrams == 3
    assert rows["a"].distinct_ngrams == 2
    assert rows["a"].diversity == round(2 / 3, 6)
    assert rows["b"].total_ngrams == 2 and rows["b"].diversity == 1.0


def test_ngram_diversity_all_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "s", "one"), (2, "s", "two")],
        "doc_id long, source string, text string",
    )
    r = curation.ngram_diversity(df, n=2).collect()[0]
    assert (r.n_docs, r.total_ngrams, r.distinct_ngrams, r.diversity) == (
        2, 0, 0, 0.0,
    )


# ----------------------------------------------------------- cluster sample


def test_cluster_debiased_sample_semantics(spark, docs):
    sub = docs.limit(120)
    pairs = dedup.minhash_lsh_pairs(sub, num_hashes=16, threshold=0.2)
    clusters = dedup.cluster_pairs(pairs)
    out = sampling.cluster_debiased_sample(
        sub, clusters, seed=3, keep_cols=("source",)
    ).collect()
    cl = {r.doc_id: r.cluster_id for r in clusters.collect()}
    sizes: dict = {}
    for cid in cl.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    for r in out:
        exp_cid = cl.get(r.doc_id, r.doc_id)
        exp_size = sizes.get(exp_cid, 1) if r.doc_id in cl else 1
        assert r.cluster_id == exp_cid
        assert r.cluster_size == exp_size == r.weight
        # gate replayed (python twin of functions.hashing.h32, seed 3)
        h = int(hashlib.md5(f"3:{r.doc_id}".encode()).hexdigest()[:8], 16)
        assert h < (1.0 / exp_size) * (2**32)
    # singletons (prob 1) are all kept
    kept = {r.doc_id for r in out}
    all_ids = {r.doc_id for r in sub.select("doc_id").collect()}
    singletons = all_ids - set(cl)
    assert singletons <= kept


# ----------------------------------------------------------- normalization


def _py_norm(s: str) -> str:
    s = re.sub(curation.CONTROL_CHAR_RE, "", s)
    s = "".join(c for c in s if unicodedata.category(c) != "Cf")
    s = unicodedata.normalize("NFC", s)
    s = re.sub(r"[ \t]+", " ", s)
    return s.strip(" ")


def test_normalize_text_rules(spark):
    cases = [
        "Cafe\u0301",               # decomposed -> composed
        "a\u200bb",                 # ZWSP (Cf) stripped
        "x\x07y\x00z",                     # Cc stripped
        "keep\tthese\nlines\r\n",          # \t collapsed, \n \r kept
        "  lots   of\t\tspace  ",
        "nbsp\u00a0stays",          # Zs is NOT whitespace-collapsed
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.norm_text
        for r in curation.normalize_text(df).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == (None if c is None else _py_norm(c)), (i, c)
    assert got[0] == "Caf\u00e9"
    assert got[1] == "ab"
    assert got[2] == "xyz"
    assert got[5] == "nbsp\u00a0stays"


def test_normalize_text_matches_duckdb(spark):
    import duckdb

    cases = ["Cafe\u0301 et cre\u0300me", "a\u200b\tb  c\x07", " plain ascii "]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string"
    )
    srows = {
        r.doc_id: r.norm_text for r in curation.normalize_text(df).collect()
    }
    con = duckdb.connect()
    norm = (
        "trim(regexp_replace(nfc_normalize(regexp_replace(regexp_replace("
        f"?, '{curation.CONTROL_CHAR_RE}', '', 'g'), "
        r"'\p{Cf}', '', 'g')), '[ \t]+', ' ', 'g'), ' ')"
    )
    for i, c in enumerate(cases):
        d = con.execute(f"select {norm}", [c]).fetchone()[0]
        assert srows[i] == d, (i, c)
        assert (
            hashlib.md5(srows[i].encode()).hexdigest()
            == con.execute("select md5(?)", [srows[i]]).fetchone()[0]
        )


# ------------------------------------------------------ hubness / keywords


def test_knn_in_degree_histogram(spark, emb):
    sub = emb.where(F.col("vec_id") < 40)
    edges = ann.knn_graph(sub, k=3, n_blocks=2)
    hist = {
        r.in_degree: r.n_nodes
        for r in ann.knn_in_degree_histogram(edges, sub).collect()
    }
    # hand-count from the edge list
    deg: dict = {}
    ids = {r.vec_id for r in sub.collect()}
    for r in edges.collect():
        deg[r.dst] = deg.get(r.dst, 0) + 1
    expect: dict = {}
    for i in ids:
        d = deg.get(i, 0)
        expect[d] = expect.get(d, 0) + 1
    assert hist == expect
    # mass conservation: every node appears exactly once
    assert sum(hist.values()) == len(ids)
    # total in-degree == total edges (k per src)
    assert sum(d * n for d, n in hist.items()) == len(list(edges.collect()))


def test_doc_keywords_formula_and_ranks(spark):
    from grape_vector_db_spark.operators import sparse
    import math

    # three docs with known term tables
    terms = spark.createDataFrame(
        [
            (1, "apple", 0.5), (1, "pie", 0.5),
            (2, "apple", 0.25), (2, "zebra", 0.75),
            (3, "apple", 1.0),
        ],
        "doc_id long, term string, tf double",
    )
    out = sparse.doc_keywords(terms, top_k=2).collect()
    n = 3
    df = {"apple": 3, "pie": 1, "zebra": 1}

    def tfidf(tf, t):
        return round(tf * (math.log((n + 1) / (df[t] + 1)) + 1), 6)

    got = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in out}
    # doc 1: pie (idf 1.693..) * .5 beats apple (idf 1.0) * .5
    assert got[(1, 1)] == ("pie", tfidf(0.5, "pie"))
    assert got[(1, 2)] == ("apple", tfidf(0.5, "apple"))
    # doc 3: single term still emitted, rank 1
    assert got[(3, 1)] == ("apple", tfidf(1.0, "apple"))
    assert (3, 2) not in got


def test_knn_communities_are_valid_components(spark, emb):
    from grape_vector_db_spark.operators import dedup

    sub = emb.where(F.col("vec_id") < 100)
    pairs = ann.mutual_knn_pairs(ann.knn_graph(sub, k=4, n_blocks=2)).where(
        F.col("cosine") >= 0.25
    ).select("a", "b")
    prows = [(r.a, r.b) for r in pairs.collect()]
    comp = {r.doc_id: r.cluster_id for r in dedup.cluster_pairs(pairs).collect()}
    # union-find reference
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in prows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert comp == expect


# ------------------------------------------------------------ sessionize


def test_sessionize_boundary_and_rollups(spark):
    from grape_vector_db_spark.operators import sequence

    M = 60_000_000  # one minute in epoch micros
    rows = [
        # user 1: events at 0, 30min (exactly the gap -> SAME session),
        # then 61min (31min gap -> new session)
        (1, 1, 0 * M, "view", 1.0),
        (2, 1, 30 * M, "click", 2.0),
        (3, 1, 61 * M, "view", 4.0),
        # user 2: single event
        (4, 2, 5 * M, "buy", 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )
    out = {
        (r.user_id, r.session_idx): (
            r.n_events, r.n_types, r.duration_s, r.total_value
        )
        for r in sequence.sessionize(ev, gap_minutes=30.0).collect()
    }
    assert out == {
        (1, 1): (2, 2, 1800.0, 3.0),
        (1, 2): (1, 1, 0.0, 4.0),
        (2, 1): (1, 1, 0.0, 8.0),
    }


def test_sessionize_agrees_with_streaming_boundary(spark):
    """The strict > gap rule: a gap of exactly gap_minutes merges, one
    microsecond more splits — identical to sessionize_stream's
    `ts - last > gap_us` closure."""
    from grape_vector_db_spark.operators import sequence

    gap_us = 30 * 60_000_000
    ev = spark.createDataFrame(
        [(1, 1, 0, "a", 0.0), (2, 1, gap_us + 1, "a", 0.0)],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros("us").alias("ts"),
        "event_type", "value",
    )
    got = sequence.sessionize(ev, gap_minutes=30.0).collect()
    assert sorted(r.session_idx for r in got) == [1, 2]


# ------------------------------------------------------ memorization risk


def test_memorization_risk_planted(spark):
    docs = spark.createDataFrame(
        [
            # verbatim pair -> every 3-gram shared -> risk 1.0
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            # unique vocabulary -> risk 0.0
            (3, "unique words nowhere else repeated"),
            # 4 shingles, shares only "alpha beta gamma" -> 1/4
            (4, "alpha beta gamma zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_shared, r.mem_risk)
        for r in dedup.memorization_risk(docs, n=3).collect()
    }
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 2, 1.0)
    assert out[3] == (3, 0, 0.0)
    assert out[4] == (4, 1, 0.25)


# ------------------------------------------------------------- pagerank


def test_knn_pagerank_matches_numpy(spark, emb):
    sub = emb.where(F.col("vec_id") < 50)
    edges = ann.knn_graph(sub, k=3, n_blocks=2)
    got = {
        r.vec_id: r.pagerank
        for r in ann.knn_pagerank(
            edges, sub, damping=0.85, iterations=3
        ).collect()
    }
    ids = sorted(r.vec_id for r in sub.collect())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    erows = [(r.src, r.dst) for r in edges.collect()]
    od: dict = {}
    for s, _ in erows:
        od[s] = od.get(s, 0) + 1
    pr = np.full(n, 1.0 / n)
    for _ in range(3):
        s = np.zeros(n)
        for a, b in erows:
            s[idx[b]] += pr[idx[a]] / od[a]
        pr = 0.15 / n + 0.85 * s
    for v in ids:
        assert got[v] == pytest.approx(round(pr[idx[v]], 6), abs=2e-6)
    # mass conservation: out-degree k everywhere -> no dangling leakage
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


# ------------------------------------------------------ logreg classifier


def test_logreg_learns_separable(spark):
    from grape_vector_db_spark.operators import classifier

    # dim 2, y = 1 iff x0 > x1 — linearly separable
    rows = [
        (i, [float(a), float(b)], 1 if a > b else 0)
        for i, (a, b) in enumerate(
            [(3, 0), (2, 1), (5, 2), (4, 0), (0, 3), (1, 2), (2, 5), (0, 4)]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, features array<double>, label int"
    )
    w, b = classifier.logreg_train(df, dim=2, lr=1.0, iterations=100, l2=0.0)
    assert w[0] > 0 > w[1]
    preds = {
        r.doc_id: r.pred
        for r in classifier.logreg_score(df, w, b).collect()
    }
    assert preds == {i: y for i, (_, _, y) in zip(range(8), rows)} or preds == {
        r[0]: r[2] for r in rows
    }
    # loss at the trained point beats the zero model
    l_trained = classifier.train_loss(df, w, b, l2=0.0)
    l_zero = classifier.train_loss(df, [0.0, 0.0], 0.0, l2=0.0)
    assert l_trained < l_zero / 4


def test_logreg_score_pinned(spark):
    import math

    from grape_vector_db_spark.operators import classifier

    df = spark.createDataFrame(
        [(1, [2.0, -1.0])], "doc_id long, features array<double>"
    )
    w, b = [0.5, 0.25], -0.3
    r = classifier.logreg_score(df, w, b).collect()[0]
    m = round(2.0 * 0.5 + (-1.0) * 0.25 + b, 6)
    assert r.score == round(1.0 / (1.0 + math.exp(-m)), 6)
    assert r.pred == (1 if r.score >= 0.5 else 0)


def test_logreg_empty_raises(spark):
    from grape_vector_db_spark.operators import classifier

    df = spark.createDataFrame([], "doc_id long, features array<double>, label int")
    with pytest.raises(ValueError):
        classifier.logreg_train(df, dim=2, iterations=1)


def test_hashed_features_tokenizer_modes(spark):
    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(1, "the THE quick the")], "doc_id long, text string"
    )
    # whitespace mode keeps stopwords: 4 tokens total
    ws = textanalysis.hashed_features(df, dim=8, tokenizer="whitespace").collect()[0]
    assert sum(ws.features) == 4
    # reference mode strips 'the' (EN stopword): only 'quick' survives
    ref = textanalysis.hashed_features(df, dim=8, tokenizer="reference").collect()[0]
    assert sum(ref.features) == 1
    with pytest.raises(ValueError):
        textanalysis.hashed_features(df, dim=8, tokenizer="nope")


def test_calibration_report_bins(spark):
    from grape_vector_db_spark.operators import classifier

    rows = [
        # bin 0: two rows, one positive
        (1, 0.05, 1), (2, 0.02, 0),
        # score 1.0 lands in the TOP bin (9), not a phantom bin 10
        (3, 1.0, 1),
        # bin 5
        (4, 0.55, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    out = {
        r.bin: (r.n, r.mean_score, r.frac_pos)
        for r in classifier.calibration_report(df, n_bins=10).collect()
    }
    assert out[0] == (2, 0.035, 0.5)
    assert out[9] == (1, 1.0, 1.0)
    assert out[5] == (1, 0.55, 0.0)
    assert set(out) == {0, 5, 9}


def test_logreg_score_runs_on_stream(spark, tmpdir):
    """The scoring pass is a stateless narrow map, so the SAME operator
    runs unchanged on a readStream — the model-gated ingest path: new
    batches get scored by the persisted model with zero extra code."""
    from grape_vector_db_spark.operators import classifier

    src = f"{tmpdir}/feats"
    batch = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0])], "doc_id long, features array<double>"
    )
    batch.write.parquet(src)
    w, b = [1.5, -1.0], 0.1
    stream = spark.readStream.schema("doc_id long, features array<double>").parquet(
        src
    )
    q = (
        classifier.logreg_score(stream, w, b)
        .writeStream.format("memory")
        .queryName("scored_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.doc_id: (r.score, r.pred)
        for r in spark.sql("select * from scored_stream").collect()
    }
    expect = {
        r.doc_id: (r.score, r.pred)
        for r in classifier.logreg_score(batch, w, b).collect()
    }
    assert got == expect and len(got) == 2


# --------------------------------------------------------------- sketches


def _py_hll_regs(vals, p, seed=0):
    import hashlib

    lower = 32 - p
    regs: dict = {}
    for v in vals:
        h = int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:8], 16)
        j, w = h >> lower, h % (1 << lower)
        rho = (lower + 1) if w == 0 else (lower - w.bit_length() + 1)
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def test_hll_registers_match_reference(spark):
    from grape_vector_db_spark.operators import sketches

    vals = [f"tok-{i}" for i in range(200)] + ["tok-0", "tok-5"]  # dups
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r.register: r.max_rho
        for r in sketches.hll_registers(df, "v", p=6).collect()
    }
    assert got == _py_hll_regs(set(vals), 6)


def test_hll_merge_is_register_max(spark):
    from grape_vector_db_spark.operators import sketches

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "v string")
    both = a.union(b)
    merged = (
        sketches.hll_registers(a, "v", p=6)
        .union(sketches.hll_registers(b, "v", p=6))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = sketches.hll_registers(both, "v", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the merged estimate is sane
    est = sketches.hll_estimate(merged, p=6).collect()[0]
    assert abs(est.estimate / 600 - 1) < 0.25  # p=6 -> std ~13%


def test_hll_estimate_accuracy_p10(spark):
    from grape_vector_db_spark.operators import sketches

    n = 5000
    df = spark.createDataFrame([(f"item-{i}",) for i in range(n)], "v string")
    est = sketches.hll_estimate(
        sketches.hll_registers(df, "v", p=10), p=10
    ).collect()[0]
    assert abs(est.estimate / n - 1) < 0.12


def test_cms_one_sided_guarantee_and_merge(spark):
    from grape_vector_db_spark.operators import sketches

    # skewed multiset: token-i appears i+1 times
    rows = [(f"t{i}",) for i in range(40) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "v string")
    sk = sketches.cms_table(df, "v", depth=4, width=64)
    qs = spark.createDataFrame([(f"t{i}",) for i in range(40)], "v string")
    est = {
        r.value: r.estimate
        for r in sketches.cms_estimate(sk, qs, "v", depth=4, width=64).collect()
    }
    for i in range(40):
        assert est[f"t{i}"] >= i + 1  # never undercounts
    assert sum(est.values()) <= 2 * sum(range(1, 41))  # bounded overshoot
    # merge = cell-wise sum: sketch(a+b) == merge(sketch(a), sketch(b))
    half1 = spark.createDataFrame(rows[:400], "v string")
    half2 = spark.createDataFrame(rows[400:], "v string")
    merged = (
        sketches.cms_table(half1, "v", depth=4, width=64)
        .union(sketches.cms_table(half2, "v", depth=4, width=64))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )


def test_pca_whiten_decorrelates(spark):
    """Whitened coordinates must be ~unit-variance and ~uncorrelated on
    the gate corpus — the property that mitigates hubness."""
    import __spark_entry__ as entry

    sd = "/root/testdata/sf0.001"
    out = entry.q_pca_whiten(spark, sd)
    cols = [c for c in out.columns if c.startswith("w")]
    X = np.array([[r[c] for c in cols] for r in out.collect()])
    C = np.cov(X, rowvar=False)
    d = np.diag(C)
    # unit variance within tolerance (eps + 6dp literal rounding)
    assert np.all(np.abs(d - 1.0) < 0.05)
    off = C - np.diag(d)
    assert np.max(np.abs(off)) < 0.05


def test_histogram_quantiles_error_bound(spark):
    from grape_vector_db_spark.operators import sketches

    rng = np.random.RandomState(7)
    vals = rng.exponential(scale=10.0, size=4000)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    hist = sketches.histogram_sketch(df, "value", bins=128)
    got = {
        r.q: r.est
        for r in sketches.histogram_quantiles(
            hist, (0.5, 0.95, 0.99), bins=128
        ).collect()
    }
    w = (vals.max() - vals.min()) / 128
    for q in (0.5, 0.95, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= w + 1e-9, (q, got[q], exact, w)


def test_histogram_quantiles_grouped_and_constant(spark):
    from grape_vector_db_spark.operators import sketches

    rows = [("a", float(v)) for v in range(101)] + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "g string, value double")
    hist = sketches.histogram_sketch(df, "value", bins=16, group_col="g")
    got = {
        (r.g, r.q): r.est
        for r in sketches.histogram_quantiles(
            hist, (0.5,), bins=16, group_col="g"
        ).collect()
    }
    # group a: uniform 0..100, p50 within one bin width (6.25)
    assert abs(got[("a", 0.5)] - 50.0) <= 100 / 16 + 1e-9
    # constant group: degenerate hi==lo -> exact value
    assert got[("b", 0.5)] == 5.0


def test_graph_triangle_stats_hand_counted(spark):
    # 4-clique on {1,2,3,4} plus a pendant edge 4-5:
    # edges=7, triangles=C(4,3)=4, wedges: deg 3,3,3,4,1 -> 3+3+3+6+0=15
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    )
    r = ann.graph_triangle_stats(pairs).collect()[0]
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (7, 15, 4)
    assert r.clustering_coefficient == round(3.0 * 4 / 15, 6)


def test_graph_triangle_stats_triangle_free(spark):
    # star graph: wedges but zero triangles
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
    r = ann.graph_triangle_stats(pairs).collect()[0]
    assert r.n_triangles == 0 and r.clustering_coefficient == 0.0
    # empty graph: all zeros, no NULLs
    empty = spark.createDataFrame([], "a long, b long")
    r0 = ann.graph_triangle_stats(empty).collect()[0]
    assert (r0.n_edges, r0.n_wedges, r0.n_triangles) == (0, 0, 0)
    assert r0.clustering_coefficient == 0.0


def test_knn_label_probe_separable_clusters(spark):
    from grape_vector_db_spark.operators.evaluation import knn_label_probe

    rng = np.random.RandomState(3)
    rows = []
    centers = {0: np.array([10.0, 0.0]), 1: np.array([-10.0, 0.0]),
               2: np.array([0.0, 10.0])}
    i = 0
    for lab, c in centers.items():
        for _ in range(20):
            v = c + rng.normal(0, 0.5, 2)
            rows.append((i, [float(v[0]), float(v[1])], lab))
            i += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    edges = ann.knn_graph(emb, k=5, n_blocks=2)
    out = {r.label: r for r in knn_label_probe(edges, emb).collect()}
    for lab in centers:
        assert out[lab].n == 20
        assert out[lab].accuracy == 1.0


def test_knn_label_probe_tiebreak(spark):
    """2-NN with one neighbor of each label -> tie -> lowest label wins."""
    from grape_vector_db_spark.operators.evaluation import knn_label_probe

    edges = spark.createDataFrame(
        [(1, 2), (1, 3)], "src long, dst long"
    )
    corpus = spark.createDataFrame(
        [(1, 7), (2, 9), (3, 7)], "vec_id long, label long"
    )
    out = knn_label_probe(edges, corpus).collect()
    # neighbors have labels {9, 7}: tie on count, label 7 wins -> correct
    assert len(out) == 1 and out[0].label == 7 and out[0].n_correct == 1


# ------------------------------------------------------- funnel / cohort


def _ev_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id", "user_id", F.timestamp_micros("us").alias("ts"),
        "event_type", "value",
    )


def test_funnel_strict_ordering(spark):
    from grape_vector_db_spark.operators import sequence

    M = 60_000_000
    ev = _ev_df(spark, [
        # user 1 completes: view@0, click@1m, purchase@2m
        (1, 1, 0, "view", 0.0), (2, 1, M, "click", 0.0),
        (3, 1, 2 * M, "purchase", 0.0),
        # user 2: click BEFORE view -> never reaches step 2
        (4, 2, 0, "click", 0.0), (5, 2, M, "view", 0.0),
        # user 3: view then purchase without click -> stops at step 1
        (6, 3, 0, "view", 0.0), (7, 3, M, "purchase", 0.0),
        # user 4: simultaneous view+click -> strict > blocks step 2
        (8, 4, 0, "view", 0.0), (9, 4, 0, "click", 0.0),
    ])
    out = {
        r.step: (r.step_name, r.n_users, r.conversion, r.step_rate)
        for r in sequence.funnel(ev, ("view", "click", "purchase")).collect()
    }
    assert out[1] == ("view", 4, 1.0, 1.0)
    assert out[2] == ("click", 1, 0.25, 0.25)
    assert out[3] == ("purchase", 1, 0.25, 1.0)


def test_cohort_retention_hand_built(spark):
    from grape_vector_db_spark.operators import sequence

    DAY = 86_400_000_000
    # 2024-01-01 is a Monday: users 1,2 start week 0; user 1 returns
    # week 1; user 3 starts week 1
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z epoch micros
    ev = _ev_df(spark, [
        (1, 1, base, "view", 0.0),
        (2, 2, base + DAY, "view", 0.0),
        (3, 1, base + 8 * DAY, "view", 0.0),
        (4, 3, base + 9 * DAY, "view", 0.0),
    ])
    out = {
        (str(r.cohort_week), r.week_offset): (r.n_active, r.cohort_size, r.retention)
        for r in sequence.cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(out) == 3


# --------------------------------------------------------------- z-order


def test_zorder_key_hand_interleave(spark):
    from grape_vector_db_spark.sources import layout

    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long"
    )
    got = df.select(
        layout.zorder_key([F.col("x"), F.col("y")], bits=3).alias("k")
    ).collect()[0].k
    # x bits (LSB-first) 1,0,1 at positions 0,2,4; y bits 1,1,0 at 1,3,5
    expect = (1 << 0) + (0 << 2) + (1 << 4) + (1 << 1) + (1 << 3) + (0 << 5)
    assert got == expect


def test_zorder_layout_prunes_both_dims(spark, tmpdir):
    """The motivating property: laid out in Morton order, a narrow box
    on EITHER dimension overlaps only a fraction of the files'
    [min, max] ranges; an x-sorted layout clusters only x (every file
    spans all of y). Checked from real parquet footer stats."""
    import pyarrow.parquet as pq
    import glob
    import itertools

    from grape_vector_db_spark.sources import layout

    rows = [
        (float(x), float(y))
        for x, y in itertools.product(range(64), range(64))
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    zp = f"{tmpdir}/z"
    lp = f"{tmpdir}/linear"
    layout.write_zordered(df, zp, ["x", "y"], bits=6, n_files=16)
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions(
        "x"
    ).write.parquet(lp)

    def files_overlapping(path, col, lo, hi):
        hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        st = c.statistics
                        fmin = st.min if fmin is None else min(fmin, st.min)
                        fmax = st.max if fmax is None else max(fmax, st.max)
            if fmin is not None and not (hi < fmin or lo > fmax):
                hit += 1
        return hit

    # narrow box on y: z-order clusters y too; x-sort does not
    z_y = files_overlapping(zp, "y", 10.0, 13.0)
    lin_y = files_overlapping(lp, "y", 10.0, 13.0)
    assert z_y < lin_y
    assert lin_y == 16  # x-sorted: every file spans all of y
    # and x stays prunable in the z layout
    assert files_overlapping(zp, "x", 10.0, 13.0) < 16
