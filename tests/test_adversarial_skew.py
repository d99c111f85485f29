"""Adversarial-skew fixture: prove the capped paths ENGAGE and stay correct.

The synthetic driver tables are uniform, so the hot-bucket caps
(hamming_pairs bucket_cap, LSH bucket_cap, ngram max_shingle_df, basket
max_basket_items) never fire in the standard gate. This module builds the
pathologies those caps exist for — a boilerplate clique whose shingles and
fingerprints pile into one bucket, a degenerate all-identical-embedding
block, one basket with hundreds of items, one key holding ~10% of rows,
one ~10 MB document — and asserts BOTH that the cap branch executed
(differential vs the uncapped run / a non-empty hot list) AND that the
capped result matches an independent replica (pure-python brute force or
a DuckDB oracle) of the documented capped semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import baskets, dedup, skew

# ---------------------------------------------------------------------------
# fixture corpus: 600 docs, 10% in one hot source sharing boilerplate


def _unique_text(i: int) -> str:
    return (
        f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} "
        f"foxtrot{i} golf{i} hotel{i}"
    )


BOILER = (
    "subscribe newsletter privacy policy terms conditions cookie banner "
    "navigation footer copyright reserved contact about careers sitemap"
)


@pytest.fixture(scope="module")
def skew_docs(spark):
    rows = []
    for i in range(60):  # 10%: hot source + shared boilerplate shingles
        rows.append((i, f"{BOILER} unique{i} tail{i}", "hot"))
    for i in range(60, 600):
        rows.append((i, _unique_text(i), f"src{i % 9}"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).cache()


def test_fixture_skew_is_visible(spark, skew_docs):
    r = skew.key_skew_report(skew_docs, "source").collect()[0]
    assert abs(r["top1_share"] - 0.10) < 0.005
    assert r["max_n"] == 60


def test_salted_agg_on_hot_key_matches_plain(spark, skew_docs):
    plain = {
        r["source"]: r["cnt"]
        for r in skew_docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {r["source"]: r["cnt"] for r in skew.salted_count(skew_docs, ["source"]).collect()}
    assert salted == plain and plain["hot"] == 60


# ---------------------------------------------------------------------------
# hot-shingle cap (ngram_jaccard_pairs max_shingle_df)


def test_hot_shingle_cap_engages_and_matches_replica(spark, skew_docs):
    cap = 20
    sh = dedup.shingles(skew_docs, n=3)
    # 1) the cap branch has work to do: boilerplate shingles exceed it
    hot_n = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .where(F.col("df") > cap).count()
    )
    assert hot_n > 0, "fixture failed to create hot shingles"
    # 2) differential: uncapped sees the boilerplate clique, capped must not
    uncapped = dedup.ngram_jaccard_pairs(skew_docs, n=3, threshold=0.3)
    capped = dedup.ngram_jaccard_pairs(
        skew_docs, n=3, threshold=0.3, max_shingle_df=cap
    )
    got = {(r["a"], r["b"]): r["jaccard"] for r in capped.collect()}
    assert uncapped.where((F.col("a") < 60) & (F.col("b") < 60)).count() > 0
    # 3) exact replica of the documented capped semantics: drop shingles
    # with df > cap, brute-force Jaccard on the filtered sets
    by_doc: dict[int, set[str]] = {}
    freq: dict[str, int] = {}
    for r in sh.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
        freq[r["shingle"]] = freq.get(r["shingle"], 0) + 1
    kept = {d: {s for s in ss if freq[s] <= cap} for d, ss in by_doc.items()}
    inverted: dict[str, list[int]] = {}
    for d, ss in kept.items():
        for s in ss:
            inverted.setdefault(s, []).append(d)
    cand = set()
    for docs in inverted.values():
        docs = sorted(docs)
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                cand.add((docs[x], docs[y]))
    expect = {}
    for a, b in cand:
        inter = len(kept[a] & kept[b])
        jac = inter / len(kept[a] | kept[b])
        if jac >= 0.3:
            expect[(a, b)] = round(jac, 6)
    assert got == expect


# ---------------------------------------------------------------------------
# banded-Hamming hot-bucket cap (hamming_pairs bucket_cap)


def _bands(h: int, bits: int = 64, max_hamming: int = 3):
    width = bits // (max_hamming + 1)
    mask = (1 << width) - 1
    return [(b, (h >> (b * width)) & mask) for b in range(max_hamming + 1)]


def test_hamming_bucket_cap_engages_and_matches_replica(spark):
    cap, max_h = 20, 3
    clique = [(i, 0x1234_0000_5678) for i in range(80)]  # one bucket/band
    # near pairs: base value per j, partner at hamming 2 (two low bits)
    near = []
    for j in range(20):
        base = (j + 1) << 20
        near.append((1000 + 2 * j, base))
        near.append((1001 + 2 * j, base ^ 0b11))
    df = spark.createDataFrame(clique + near, "doc_id long, simhash long")

    capped = dedup.hamming_pairs(df, bits=64, max_hamming=max_h, bucket_cap=cap)
    got = {(r["a"], r["b"]): r["hamming"] for r in capped.collect()}

    # cap engaged: the 80-member clique vanished but IS in the uncapped run
    uncapped = dedup.hamming_pairs(df, bits=64, max_hamming=max_h)
    assert uncapped.where(F.col("a") < 80).count() == 80 * 79 // 2
    assert not any(a < 80 for (a, b) in got)

    # exact replica of the capped semantics: candidates share >=1 non-hot
    # (band, key) bucket; verify popcount(xor) <= max_hamming
    rows = clique + near
    bucket_n: dict[tuple, int] = {}
    for _id, h in rows:
        for bk in _bands(h):
            bucket_n[bk] = bucket_n.get(bk, 0) + 1
    hot = {bk for bk, n in bucket_n.items() if n > cap}
    expect = {}
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            (ia, ha), (ib, hb) = rows[x], rows[y]
            shared = set(_bands(ha)) & set(_bands(hb))
            if not (shared - hot):
                continue
            d = bin(ha ^ hb).count("1")
            if d <= max_h:
                a, b = min(ia, ib), max(ia, ib)
                expect[(a, b)] = d
    assert got == expect
    # the 20 engineered hamming-2 partner pairs all survived the cap
    assert all(got.get((1000 + 2 * j, 1001 + 2 * j)) == 2 for j in range(20))


# ---------------------------------------------------------------------------
# RP-LSH hot-bucket cap on a degenerate identical-embedding block


def test_lsh_bucket_cap_drops_degenerate_block(spark):
    import math

    dim, n_block = 8, 150
    rows = [(i, [1.0] + [0.0] * (dim - 1)) for i in range(n_block)]
    for j in range(15):  # 15 genuine near pairs in distinct directions
        v = [math.sin(j + 1 + k) for k in range(dim)]
        w = [x + (0.01 if k == 0 else 0.0) for k, x in enumerate(v)]
        rows.append((1000 + 2 * j, v))
        rows.append((1001 + 2 * j, w))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.95, n_planes=6, n_tables=4, seed=42)
    capped = dedup.embedding_neardup_pairs_lsh(emb, bucket_cap=50, **kw)
    uncapped = dedup.embedding_neardup_pairs_lsh(emb, **kw)
    got = {(r["a"], r["b"]): r["cosine"] for r in capped.collect()}
    base = {(r["a"], r["b"]): r["cosine"] for r in uncapped.collect()}

    # cap engaged: identical vectors share EVERY bucket (same signs), all
    # 150-member buckets exceed cap=50 -> zero block-internal pairs; the
    # uncapped run returns the full clique
    assert sum(1 for (a, b) in base if a < n_block and b < n_block) == (
        n_block * (n_block - 1) // 2
    )
    assert not any(a < n_block and b < n_block for (a, b) in got)
    # correctness: capped is exactly the uncapped result minus pairs whose
    # every shared bucket was hot (here: the block clique); survivors kept
    # identical cosines and still satisfy the threshold
    survivors = {
        p: c for p, c in base.items() if not (p[0] < n_block and p[1] < n_block)
    }
    assert got == survivors
    assert all(c >= 0.95 and a < b for (a, b), c in got.items())
    assert len(got) >= 10  # the engineered near pairs made it through


# ---------------------------------------------------------------------------
# giant-basket cap (basket_pairs max_basket_items) — DuckDB oracle


def test_giant_basket_cap_engages_and_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    rows = [(0, i) for i in range(300)]  # one 300-item crawler basket
    for bkt in range(1, 201):
        for item in (bkt % 7, bkt % 7 + 1, 500 + bkt % 3):
            rows.append((bkt, item))
    df = spark.createDataFrame(rows, "basket long, item long")

    capped = baskets.basket_pairs(
        df, "basket", "item", min_pair_count=2, max_basket_items=50
    )
    got = {
        (r["item_a"], r["item_b"]): (r["n_pair"], r["support"], r["lift"])
        for r in capped.collect()
    }
    # cap engaged: the giant basket's long-tail pairs exist only uncapped
    uncapped = baskets.basket_pairs(df, "basket", "item", min_pair_count=1)
    assert uncapped.where(F.col("item_a") >= 100).count() > 0
    assert not any(a >= 100 and a < 500 for (a, b) in got)

    pdf = pd.DataFrame(rows, columns=["basket", "item"])
    con = duckdb.connect()
    con.register("raw", pdf)
    oracle = con.execute(
        """
        WITH kept AS (
          SELECT basket FROM (
            SELECT basket, count(DISTINCT item) AS sz FROM raw GROUP BY basket
          ) WHERE sz <= 50
        ),
        items AS (
          SELECT DISTINCT r.basket, r.item FROM raw r JOIN kept USING (basket)
        ),
        pairs AS (
          SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_pair
          FROM items x JOIN items y
            ON x.basket = y.basket AND x.item < y.item
          GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        freq AS (SELECT item, count(*) AS n FROM items GROUP BY item),
        tot AS (SELECT count(*) AS nb FROM kept)
        SELECT item_a, item_b, n_pair,
               round(n_pair / (SELECT nb FROM tot)::DOUBLE, 6) AS support,
               round(n_pair * (SELECT nb FROM tot)::DOUBLE
                     / (fa.n::DOUBLE * fb.n), 6) AS lift
        FROM pairs
        JOIN freq fa ON fa.item = item_a
        JOIN freq fb ON fb.item = item_b
        """
    ).fetchall()
    expect = {(a, b): (n, s, lf) for a, b, n, s, lf in oracle}
    assert got == expect and len(got) > 0


# ---------------------------------------------------------------------------
# one ~10 MB document


def test_ten_megabyte_doc_winnows_and_matches_neardup(spark):
    words = " ".join(f"w{i % 9973}x{i % 89}" for i in range(1_200_000))
    assert len(words) > 10_000_000
    edited = "PREFIX EDIT " + words[100:]
    df = spark.createDataFrame(
        [(1, words), (2, edited), (3, _unique_text(3))],
        "doc_id long, text string",
    )
    fps = dedup.winnow_fingerprints(df, k=10, w=16).cache()
    per_doc = {
        r["doc_id"]: r["n"]
        for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # expected density ~2/(w+1) per position; distinct-ness lowers it —
    # sanity band proves the kernel actually processed ~10M chars
    assert per_doc[1] > 100_000
    # a 12-char edit must NOT break shared fingerprints: the near-dup
    # candidate join finds (1, 2) with massive overlap
    a = fps.where(F.col("doc_id") == 1).select("fp")
    b = fps.where(F.col("doc_id") == 2).select("fp")
    shared = a.intersect(b).count()
    assert shared / per_doc[1] > 0.95
    fps.unpersist()
