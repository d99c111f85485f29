"""Property-based tests (hypothesis) — SURVEY §5.2 notes the reference has
no randomized testing; these pin our operators against independent Python
replicas on arbitrary inputs.

Each example ships a BATCH of generated rows through one DataFrame job so
hypothesis examples don't multiply Spark job overhead.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from grape_vector_db_spark.functions.text import STOPWORDS, tokens
from grape_vector_db_spark.operators.quantization import WORD_BITS, pack_bits

# derandomize: the same examples every run — the driver's per-round test
# gate must not flake on a newly-mined edge case mid-round; widen coverage
# deliberately (bump max_examples locally) rather than randomly in CI.
SETTINGS = dict(max_examples=12, deadline=None, derandomize=True)

# BMP only: Spark regex works per UTF-16 unit, so supplementary-plane
# letters are stripped (documented divergence in functions.text).
texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("L", "N", "P", "Z", "S"),
            max_codepoint=0xFFFF,
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


def py_tokenize(text: str) -> list[str]:
    """Independent replica of the reference tokenizer (src/sparse.rs:285-315)."""
    stop = set(STOPWORDS)
    out = []
    for w in text.lower().split():
        w = "".join(c for c in w if c.isalnum())
        if len(w) > 1 and w not in stop:
            out.append(w)
    return out


@settings(**SETTINGS)
@given(texts)
def test_tokenizer_matches_python_replica(spark, batch):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i int, t string")
    got = {r["i"]: list(r["toks"]) for r in df.select("i", tokens("t").alias("toks")).collect()}
    for i, t in enumerate(batch):
        assert Counter(got[i]) == Counter(py_tokenize(t)), (t, got[i])


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, allow_infinity=False, width=32
        ),
        min_size=1,
        max_size=70,
    ),
    min_size=1,
    max_size=6,
)


@settings(**SETTINGS)
@given(vectors)
def test_pack_bits_popcount_invariant(spark, vecs):
    """Total set bits across packed words == number of strictly-positive
    elements; word count == ceil(dim/32)."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id int, v array<float>",
    )
    rows = pack_bits(df, id_col="id", vec_col="v").collect()
    by_id = {r["id"]: r for r in rows}
    for i, v in enumerate(vecs):
        r = by_id[i]
        assert r["dimension"] == len(v)
        assert len(r["packed"]) == math.ceil(len(v) / WORD_BITS)
        total_bits = sum(bin(w & 0xFFFFFFFF).count("1") for w in r["packed"])
        # float32 storage can flip tiny positives to 0.0; recompute the
        # expectation from the values as stored (read back via the df)
        assert total_bits == sum(1 for x in by_stored(df, i) if x > 0.0)


def by_stored(df, i):
    return list(df.where(F.col("id") == i).head()["v"])


corpora = st.lists(
    st.text(alphabet="abcdefg hij", min_size=0, max_size=60),
    min_size=2,
    max_size=8,
)


@settings(**SETTINGS)
@given(corpora, st.text(alphabet="abcdefg hij", min_size=1, max_size=20))
def test_bm25_matches_python_replica(spark, corpus, query):
    """Full BM25 pipeline vs an independent pure-Python implementation of
    the reference formulas (relative tf, posting-weighted avg_doc_length,
    k1=1.2 b=0.75) on random corpora."""
    from grape_vector_db_spark.operators.sparse import bm25_search, tokenize_query_py

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["score"] for r in bm25_search(df, query, k=100).collect()}

    # independent replica
    doc_tfs = {i: tokenize_query_py(t) for i, t in enumerate(corpus)}
    doc_tfs = {i: tf for i, tf in doc_tfs.items() if tf}
    qtf = tokenize_query_py(query)
    n = len(doc_tfs)
    entries = sum(len(tf) for tf in doc_tfs.values())
    doc_len = {i: sum(tf.values()) for i, tf in doc_tfs.items()}
    avg_len = (
        sum(doc_len[i] * len(doc_tfs[i]) for i in doc_tfs) / n if n else 0.0
    )
    df_count = {}
    for tf in doc_tfs.values():
        for t in tf:
            df_count[t] = df_count.get(t, 0) + 1
    import math

    want = {}
    for i, tf in doc_tfs.items():
        s = 0.0
        for t, qv in qtf.items():
            if t not in tf:
                continue
            idf = math.log((n - df_count[t] + 0.5) / (df_count[t] + 0.5))
            comp = tf[t] * 2.2 / (tf[t] + 1.2 * (1 - 0.75 + 0.75 * doc_len[i] / avg_len))
            s += qv * comp * idf
        if s != 0.0:
            want[i] = round(s, 6)
    assert set(got) <= set(doc_tfs)
    for i, sc in got.items():
        assert abs(sc - want.get(i, 0.0)) <= 2e-6, (i, sc, want.get(i))


@settings(**SETTINGS)
@given(vectors)
def test_pack_bits_bit_order_msb_first(spark, vecs):
    """Bit for dimension j lives at position 31-(j%32) of word j//32."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id int, v array<float>",
    )
    rows = {r["id"]: r["packed"] for r in pack_bits(df, "id", "v").collect()}
    for i in range(len(vecs)):
        stored = by_stored(df, i)
        for j, x in enumerate(stored):
            word = rows[i][j // WORD_BITS]
            bit = (word >> (WORD_BITS - 1 - (j % WORD_BITS))) & 1
            assert bit == (1 if x > 0.0 else 0)


def py_h32(s: str, seed: int = 0) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def py_h32_word(s: str, p: int) -> int:
    """hash p of the h32_word family: word p%4 of the digest seeded p//4."""
    import hashlib

    seed, w = divmod(p, 4)
    digest = hashlib.md5(f"{seed}:{s}".encode()).hexdigest()
    return int(digest[8 * w : 8 * w + 8], 16)


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = py_tokenize(text)
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    # token-less docs emit NO shingle (no '' fallback) — mirrors
    # operators.dedup.shingles
    return {" ".join(toks)} if toks else set()


@settings(**SETTINGS)
@given(corpora)
def test_minhash_signatures_match_python_replica(spark, corpus):
    """sig[p] = min over shingles of h32_word(shingle, p) (word p%4 of the
    md5 digest seeded p//4) — replicated in pure python from the same md5
    derivation. num_hashes=6 spans two digests so the seed rollover at
    p=4 is exercised."""
    from grape_vector_db_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(df, num_hashes=6).collect()}
    for i, t in enumerate(corpus):
        sh = py_shingles(t)
        if not sh:
            # token-less docs are ABSENT from the signature table
            assert i not in got, (t, got.get(i))
            continue
        want = [min(py_h32_word(s, p) for s in sh) for p in range(6)]
        assert got[i] == want, (t, got[i], want)


@settings(**SETTINGS)
@given(corpora)
def test_simhash_matches_python_replica(spark, corpus):
    """bit j of the fingerprint = sign of the per-bit vote tally over
    distinct tokens' hash bits (Charikar); 64-bit fingerprints use two
    32-bit words QUARTERED from one md5 digest per term (the h32_word
    family) and come back as two's-complement BIGINT."""
    from grape_vector_db_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    for i, t in enumerate(corpus):
        terms = set(py_tokenize(t))
        if not terms:
            continue
        fp = 0
        for j in range(64):
            vote = sum(
                1 if (py_h32_word(w, j // 32) >> (j % 32)) & 1 else -1
                for w in terms
            )
            if vote > 0:
                fp |= 1 << j
        if fp >= 1 << 63:
            fp -= 1 << 64
        assert got[i] == fp, (t, got[i], fp)


@settings(**SETTINGS)
@given(vectors)
def test_sq_quantize_reconstruction_bound(spark, vecs):
    """De-quantized values must sit within half a quantization step of the
    stored input; codes stay in [0, 255]."""
    from grape_vector_db_spark.operators.quantization import sq_quantize

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id int, v array<float>",
    )
    rows = {r["id"]: r for r in sq_quantize(df, id_col="id", vec_col="v").collect()}
    for i in range(len(vecs)):
        stored = by_stored(df, i)
        r = rows[i]
        assert all(0 <= c <= 255 for c in r["codes"])
        step = r["rng"] / 255.0 if r["rng"] else 0.0
        for x, c in zip(stored, r["codes"]):
            recon = r["minv"] + c * step
            assert abs(x - recon) <= step / 2 + 1e-9, (x, recon, step)


@settings(**SETTINGS)
@given(texts)
def test_dedup_doc_lines_idempotent_and_counted(spark, batch):
    """Applying within-doc line dedup to its own output changes nothing,
    and n_kept always equals the Python-side count of distinct lines."""
    from grape_vector_db_spark.operators.curation import dedup_doc_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    once = dedup_doc_lines(df)
    rows = {r["doc_id"]: r for r in once.collect()}
    for i, t in enumerate(batch):
        lines = t.split("\n")
        uniq = list(dict.fromkeys(lines))
        assert rows[i]["n_lines"] == len(lines)
        assert rows[i]["n_kept"] == len(uniq)
        assert rows[i]["clean_text"] == "\n".join(uniq)
    twice = dedup_doc_lines(
        once.select("doc_id", F.col("clean_text").alias("text"))
    )
    for r in twice.collect():
        assert r["n_lines"] == r["n_kept"]


@settings(**SETTINGS)
@given(texts)
def test_snapshot_diff_self_is_unchanged(spark, batch):
    """diff(x, x) reports every row unchanged — including null/empty."""
    from grape_vector_db_spark.sources.tables import snapshot_diff

    df = spark.createDataFrame(
        [(i, t if t else None) for i, t in enumerate(batch)],
        "id long, v string",
    )
    out = snapshot_diff(df, df).collect()
    assert len(out) == len(batch)
    assert all(r["status"] == "unchanged" for r in out)


@settings(**SETTINGS)
@given(texts, st.integers(min_value=2, max_value=7))
def test_kfold_covers_range_and_partitions(spark, batch, k):
    from grape_vector_db_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame(
        [(i, "s") for i in range(len(batch))], "doc_id long, source string"
    )
    out = kfold_assign(df, k=k).collect()
    assert len(out) == len(batch)
    assert all(0 <= r["fold"] < k for r in out)


@settings(**SETTINGS)
@given(texts)
def test_containment_bounded_and_symmetric_keys(spark, batch):
    """containment is in (0, 1] and pair keys are strictly ordered."""
    from grape_vector_db_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    for r in containment_pairs(df, n=3, threshold=0.0).collect():
        assert r["a"] < r["b"]
        assert 0.0 < r["containment"] <= 1.0


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_phrase_search_matches_python_replica(spark, batch, plen):
    """Positional phrase counts equal a naive Python sliding scan for
    arbitrary small-alphabet corpora and phrase lengths."""
    from grape_vector_db_spark.operators.sparse import phrase_search

    phrase_toks = ["a" * plen, "b"][:plen] if plen <= 2 else ["a", "b", "a"]
    phrase = " ".join(phrase_toks)

    def py_counts(text):
        toks = [t for t in text.strip().lower().split()]
        if not text.strip():
            return None
        m = 0
        for i in range(len(toks) - len(phrase_toks) + 1):
            if toks[i : i + len(phrase_toks)] == phrase_toks:
                m += 1
        return m or None

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(df, phrase, k=100).collect()
    }
    want = {
        i: c for i, t in enumerate(batch) if (c := py_counts(t)) is not None
    }
    assert got == want


@settings(**SETTINGS)
@given(texts)
def test_readability_matches_python_replica(spark, batch):
    """Flesch components equal an independent Python computation on
    arbitrary BMP text (empty docs are excluded by the operator)."""
    import re

    from grape_vector_db_spark.operators.textanalysis import readability

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    for i, t in enumerate(batch):
        if not t.strip():
            assert i not in got
            continue
        words = re.split(r"\s+", t.strip().lower())
        sents = [s for s in re.split(r"[.!?]+", t) if s.strip()]
        sylls = sum(len(re.split(r"[aeiouy]+", w)) - 1 for w in words)
        r = got[i]
        assert r["n_words"] == len(words)
        assert r["n_sentences"] == max(len(sents), 1)
        assert r["n_syllables"] == sylls


@settings(**SETTINGS)
@given(texts)
def test_duplication_report_matches_python_replica(spark, batch):
    import re
    from collections import Counter

    from grape_vector_db_spark.operators.dedup import duplication_report

    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(batch)],
        "doc_id long, text string, source string",
    )
    r = duplication_report(df).collect()[0]
    normed = Counter(re.sub(r"\s+", " ", t.strip()) for t in batch)
    assert r["n_docs"] == len(batch)
    assert r["n_unique"] == len(normed)


@settings(**SETTINGS)
@given(texts)
def test_winnow_kernel_matches_python_replica(spark, batch):
    """The numpy mapInPandas winnowing kernel vs a direct Python
    replica of the spec: normalize, polynomial k-gram hash over code
    points (weights winnow_gram_powers), window minima, distinct.
    Arbitrary BMP text exercises the utf-32 code-point path, empty and
    shorter-than-k docs the degenerate single-window branches."""
    import re

    from grape_vector_db_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_gram_powers,
    )

    k, w = 4, 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in range(len(batch))}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got[r["doc_id"]].add(r["fp"])
    pw = winnow_gram_powers(k)
    for i, t in enumerate(batch):
        # ASCII class + space-only strip: the oracle-matching RE2/trim
        # semantics (unicode whitespace is DATA, not a separator)
        s = re.sub(r"[\t\n\f\r ]+", " ", t.lower()).strip(" ")
        cps = [ord(c) for c in s]
        grams = (
            [cps[j : j + k] for j in range(len(cps) - k + 1)]
            if len(cps) >= k
            else [cps]
        )
        hs = [
            sum(c * pw[len(g) - 1 - j] for j, c in enumerate(g)) % (1 << 32)
            for g in grams
        ]
        wins = (
            [min(hs[j : j + w]) for j in range(len(hs) - w + 1)]
            if len(hs) > w
            else [min(hs)]
        )
        assert got[i] == set(wins), (t, got[i], set(wins))


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=10),
)
def test_bpe_batched_always_equals_sequential(spark, batch, n_merges):
    """The exact-mode batch selection must be bit-identical to
    one-merge-per-scan training on ARBITRARY corpora — the provable-
    prefix guards (disjointness stop, merged-symbol recreation stop,
    strict tie guard) cover every adversarial tie/recreation case the
    tiny alphabet manufactures."""
    from grape_vector_db_spark.operators import textanalysis

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    seq = textanalysis.bpe_train(df, n_merges=n_merges, batch_merges=1)
    batched = textanalysis.bpe_train(df, n_merges=n_merges, batch_merges=4)
    assert batched == seq, (batch, n_merges, batched, seq)


@given(
    fps=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    max_hamming=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_hamming_pairs_equals_exhaustive(spark, fps, max_hamming):
    """Banded candidate generation must find EXACTLY the pairs an
    exhaustive two's-complement popcount scan finds, for any 64-bit
    fingerprints and band count (pigeonhole guarantee)."""
    import itertools

    from grape_vector_db_spark.operators.dedup import hamming_pairs

    rows = list(enumerate(fps))
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in hamming_pairs(
            df, bits=64, max_hamming=max_hamming, hash_col="fp"
        ).collect()
    }
    want = {
        (a, b, bin((x ^ y) & ((1 << 64) - 1)).count("1"))
        for (a, x), (b, y) in itertools.combinations(rows, 2)
        if bin((x ^ y) & ((1 << 64) - 1)).count("1") <= max_hamming
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # key
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=60,
    ),
)
@settings(**SETTINGS)
def test_global_prefix_sum_matches_serial_replica(spark, rows):
    from grape_vector_db_spark.operators.rank import global_prefix_sum

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, v long")
    got = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(df, "k", ["id"], "v", num_buckets=4).collect()
    }
    acc = 0
    for i, k, v in sorted(data, key=lambda t: (t[1], t[0])):
        acc += v
        assert got[i] == acc


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # basket id
            st.integers(min_value=0, max_value=8),  # item
        ),
        min_size=1,
        max_size=50,
    ),
)
@settings(**SETTINGS)
def test_basket_pairs_match_python_replica(spark, baskets):
    import itertools

    from grape_vector_db_spark.operators.baskets import basket_pairs

    df = spark.createDataFrame(baskets, "o long, item long")
    got = {
        (r["item_a"], r["item_b"]): (r["n_pair"], r["support"], r["lift"])
        for r in basket_pairs(df, "o", "item", min_pair_count=1).collect()
    }
    sets = {}
    for o, it in baskets:
        sets.setdefault(o, set()).add(it)
    nb = len(sets)
    item_n = Counter(it for s in sets.values() for it in s)
    pair_n = Counter(
        p for s in sets.values() for p in itertools.combinations(sorted(s), 2)
    )
    want = {
        (a, b): (
            n,
            round(n / nb, 6),
            round(n * nb / (item_n[a] * item_n[b]), 6),
        )
        for (a, b), n in pair_n.items()
    }
    assert got == want


match_queries = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "Zs"), max_codepoint=0x2FF
    ),
    max_size=24,
)


@settings(**SETTINGS)
@given(texts, match_queries)
def test_match_condition_matches_python_replica(spark, batch, query):
    """The Match{field,text} condition (full-text token AND — every kept
    token of the query must be a token of the field; vacuous AND = True
    for stopwords-only text) against an independent Python replica, and
    the inverted-index service equivalence: membership computed from
    doc_terms rows selects exactly the same docs."""
    from grape_vector_db_spark.functions.text import doc_terms
    from grape_vector_db_spark.operators import filters

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id int, text string"
    )
    cond = filters.condition_to_column(
        {"type": "match", "field": "text", "text": query}
    )
    got = {r["doc_id"] for r in df.where(cond).collect()}
    qtoks = set(py_tokenize(query))
    want = {
        i for i, t in enumerate(batch) if qtoks <= set(py_tokenize(t))
    }
    assert got == want, (query, batch)
    # index-service equivalence: intersect per-token doc_terms probes
    if qtoks:
        terms = doc_terms(df)
        ids = None
        for t in sorted(qtoks):
            pl = terms.where(F.col("term") == t).select("doc_id")
            ids = pl if ids is None else ids.join(pl, "doc_id")
        assert {r["doc_id"] for r in ids.collect()} == want
