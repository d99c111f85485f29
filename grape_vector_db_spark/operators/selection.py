"""Data selection via importance resampling (DSIR).

DSIR (Xie et al., NeurIPS 2023, arXiv:2302.03169) scores every raw
document by how target-domain-like it is under two hashed bag-of-ngrams
unigram models: a target model fit on a (small) in-domain corpus and a
raw model fit on everything else. The per-document log importance weight

    log w(d) = sum_{g in ngrams(d)} [ log p_t(bucket(g)) - log p_r(bucket(g)) ]

uses Laplace-smoothed bucket probabilities p(b) = (c_b + a) / (C + a*B).
Sampling proportional to w(d) then selects pretraining data that matches
the target distribution; here we emit the weights (the expensive, corpus-
wide part) and leave the sampling policy to the caller (sampling.py's
deterministic hash-gates compose directly).

Scale design: the feature space is B hashed buckets (default 1024), so
the two "models" are ONE groupBy over the exploded bigrams producing a
B-row table that broadcasts everywhere; per-document scoring is a
broadcast join + one map-side-combined groupBy sum. Two shuffles total,
both on keys with bounded cardinality (bucket, doc_id) — no vocabulary
pass, no skew (md5 buckets are uniform by construction). The hash is
functions.hashing.h32 so a DuckDB oracle reproduces weights exactly.

The reference has no selection surface (it stops at per-query filtering);
this is a pipeline addition in the spirit of its quality gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32
from ..functions.text import word_grams, ws_tokens


def _bigram_buckets(
    df: DataFrame,
    n_buckets: int,
    id_col: str,
    text_col: str,
    extra: dict[str, Column] | None = None,
    emit_empty: bool = False,
) -> DataFrame:
    """Shared hashed-bigram featurizer for the selection family:
    (doc_id[, extra...], bucket) — one exploded row per word bigram,
    bucket = h32(gram) % n_buckets. Documents with fewer than 2
    whitespace tokens produce no rows (callers re-attach them with a
    left join). Kept in ONE place so dsir_log_weights and
    quality_classifier_score (and their DuckDB oracle twins) can never
    disagree on the feature definition."""
    extra = extra or {}
    toks = ws_tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(n) for n, c in extra.items()],
        toks.alias("toks"),
    )
    # explode_outer when the caller wants featureless docs present as
    # one NULL-bucket row (r11: lets dsir_log_weights skip its
    # corpus-x-corpus re-attach join); plain explode otherwise — the
    # feature DEFINITION (h32(gram) % n_buckets over word bigrams) is
    # identical either way
    ex = F.explode_outer if emit_empty else F.explode
    grams = base.select(
        "doc_id",
        *extra.keys(),
        ex(word_grams(F.col("toks"), 2)).alias("gram"),
    )
    return grams.select(
        "doc_id",
        *extra.keys(),
        F.pmod(h32(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR log importance weights.

    ``target`` is a boolean Column selecting the in-domain rows (e.g.
    ``F.col("source").isin("wiki", "books")``); every other row is the
    raw distribution. Returns (doc_id, log_weight, n_feats) for EVERY
    input row — documents with fewer than 2 whitespace tokens have no
    bigram features and score 0.0 (weight 1: indistinguishable).
    """
    # a NULL target predicate (e.g. isin over a NULL source) counts as
    # RAW — the docstring's "every other row" promise. Un-coalesced, the
    # row fell out of BOTH distributions (NOT NULL is NULL), deflating
    # the raw counts and skewing every document's log_weight while the
    # row itself still scored against the skewed ratio table.
    feats = _bigram_buckets(
        df, n_buckets, id_col, text_col,
        extra={"is_target": F.coalesce(target, F.lit(False))},
        # featureless docs ride along as one NULL-bucket row — they
        # score 0.0 / n_feats 0 straight out of the per-doc aggregate,
        # so the old corpus-x-corpus left re-attach join (2 Exchanges +
        # an SMJ at scale) is gone (r11, guide §2.4)
        emit_empty=True,
    )
    # feats feeds TWO branches (bucket counts + the scoring join):
    # checkpoint so the corpus tokenize/bigram/md5 pipeline — the
    # dominant cost — runs once, not twice (no caller can unpersist a
    # cache entry behind the lazily-returned frame, the knn_graph rule)
    feats = feats.localCheckpoint(eager=False)
    counts = feats.where(F.col("bucket").isNotNull()).groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tot_t"), F.sum("cr").alias("tot_r")
    )
    # B rows; the additive-smoothed log-ratio per bucket. Broadcast both:
    # totals is one row, ratio is n_buckets rows.
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + F.lit(alpha)) / (F.col("tot_t") + F.lit(alpha * n_buckets)))
            - F.log((F.col("cr") + F.lit(alpha)) / (F.col("tot_r") + F.lit(alpha * n_buckets)))
        ).alias("lr"),
    )
    # LEFT join: the lone NULL-bucket row of a featureless doc matches
    # nothing (NULL never equi-joins) and aggregates to the same
    # 0.0 / 0 the old re-attach join filled in; every real bucket is in
    # ratio by construction, so feature rows join exactly as before
    return (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.round(F.coalesce(F.sum("lr"), F.lit(0.0)), 6).alias(
                "log_weight"
            ),
            F.count("bucket").cast("int").alias("n_feats"),
        )
    )


def dsir_sample(
    weights: DataFrame,
    n: int = 100,
    seed: int = 0,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """The RESAMPLING half of DSIR: Gumbel-top-n selection of ``n``
    documents with probability proportional to their importance weight
    exp(log_weight). The Gumbel-max trick makes weighted sampling a plain
    top-n: key = log_weight + Gumbel(0,1), where the Gumbel noise is
    derived DETERMINISTICALLY from the document id via the md5 hash
    (u = (h32(id) + 0.5) / 2^32, g = -ln(-ln(u))) — reproducible across
    engines and runs, no RNG state.

    Scale: one narrow map to compute keys + a TakeOrderedAndProject for
    the top-n (per-partition heaps, no global sort). Returns
    (doc_id, log_weight, sample_key), key-descending.
    """
    u = (h32(F.col(id_col).cast("string"), seed) + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    key = F.round(
        F.col(weight_col) + -F.log(-F.log(u)), 6
    ).alias("sample_key")
    return (
        weights.select(F.col(id_col).alias("doc_id"), F.col(weight_col), key)
        .orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
        .limit(n)
    )


def quality_classifier_score(
    df: DataFrame,
    n_buckets: int = 1024,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear quality classifier (Joulin et al. 2016,
    arXiv:1607.01759 — the model class CCNet/LLaMA/RedPajama use for
    their "wiki-like" page gate): mean of per-feature weights over the
    document's hashed-bigram features, squashed by a sigmoid. The weight
    vector is DETERMINISTIC — w(b) = h32(b, seed)/2^32 * 2 - 1 in
    [-1, 1), i.e. md5("{seed}:" || b) (seed 17 by default; an earlier
    draft of this docstring claimed a "qw:" prefix the code never
    used) — standing in for trained weights so the scoring path is
    engine-portable and oracle-checkable; a trained B-row weight table
    drops into the same plan as a broadcast join.

    Scale: the weight is computed INLINE from the bucket id (map-side
    expression, no weight table, no join); one groupBy(doc) average.
    Returns (doc_id, score, n_feats) for every document; featureless
    docs score sigmoid(0) = 0.5.
    """
    feats = _bigram_buckets(df, n_buckets, id_col, text_col)
    w = (
        h32(F.col("bucket").cast("string"), seed) / F.lit(4294967296.0)
    ) * F.lit(2.0) - F.lit(1.0)
    doc_w = feats.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.avg("w").alias("logit"),
        F.count("*").cast("int").alias("n_feats"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(doc_w, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.coalesce("logit", F.lit(0.0)))),
                6,
            ).alias("score"),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        )
    )
