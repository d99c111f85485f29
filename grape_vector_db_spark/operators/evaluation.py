"""Search-quality evaluation (reference BenchmarkSuite, src/benchmark.rs:
59-71, 213-277: precision, recall, NDCG@10 across fusion strategies).

Ground truth and results are DataFrames, so evaluating 1M queries costs
the same shape as evaluating one: a join on (query_id, doc_id) + per-query
aggregates. Formulas follow the standard definitions the reference uses:

  precision@k = |retrieved ∩ relevant| / k
  recall@k    = |retrieved ∩ relevant| / |relevant|
  DCG@k       = Σ_{i=1..k} rel_i / log2(i + 1)   (binary relevance)
  NDCG@k      = DCG@k / IDCG@k
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query precision/recall/NDCG@k.

    ``results``: (query_id, doc_id, rank) with rank 1-based;
    ``truth``: (query_id, doc_id) relevant pairs (binary relevance).
    Returns (query_id, precision_k, recall_k, ndcg_k).
    """
    res = results.where(F.col("rank") <= k).select("query_id", "doc_id", "rank")
    # duplicate truth pairs would fan out the join and double-count
    # hits, dcg, AND n_rel (precision could exceed 1.0)
    t = truth.select("query_id", "doc_id").distinct().withColumn(
        "rel", F.lit(1)
    )
    joined = res.join(t, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
    )
    per_q = joined.groupBy("query_id").agg(
        F.sum("rel").alias("n_hit"),
        F.sum(
            F.col("rel") / F.log2(F.col("rank").cast("double") + 1.0)
        ).alias("dcg"),
    )
    n_rel = t.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    # ideal DCG for n = min(n_rel, k) binary-relevant docs at the top
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {k}))), 0D,"
        " (s, i) -> s + 1.0 / log2(double(i) + 1.0))"
    )
    out = per_q.join(n_rel, "query_id", "right").select(
        "query_id",
        F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k)), 6).alias(
            f"precision_{k}"
        ),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel").cast("double"), 6
        ).alias(f"recall_{k}"),
        F.round(
            F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
        ).alias(f"ndcg_{k}"),
    )
    return out


def compare_fusion_strategies(
    lists: dict[str, DataFrame],
    truth: DataFrame,
    query_id,
    k: int = 10,
) -> DataFrame:
    """Reference quality-benchmark shape: run every fusion strategy over the
    same candidate lists and report mean metrics per strategy.

    ``truth``: (query_id, doc_id). Returns one row per strategy.
    """
    from . import fusion

    strategies = {
        "rrf": lambda: fusion.rrf_fuse(lists, limit=k),
        "linear": lambda: fusion.linear_fuse(lists, limit=k),
        "normalized": lambda: fusion.normalized_fuse(lists, limit=k),
    }
    spark = truth.sparkSession
    rows = []
    for name, make in strategies.items():
        from pyspark.sql import Window

        fused = make().withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ),
        ).withColumn("query_id", F.lit(query_id))
        # restrict to THIS query: truth may hold pairs for many queries,
        # and retrieval_metrics right-joins truth — head() over the
        # unfiltered output would report an arbitrary (usually all-zero)
        # query's row
        m = (
            retrieval_metrics(fused, truth, k=k)
            .where(F.col("query_id") == query_id)
            .head()
        )
        if m is None:  # no truth pairs for this query
            rows.append((name, 0.0, 0.0, 0.0))
        else:
            rows.append(
                (name, m[f"precision_{k}"], m[f"recall_{k}"], m[f"ndcg_{k}"])
            )
    return spark.createDataFrame(
        rows, f"strategy string, precision_{k} double, recall_{k} double, ndcg_{k} double"
    )


def class_centroid_metrics(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-quality readout per class: the label centroid (element
    mean), the mean cosine of members to their OWN centroid (intra-class
    cohesion), and nearest-centroid accuracy (fraction of members whose
    most-similar centroid is their own label) — the cheap linear probe a
    training pipeline runs to sanity-check an embedding space before
    spending GPU time on it.

    Scale shape: centroids come from a dim-fanout posexplode + one
    map-side-combined groupBy((label, dim)) — never a per-label
    collect_list, so a billion-member class cannot pin one task. The
    centroid table is classes x dim (tiny) and broadcast for both the
    cohesion join and the all-centroids scoring cross join; per-row work
    is one fold per centroid. Returns
    (label, n_members, mean_intra_cosine, nn_accuracy), 6-dp rounded.
    """
    from ..functions.vector import to_double_array

    v = to_double_array(vec_col)
    flat = emb.select(
        F.col(label_col).alias("label"), F.posexplode(v).alias("i", "x")
    )
    cent = (
        flat.groupBy("label", "i")
        # count("x"), not count(*): a NULL element must not inflate the
        # denominator (semantic_outliers' avg-based centroid skips nulls
        # — the two must agree); n_members = the max per-dim present
        # count, deterministic under ragged/null dims where first() isn't
        .agg(F.sum("x").alias("s"), F.count("x").alias("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("i"), (F.col("s") / F.col("n")).alias("m"))
                    )
                ),
                lambda st: st["m"],
            ).alias("centroid"),
            F.max("n").alias("n_members"),
        )
    )
    from ..functions.vector import cosine_from_parts, dot, l2_norm

    # NULL-vector rows are not members: posexplode already excluded
    # them from the centroids and n_members, but they still reached the
    # scoring join, contributing coalesced 0.0 cosines to
    # mean_intra_cosine and a "classification" to nn_accuracy over a
    # denominator the centroid pass never counted
    base = emb.where(v.isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        v.alias("v"),
        l2_norm(v).alias("_vn"),  # member norm folded ONCE per row
    )
    # cosine of each member vs EVERY centroid (centroid table broadcast);
    # cosine_from_parts keeps the zero-norm -> 0.0 convention (try_divide
    # NULL coalesced) the oracle's CASE expresses, with each norm fold
    # evaluated once per side instead of twice per pair
    scored = base.crossJoin(
        F.broadcast(
            cent.select(
                F.col("label").alias("clabel"),
                F.col("centroid").alias("cv"),
                l2_norm(F.col("centroid")).alias("_cn"),
            )
        )
    ).select(
        "id",
        "label",
        "clabel",
        F.round(
            cosine_from_parts(
                dot(F.col("v"), F.col("cv")), F.col("_vn"), F.col("_cn")
            ),
            6,
        ).alias("cos"),
    )
    # r11: one groupBy(id) folds BOTH readouts — own-centroid cosine is
    # the member's unique clabel == label row (max(when) picks it), and
    # the nearest centroid is argmax(cos desc, clabel asc) =
    # min(struct(-cos, clabel)) — exactly the row_number window it
    # replaces (negation is IEEE-exact). The old shape ran a per-id
    # window over the members x classes stream PLUS a separate own-rows
    # aggregate and joined three label-keyed frames (guide §2.4).
    per_member = scored.groupBy("id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("cos"))
        ).alias("_own"),
        F.min(
            F.struct((-F.col("cos")).alias("_nc"), F.col("clabel"))
        ).alias("_best"),
    )
    per_label = (
        per_member.groupBy("label")
        .agg(
            F.round(F.avg("_own"), 6).alias("mean_intra_cosine"),
            F.round(
                F.avg(
                    F.when(
                        F.col("_best.clabel") == F.col("label"), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("nn_accuracy"),
        )
        # a label group with no own-centroid rows (only possible for a
        # NULL label, which never equi-matches its clabel) was dropped
        # by the old inner join against the own-rows aggregate — keep
        # that contract
        .where(F.col("mean_intra_cosine").isNotNull())
    )
    return (
        cent.select("label", "n_members")
        .join(F.broadcast(per_label), "label")
        .select(
            "label",
            F.col("n_members").cast("int").alias("n_members"),
            "mean_intra_cosine",
            "nn_accuracy",
        )
    )


def embedding_dim_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION statistics over an embedding column: (dim, mean,
    std, lo, hi). The standard embedding-health readout — a dimension
    with near-zero variance is dead capacity, wildly off-center means
    break cosine vs dot-product assumptions, and distribution drift
    across ingest batches is how silently-broken embedding providers get
    caught.

    Scale shape: posexplode multiplies rows by dim (a narrow map), then
    ONE map-side-combined groupBy on the dim key — at 100 TB the
    aggregate state is (n_dims x partitions) tiny partial rows, never
    the exploded data itself. No driver-side state, no collect.
    """
    exploded = emb.select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
        .select("dim", "mean", "std", "lo", "hi")
    )


def standardize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension z-scoring of an embedding column: zvec[i] =
    (v[i] - mean_i) / std_i with the corpus stats from
    :func:`embedding_dim_stats`. Whitening per dimension is the standard
    pre-step before isotropy-sensitive downstream use (PCA/JL
    projection, product quantization codebook training).

    Scale shape: the 64-row stats table collapses to ONE row of sorted
    (dim, mean, std) structs and broadcasts; the z-transform is then a
    pure narrow ``transform`` over every vector — one tiny aggregate
    plus a zero-shuffle map, no matter the corpus size. Stats are
    rounded to 6 dp BEFORE the transform so the result is reproducible
    bit-for-bit across engines and re-runs.
    """
    stats = embedding_dim_stats(emb, id_col=id_col, vec_col=vec_col)
    row = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mean", "std"))
        ).alias("_s")
    )
    return emb.crossJoin(F.broadcast(row)).select(
        F.col(id_col),
        # coalesce: sample stddev is NULL on a single row (or one
        # non-null value per dim); without it the NULL comparison falls
        # through to the ELSE branch and yields an all-NULL zvec —
        # degenerate inputs must z-score to 0.0 per the zero-variance
        # convention
        F.expr(
            f"transform({vec_col}, (v, i) -> "
            f"round(CASE WHEN coalesce(_s[i].std, 0.0D) = 0.0 "
            f"THEN 0.0 ELSE (cast(v AS double) - _s[i].mean) / _s[i].std END, 6))"
        ).alias("zvec"),
    )


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed covariance of an embedding column: (i, j, cov) for
    the upper triangle (i <= j), cov = E[(x_i - mu_i)(x_j - mu_j)]
    (population). The input every PCA / whitening / Mahalanobis step
    needs, computed without ever materializing a row matrix.

    Scale shape: the mean vector is ONE tiny aggregate (dim values,
    collected back into the kernel's closure — the exact two-pass
    centered moment, no E[xy]-mu_x*mu_y cancellation); the cross-moment
    pass is a per-batch numpy ``X^T X`` GEMM inside mapInPandas that
    emits ONE partial upper-triangle (d*(d+1)/2 rows of (i, j, sum, n))
    per Arrow batch — executor traffic is batches x dim^2 partial sums,
    and per-vector work is a BLAS rank-1 update instead of the previous
    dim^2/2 interpreted Catalyst structs per row (2x wall at sf0.1,
    identical output after the shared 6-dp rounding).
    """
    import numpy as np
    import pandas as pd

    v = F.col(vec_col)
    # the canonical dimension is the MODE of observed sizes (ties to the
    # smallest) — a bare first() picked whichever row Spark returned
    # first, so d (and which rows the filter kept) could change between
    # runs on a mixed-dimension input
    head = (
        emb.where(v.isNotNull())
        .groupBy(F.size(v).alias("d"))
        .count()
        .orderBy(F.col("count").desc(), F.col("d").asc())
        .first()
    )
    if head is None:
        raise ValueError(
            "embedding_covariance needs a non-empty input with at "
            "least one non-null vector"
        )
    d = head["d"]
    # one filter feeding BOTH passes: a NULL/wrong-length row — or a row
    # with a NULL ELEMENT, which Arrow renders as NaN and the GEMM then
    # spreads over every (i,j) touching that dim while the mean pass
    # silently skipped it — must be invisible to the mean AND the kernel
    emb = emb.where(
        v.isNotNull()
        & (F.size(v) == d)
        & ~F.exists(v, lambda x: x.isNull())
    )
    # mean per dimension via one posexplode aggregate (map-side combined)
    mu_rows = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("mu"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mu_rows:
        mu[r["i"]] = float(r["mu"])
    iu = np.triu_indices(d)

    def kernel(batches):
        S = np.zeros((d, d))
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["c"].to_numpy()) - mu
            S += X.T @ X
            n += X.shape[0]
        if n:
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "s": S[iu],
                    "n": np.int64(n),
                }
            )

    part = emb.select(v.cast("array<double>").alias("c")).mapInPandas(
        kernel, "i int, j int, s double, n bigint"
    )
    return (
        part.groupBy("i", "j")
        # + 0.0 normalizes IEEE negative zero: a tiny negative moment
        # rounds to -0.0 in one engine and 0.0 in the other, and the
        # hash gate is sign-of-zero sensitive
        .agg(
            (F.round(F.sum("s") / F.sum("n"), 6) + F.lit(0.0)).alias("cov")
        )
    )


def semantic_outliers(
    emb: DataFrame,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Vectors far from EVERY class centroid: (id, label, best_label,
    best_cos) where best_cos = max cosine over all label centroids is
    below ``threshold`` — the novelty/garbage detector a labeled
    embedding store runs to catch out-of-distribution rows before they
    poison retrieval or training.

    Scale shape: same as :func:`class_centroid_metrics` — dim-fanout
    centroid aggregate (map-side combined), classes-sized centroid table
    broadcast, one fold per centroid per row, then a per-row greatest.
    """
    from ..functions.vector import to_double_array

    v = to_double_array(vec_col)
    flat = emb.select(
        F.col(label_col).alias("label"), F.posexplode(v).alias("i", "x")
    )
    cent = (
        flat.groupBy("label", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("m")))),
                lambda st: st["m"],
            ).alias("cv")
        )
    )
    from ..functions.vector import cosine_from_parts, dot, l2_norm

    # class_centroid_metrics' exact scoring shape: member norm folded
    # ONCE per row, centroid norm once per class, cosine_from_parts for
    # the zero-norm -> 0.0 rule — the previous inline when() re-ran both
    # O(dim) norm folds per (member x centroid) pair (the double
    # evaluation vector.cosine_similarity's docstring warns against)
    # and recomputed the member norm per centroid
    base = emb.where(v.isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        v.alias("v"),
        l2_norm(v).alias("_vn"),
    )
    scored = base.crossJoin(
        F.broadcast(
            cent.select(
                F.col("label").alias("clabel"),
                "cv",
                l2_norm(F.col("cv")).alias("_cn"),
            )
        )
    ).select(
        "id",
        "label",
        "clabel",
        F.round(
            cosine_from_parts(
                dot(F.col("v"), F.col("cv")), F.col("_vn"), F.col("_cn")
            ),
            6,
        ).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("cos").desc(), F.col("clabel").asc()
    )
    best = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            "id",
            "label",
            F.col("clabel").alias("best_label"),
            F.col("cos").alias("best_cos"),
        )
    )
    return best.where(F.col("best_cos") < threshold)


def binary_classifier_metrics(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
    id_col: str = "doc_id",
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """One-row evaluation of a binary scorer against boolean labels:
    ``(n, n_pos, tp, fp, fn, tn, precision, recall, f1, accuracy,
    auc)`` — the harness every quality-classifier / lang-ID /
    dedup-admission model in a data pipeline is validated with before
    its threshold gates a corpus.

    - Threshold metrics: predicted positive iff ``score >= threshold``.
      Degenerate denominators (no predicted / no actual positives)
      yield 0.0, and an empty input yields a single all-zero row with
      auc 0.5.
    - AUC is the exact Mann-Whitney statistic with AVERAGE ranks for
      tied scores (scores are ranked at their 6-dp rounded value, the
      repo's oracle-parity granularity). One class absent -> 0.5.

    Scale shape: ranks come from :func:`rank.global_row_number`
    (sampled range buckets + offsets — no single-partition window),
    then a per-distinct-score aggregate derives each tie group's
    average rank as (min(rn) + max(rn)) / 2. Everything after the rank
    is a two-level reduce to one row; nothing corpus-sized moves to
    the driver. ``materialize`` passes through to the rank primitive
    (use "persist" on a real cluster — see global_row_number's
    docstring for the executor-loss tradeoff).
    """
    from .rank import global_row_number

    base = scored.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).cast("double").alias("_sraw"),
        F.round(F.col(score_col).cast("double"), 6).alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).where(
        # a NULL score or label can contribute to NO bucket: counting it
        # in n but nowhere else deflates accuracy, and a NULL rank would
        # push AUC outside [0, 1]
        F.col("_sraw").isNotNull() & F.col("_y").isNotNull()
    )
    ranked = global_row_number(
        base, "_s", ["_id"], out_col="_rn", materialize=materialize
    )
    per_score = ranked.groupBy("_s").agg(
        ((F.min("_rn") + F.max("_rn")) / F.lit(2.0)).alias("_avg_rank"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_npos_at"),
        F.count("*").alias("_n_at"),
    )
    # threshold the RAW score: the 6-dp rounding is a rank/tie
    # convention, not the classifier's gate — rounding first would flip
    # predictions within 5e-7 of the threshold
    pred = F.col("_sraw") >= F.lit(float(threshold))

    def _cnt(cond):
        # coalesce: sum() over ZERO rows is NULL, and the empty-input
        # contract promises an all-zero row
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    agg = ranked.agg(
        F.count("*").alias("n"),
        _cnt(F.col("_y")).alias("n_pos"),
        _cnt(pred & F.col("_y")).alias("tp"),
        _cnt(pred & ~F.col("_y")).alias("fp"),
        _cnt(~pred & F.col("_y")).alias("fn"),
        _cnt(~pred & ~F.col("_y")).alias("tn"),
    )
    rank_sum = per_score.agg(
        F.coalesce(
            F.sum(F.col("_npos_at") * F.col("_avg_rank")), F.lit(0.0)
        ).alias("_r_pos")
    )
    j = agg.crossJoin(F.broadcast(rank_sum))
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        (
            F.col("_r_pos")
            - F.col("n_pos").cast("double")
            * (F.col("n_pos") + 1).cast("double")
            / F.lit(2.0)
        )
        / (F.col("n_pos").cast("double") * n_neg.cast("double")),
    ).otherwise(F.lit(0.5))
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (prec + rec) > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    acc = F.when(
        F.col("n") > 0,
        (F.col("tp") + F.col("tn")) / F.col("n").cast("double"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "n",
        "n_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(acc, 6).alias("accuracy"),
        F.round(auc, 6).alias("auc"),
    )


def knn_label_probe(
    edges: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out kNN-classification probe over a directed
    :func:`ann.knn_graph` — THE standard embedding-quality eval: each
    vector is classified by the majority label of its k neighbors
    (excluding itself, which the graph already does) and scored against
    its own label. Returns per-class ``(label, n, n_correct,
    accuracy)``; a good embedding separates classes, so accuracy far
    above 1/n_classes means the geometry carries the label signal.
    Ties break (count DESC, label ASC) — deterministic on any engine.

    Scale shape: one join of the edge table against the label column
    (shuffle by id), a map-side-combined vote count per (src, label),
    then an argmax via max(struct) — no windows, nothing quadratic;
    cost is linear in edges (n*k).
    """
    nb = edges.join(
        corpus.select(
            F.col(id_col).alias("dst"), F.col(label_col).alias("_nb")
        ),
        "dst",
    )
    from pyspark.sql import Window

    votes = nb.groupBy("src", "_nb").agg(F.count("*").alias("_cnt"))
    # row_number argmax, not max(struct(cnt, -label)): unary minus would
    # cast a STRING label to double (NULL) and silently zero the
    # accuracy — the window tie-break works for any label type
    wv = Window.partitionBy("src").orderBy(
        F.col("_cnt").desc(), F.col("_nb").asc()
    )
    pred = (
        votes.withColumn("_r", F.row_number().over(wv))
        .where(F.col("_r") == 1)
        .select("src", F.col("_nb").alias("_pred"))
    )
    truth = corpus.select(
        F.col(id_col).alias("src"), F.col(label_col).alias("label")
    )
    return (
        pred.join(truth, "src")
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("_pred") == F.col("label"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n").cast("double"), 6).alias(
                "accuracy"
            ),
        )
    )
