"""Deterministic corpus sampling — LLM-data-pipeline addition.

Curating a 100 TB training mix needs reproducible subsampling: the same
(seed, fractions) must select the same rows on any engine, any
partitioning, any run — Spark's ``sample``/``sampleBy`` use engine-
specific RNG streams, so they can't be oracle-checked or replayed
elsewhere. Instead: **hash-gate Bernoulli** — keep a row iff

    h32(id, seed) / 2^32  <  fraction(stratum)

h32 is the repo-wide md5-derived 32-bit hash (functions.hashing), so the
decision is a pure function of (id, seed) — engine-portable, shuffle-free
(a narrow filter the scan absorbs), and stable under repartitioning.
Statistically this is per-stratum Bernoulli(p): exact-fraction sampling
would need a per-stratum global sort (anti-scale); at corpus sizes the
binomial concentration makes the realized fraction's error negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32

_SCALE = float(1 << 32)


def hash_gate(id_col: Column, fraction: Column | float, seed: int = 0) -> Column:
    """Boolean keep-gate: h32(id, seed)/2^32 < fraction."""
    frac = F.lit(fraction) if isinstance(fraction, float) else fraction
    return h32(id_col.cast("string"), seed) < frac * F.lit(_SCALE)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability (unlisted strata drop).

    The training-mix workhorse: ``fractions={'en': 0.3, 'zh': 1.0}``
    downsamples dominant languages while keeping scarce ones whole, and
    the md5 gate makes the exact row set reproducible anywhere.
    """
    frac = F.lit(0.0)
    for stratum, p in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == stratum, F.lit(float(p))).otherwise(frac)
    return df.where(hash_gate(F.col(id_col), frac, seed))


def uniform_sample_n(
    df: DataFrame, n: int, id_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic FIXED-SIZE uniform sample: the n rows with the
    smallest h32(id, seed). The hash order is a uniform pseudo-random
    permutation of ids, so this is sampling without replacement — and
    the plan is a TakeOrdered (per-partition heap + driver merge of n
    rows), no shuffle, reproducible on any engine/partitioning. Same
    primitive that seeds the k-means sample (ann._sampled_matrix).
    NULL ids hash to NULL, which Spark's ASC sorts FIRST — un-guarded,
    broken rows deterministically occupied every "uniform" sample
    (split_train_eval defends the same hazard); nulls sort last
    instead, so they only appear when the real rows run out."""
    return df.orderBy(
        h32(F.col(id_col).cast("string"), seed).asc_nulls_last(),
        F.col(id_col).asc_nulls_last(),
    ).limit(n)


def split_train_eval(
    df: DataFrame, eval_fraction: float, id_col: str, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible train/eval split by the same
    hash gate (eval = hash below the fraction, train = the rest) — a row
    can never migrate between splits across runs or engines. A NULL id
    hashes to NULL, which would silently drop the row from BOTH splits;
    the gate is coalesced to False so NULL-id rows deterministically land
    in the train split."""
    gate = F.coalesce(
        hash_gate(F.col(id_col), float(eval_fraction), seed), F.lit(False)
    )
    return df.where(~gate), df.where(gate)


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    seed: int = 0,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    h32(id, seed) % k. Hash-keyed (not row-number-keyed) so the
    assignment is stable under re-partitioning, re-ordering, and
    incremental appends — the property a 100 TB pipeline needs to
    re-derive the same folds on every run without storing them.
    Pure narrow map, zero shuffle.
    """
    from ..functions.hashing import h32

    return df.select(
        F.col(id_col).alias("doc_id"),
        *keep_cols,
        (h32(F.col(id_col).cast("string"), seed) % k).cast("int").alias("fold"),
    )


def cluster_debiased_sample(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Duplicate-cluster-debiased Bernoulli sample: keep each document
    with probability ``1 / |its near-dup cluster|`` so every cluster
    contributes ~one document in expectation — the soft alternative to
    hard dedup (keep-one-per-cluster) that preserves intra-cluster
    variety while removing the frequency bias near-duplicates inject
    into the training mix (Lee et al. 2022 §1 motivation).

    ``clusters`` is ``(doc_id, cluster_id)`` from
    :func:`dedup.cluster_pairs` — it only lists documents that appear
    in some near-dup pair; everything else is a singleton (probability
    1, always kept). Returns kept rows as ``(doc_id, *keep_cols,
    cluster_id, cluster_size, weight)`` where ``cluster_id`` coalesces
    to the doc's own id for singletons and ``weight`` = cluster_size is
    the Horvitz-Thompson inverse-probability weight that keeps
    downstream statistics unbiased.

    The gate is the repo-wide deterministic ``hash_gate`` (pure
    function of (doc_id, seed) — engine-portable, replayable). Scale
    shape: one df-sized equi-join with the (pair-bounded, much smaller)
    cluster table + a broadcast-sized per-cluster count join; the gate
    itself is a narrow filter.
    """
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    cl = clusters.join(sizes, "cluster_id")
    out = df.select(
        F.col(id_col).alias("doc_id"), *[F.col(c) for c in keep_cols]
    ).join(cl, "doc_id", "left")
    size = F.coalesce(F.col("cluster_size"), F.lit(1)).cast("int")
    prob = F.lit(1.0) / size.cast("double")
    return (
        out.where(hash_gate(F.col("doc_id"), prob, seed))
        .select(
            "doc_id",
            *keep_cols,
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            size.alias("cluster_size"),
            size.alias("weight"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    each row draws u in (0, 1] and the k rows with the largest
    u^(1/weight) win; inclusion probability is proportional to weight,
    exactly the "sample important documents more" primitive a mixture
    pipeline needs (weight = quality score, char count, dup-cluster
    size...). Here u = (h32(id, seed) + 1) / 2^32, so the whole draw is
    a pure function of (id, seed) — replayable on any engine.

    Ranks on the equivalent key ln(u)/weight (monotone in u^(1/w),
    numerically saner) ROUNDED to 6 dp with id as the tie-break, so the
    selected set is stable across fp orderings. Rows with weight <= 0 or
    NULL are excluded (zero weight = never sampled).

    Scale shape: the key is a narrow expression; per-group top-k is the
    rank.topk_per_group window (per-partition heap via AQE) and global
    top-k is engine TakeOrdered — nothing corpus-sized shuffles beyond
    the k winners per group.
    """
    u = (h32(F.col(id_col).cast("string"), seed) + F.lit(1.0)) / F.lit(_SCALE)
    key = F.round(F.log(u) / weight.cast("double"), 6)
    base = df.where(weight.isNotNull() & (weight.cast("double") > 0)).select(
        *([] if group_col is None else [F.col(group_col)]),
        F.col(id_col),
        key.alias("es_key"),
    )
    if group_col is None:
        return base.orderBy(F.col("es_key").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("es_key").desc(), F.col(id_col).asc()
    )
    return (
        base.select("*", F.row_number().over(w).alias("_rn"))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
