"""Binary quantization + Hamming two-stage search (reference F5-F7, J5).

Reference semantics (src/quantization.rs):
- quantize: bit i = (v[i] > threshold), default threshold 0.0, packed
  MSB-first (:86-122, bit order Msb0 :33-63).
- hamming_distance: popcount over the packed bits (:130-141).
- binary similarity = 1 - hamming/dimension (:144-148).
- multi_stage_search (:151-193): stage 1 ranks ALL candidates by Hamming
  similarity and keeps ceil(n * rescore_ratio) (default 0.1); stage 2
  rescores those with exact cosine and returns top-k.

Packing choice: 32 bits per word stored in BIGINT (word = sum of
bit<<(31-pos), MSB-first inside each word — same bit ORDER as the
reference's Msb0 bytes, just a wider lane). 32 not 64 keeps every word
positive and portable to engines whose BIGINT shift-overflow semantics
differ (the DuckDB oracle reproduces words exactly). Hamming over words:
sum(bit_count(a XOR b)) — whole-stage-codegen'd, no Python.

Scale: the packed index table is 32x smaller than the f32 vectors
(matching the reference's 28.5x report, BASELINE.md), so stage 1 scans a
tiny table with zero shuffle; stage 2 joins the (k/ratio)-row candidate set
back to full vectors — a broadcast join by construction.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot, to_double_array, vector_lit
from .search import cosine_vs_query

WORD_BITS = 32


def pack_bits(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
              threshold: float = 0.0) -> DataFrame:
    """(id, packed array<bigint>, dimension) — MSB-first 32-bit words.

    A trailing partial word is left-aligned (padded with 0 bits on the
    right), mirroring the reference's byte padding.
    """
    v = to_double_array(vec_col)
    base = df.select(
        F.col(id_col), v.alias("_vd"), F.size(vec_col).alias("dimension")
    )
    # size 0 would make sequence(0, -1) a DESCENDING [0, -1] (Spark
    # defaults to step -1), i.e. two phantom words — empty vectors pack
    # to an empty word array instead
    packed = F.expr(
        f"""
        if(size(_vd) = 0, array(),
        transform(sequence(0, int(ceil(size(_vd) / {WORD_BITS}.0)) - 1), w ->
          aggregate(
            slice(_vd, w * {WORD_BITS} + 1, {WORD_BITS}),
            named_struct('acc', 0L, 'n', 0),
            (s, x) -> named_struct(
                'acc', s.acc * 2L + if(x > {threshold}D and not isnan(x), 1L, 0L), 'n', s.n + 1),
            s -> cast(s.acc * pow(2, {WORD_BITS} - s.n) as bigint)
          )
        ))
        """
    )
    return base.select(F.col(id_col), packed.alias("packed"), "dimension")


def hamming_distance(a, b):
    """Column expr: popcount of XOR over packed word arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def binary_similarity(a, b, dimension):
    """1 - hamming/dim (src/quantization.rs:144-148)."""
    return F.lit(1.0) - hamming_distance(a, b).cast("double") / dimension


def sq_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """8-bit scalar quantization: (id, codes array<int> in 0..255, minv,
    rng) with per-vector min/max calibration —
    ``code = floor((x - minv)/rng * 255 + 0.5)`` (explicit half-up floor
    so every engine rounds identically; constant vectors get rng=0 and
    all-zero codes). The f64 -> byte-range codes are an 8x compression
    (stored as array<int> here — parquet dictionary-encodes them; a
    production sink would pack to binary like pack_bits). Complements the
    1-bit path: SQ8 keeps magnitude information, so the coarse ranking is
    usable on its own and the rescore budget can be far smaller.
    """
    v = to_double_array(vec_col)
    base = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_min(v).alias("minv"),
        (F.array_max(v) - F.array_min(v)).alias("rng"),
    )
    codes = F.expr(
        "transform(_v, x -> int(floor("
        "CASE WHEN rng = 0 THEN 0.0 ELSE (x - minv) / rng * 255.0 END + 0.5D)))"
    )
    return base.select(F.col(id_col), codes.alias("codes"), "minv", "rng")


def sq_search(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    rescore: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sq_df: DataFrame | None = None,
    index_covers_df: bool = True,
) -> DataFrame:
    """SQ8 coarse ranking -> exact cosine rescore, the two-stage shape of
    ``two_stage_search`` with a magnitude-aware stage 1:
    ``approx_dot = minv * sum(q) + rng/255 * <codes, q>`` reconstructs the
    dot product against the de-quantized vector in one JVM fold over the
    codes table (8x smaller scan than f64), stage 2 joins the FIXED-size
    candidate set back for the exact score (broadcast by construction).

    NB stage 1 ranks by approximate DOT PRODUCT (the metric the codes
    reconstruct) while stage 2 ranks by cosine — on unnormalized corpora
    high-norm vectors crowd the rescore budget; store normalized
    embeddings (or raise ``rescore``) if norms vary widely.

    ``index_covers_df=False`` declares that ``sq_df`` indexes a SUPERSET
    of ``df`` (the filtered-search path): the index is then semi-joined
    down to df's ids BEFORE ranking, so the fixed candidate budget is
    spent on rows that can actually be returned. Leave True (default)
    when the index matches df — the semi-join is skipped.
    """
    if sq_df is None:
        sq_df = sq_quantize(df, id_col, vec_col)
    elif not index_covers_df:
        sq_df = sq_df.join(df.select(F.col(id_col)), id_col, "left_semi")
    q = [float(x) for x in query_vector]
    qsum = sum(q)
    qlit = vector_lit(q)
    dot_codes = dot(F.col("codes").cast("array<double>"), qlit)
    approx = F.col("minv") * F.lit(qsum) + F.col("rng") / F.lit(255.0) * dot_codes
    stage1 = (
        sq_df.select(F.col(id_col), approx.alias("approx_dot"))
        .orderBy(F.col("approx_dot").desc(), F.col(id_col).asc())
        # never cap below k: rescore < k must not shrink the result set
        .limit(max(k, rescore))
    )
    return (
        stage1.join(
            df.select(F.col(id_col), to_double_array(vec_col).alias("_v")), id_col
        )
        .select(
            F.col(id_col),
            F.round(cosine_vs_query(F.col("_v"), query_vector), 6).alias("score"),
            F.round(F.col("approx_dot"), 6).alias("approx_dot"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def two_stage_search(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    rescore_ratio: float = 0.1,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    packed_df: DataFrame | None = None,
    rescore_budget: int = 2000,
    known_total: int | None = None,
    index_covers_df: bool = True,
) -> DataFrame:
    """Hamming coarse ranking -> exact cosine rescore (src/quantization.rs:151-193).

    ``packed_df`` lets callers reuse a pre-built packed index table (the
    realistic 100 TB deployment: pack once per ingest, search many).
    Stage-1 keeps ``max(k, min(ceil(total * rescore_ratio),
    rescore_budget))`` candidates: a corpus-PROPORTIONAL keep would push
    the stage-1 top-N past topKSortFallbackThreshold at scale and degrade
    TakeOrdered into a global sort with a single-partition gather
    (VERDICT r1 item 4); the fixed budget matches the reference's own
    rescore count of 2,000 (docs/week5-6-binary-quantization.md:63).
    Both stages use deterministic id tiebreaks. ``known_total`` skips the
    per-query count job when the caller tracks the index size;
    ``index_covers_df=False`` semi-joins a SUPERSET index down to df's
    ids first (see sq_search) so filtered searches spend the candidate
    budget on returnable rows.
    """
    if packed_df is None:
        packed_df = pack_bits(df, id_col, vec_col, threshold)
    elif not index_covers_df:
        packed_df = packed_df.join(df.select(F.col(id_col)), id_col, "left_semi")
        known_total = None  # the filtered size is what the budget scales on

    dim = len(query_vector)
    qbits: list[int] = []
    for w in range(0, dim, WORD_BITS):
        word = 0
        chunk = query_vector[w : w + WORD_BITS]
        for x in chunk:
            word = word * 2 + (1 if x > threshold else 0)
        word <<= WORD_BITS - len(chunk)
        qbits.append(word)
    qpacked = F.array(*[F.lit(w).cast("bigint") for w in qbits])

    total = known_total if known_total is not None else packed_df.count()
    n_keep = max(k, min(math.ceil(total * rescore_ratio), rescore_budget))

    stage1 = (
        packed_df.select(
            F.col(id_col),
            binary_similarity(F.col("packed"), qpacked, F.lit(float(dim))).alias(
                "hamming_sim"
            ),
        )
        .orderBy(F.col("hamming_sim").desc(), F.col(id_col).asc())
        .limit(n_keep)
    )

    rescored = (
        stage1.join(df.select(F.col(id_col), to_double_array(vec_col).alias("_v")), id_col)
        .select(
            F.col(id_col),
            F.round(cosine_vs_query(F.col("_v"), query_vector), 6).alias("score"),
            F.round(F.col("hamming_sim"), 6).alias("hamming_sim"),
        )
    )
    return rescored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def sq_dim_train(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-DIMENSION SQ8 calibration (the FAISS ScalarQuantizer layout,
    faiss/impl/ScalarQuantizer.h QT_8bit: one [min, max] per dimension
    trained over the corpus, vs sq_quantize's per-vector bounds): ONE
    map-side-combined aggregate pass emits all 2*dim extrema in a single
    reduce — a dim-sized driver row, not a shuffle of exploded elements.
    Returns (mins, ranges) as Python lists to inline as literals.
    """
    v = to_double_array(vec_col)
    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).head()["d"]
    aggs = []
    for i in range(dim):
        e = F.element_at(v, i + 1)
        aggs.append(F.min(e).alias(f"mn{i}"))
        aggs.append(F.max(e).alias(f"mx{i}"))
    row = df.agg(*aggs).head()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    rngs = [float(row[f"mx{i}"]) - float(row[f"mn{i}"]) for i in range(dim)]
    return mins, rngs


# shared per-dim SQ8 code expression over columns _v/_mn/_rg (1-based i):
# the single source of truth for the codec's half-up rounding rule —
# sq_dim_quantize encodes with it and sq_dim_error_report measures it,
# so a rounding-rule change cannot silently diverge the two
# codes CLAMP to [0, 255] (FAISS QT_8bit clamps too): encoding values
# outside the trained bounds must not produce negative / >255 codes
_SQ_DIM_CODE = (
    "greatest(0.0D, least(255.0D, "
    "floor(CASE WHEN element_at(_rg, i) = 0 THEN 0.0 "
    "ELSE (element_at(_v, i) - element_at(_mn, i)) / element_at(_rg, i)"
    " * 255.0 END + 0.5D)))"
)


def sq_dim_quantize(
    df: DataFrame,
    mins: list[float],
    rngs: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode with trained per-dim bounds: code_i = floor((x_i - min_i)
    / rng_i * 255 + 0.5), rng_i = 0 -> 0. Narrow map over broadcast
    literal bounds; 8x compression like sq_quantize but shared bounds,
    so decoding needs no per-row metadata."""
    v = to_double_array(vec_col)
    mins_l = vector_lit(mins)
    rngs_l = vector_lit(rngs)
    # size 0 -> sequence(1, 0) DESCENDS to [1, 0] and element_at(.., 0)
    # raises (the pack_bits guard, applied here too)
    codes = F.expr(
        f"if(size(_v) = 0, array(),"
        f" transform(sequence(1, size(_v)), i -> int({_SQ_DIM_CODE})))"
    )
    return df.select(
        F.col(id_col), v.alias("_v"), mins_l.alias("_mn"), rngs_l.alias("_rg")
    ).select(F.col(id_col), codes.alias("codes"))


def sq_dim_search(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    rescore: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds: tuple[list[float], list[float]] | None = None,
    codes_df: DataFrame | None = None,
    index_covers_df: bool = True,
) -> DataFrame:
    """Per-dim SQ8 two-stage search: stage 1 reconstructs the dot
    product as ``dot(mins, q) + sum_i codes_i * (rng_i * q_i / 255)`` —
    the per-dim coefficient array is a driver-side constant, so the scan
    folds ONCE over the int codes (8x smaller than f64) with zero
    shuffles; stage 2 broadcasts the fixed candidate list back for the
    exact cosine. Same budget-capped shape as sq_search / two_stage_search.
    """
    if bounds is None:
        bounds = sq_dim_train(df, vec_col)
    mins, rngs = bounds
    q = [float(x) for x in query_vector]
    const = sum(m * x for m, x in zip(mins, q))
    coeff = [r * x / 255.0 for r, x in zip(rngs, q)]
    # codes_df reuses a persisted sq_dim_quantize table (quantize once,
    # search many — the whole point of the 8x-smaller stage-1 scan)
    codes = (
        codes_df
        if codes_df is not None
        else sq_dim_quantize(df, mins, rngs, id_col, vec_col)
    )
    if codes_df is not None and not index_covers_df:
        # the sq_search/two_stage_search contract: a SUPERSET codes
        # table (filtered-search path) semi-joins down to df's ids
        # BEFORE the budget cut — otherwise stage 1 spends candidates
        # on non-returnable ids and the stage-2 inner join silently
        # under-fills the k rows
        codes = codes.join(df.select(F.col(id_col)), id_col, "left_semi")
    coeff_l = vector_lit(coeff)
    dot_codes = dot(F.col("codes").cast("array<double>"), coeff_l)
    stage1 = (
        codes.select(F.col(id_col), (dot_codes + F.lit(const)).alias("approx_dot"))
        .orderBy(F.col("approx_dot").desc(), F.col(id_col).asc())
        .limit(max(k, rescore))
    )
    return (
        stage1.join(
            df.select(F.col(id_col), to_double_array(vec_col).alias("_v")), id_col
        )
        .select(
            F.col(id_col),
            F.round(cosine_vs_query(F.col("_v"), query_vector), 6).alias("score"),
            F.round(F.col("approx_dot"), 6).alias("approx_dot"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sq_dim_error_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Per-dimension SQ8 reconstruction-error report: (dim, mse, max_err)
    of dequantize(quantize(x)) vs x — the codec-quality readout that
    decides whether 8-bit storage is acceptable for a corpus before
    rewriting it. Theoretical bound per dim is (range/255)^2/12 (uniform
    quantization noise); a dim far above it means outliers are stretching
    the range and per-dim trimming is warranted.

    Scale shape: encode and decode are one narrow expression over
    broadcast per-dim bounds; the error aggregate is a dim-keyed
    posexplode + map-side-combined groupBy (dims x partitions partials).
    """
    mins, rngs = bounds if bounds is not None else sq_dim_train(df, vec_col)
    mins_l = vector_lit(mins)
    rngs_l = vector_lit(rngs)
    v = to_double_array(vec_col)
    # reconstruct min_i + code_i * rng_i / 255 with THE codec's code
    # expression (shared _SQ_DIM_CODE), so the report always measures
    # the codec that actually ships
    recon = F.expr(
        "if(size(_v) = 0, array(), "
        "transform(sequence(1, size(_v)), i -> element_at(_mn, i) + "
        f"{_SQ_DIM_CODE} * element_at(_rg, i) / 255.0))"
    )
    errs = (
        df.select(
            v.alias("_v"), mins_l.alias("_mn"), rngs_l.alias("_rg")
        )
        .select(
            F.posexplode(
                F.zip_with(F.col("_v"), recon, lambda a, b: a - b)
            ).alias("dim", "e")
        )
    )
    return errs.groupBy("dim").agg(
        F.round(F.avg(F.col("e") * F.col("e")), 6).alias("mse"),
        F.round(F.max(F.abs(F.col("e"))), 6).alias("max_err"),
    )
