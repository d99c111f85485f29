"""Mergeable, engine-replayable streaming sketches: HyperLogLog
cardinality and Count-Min frequency.

At 100 TB the questions "how many distinct X" and "how often does Y
occur" are asked constantly (vocabulary growth curves, dedup planning,
heavy-hitter detection for skew salting) and an exact answer costs a
full shuffle keyed by X every time. Sketches answer them from a
fixed-size summary that (a) is built with ONE map-side-combined
aggregation, (b) MERGES across partitions / days / corpora by cell-wise
max (HLL) or sum (CMS), and (c) here is fully deterministic: both use
the repo's md5-derived ``h32`` (`functions/hashing.py`) and integer/
power-of-two arithmetic, so a DuckDB oracle reproduces every register
bit-for-bit — unlike Spark's built-in approx_count_distinct (HLL++
with a JVM-private hash), which is faster but unauditable from outside
the engine. The built-ins remain the right choice when you don't need
cross-engine replay; these are the right choice when the sketch itself
is a persisted, shareable artifact.

References (public): Flajolet et al. 2007 (HyperLogLog, the analysis
and the alpha_m bias constant); Heule et al. 2013 (HLL++ small-range
correction regime); Cormode & Muthukrishnan 2005 (Count-Min).

Why the register sums replay exactly in fp: every 2^-M term is an exact
double, and all partial sums are multiples of 2^-rho_max bounded by m,
so the accumulated sum needs < 53 mantissa bits regardless of the order
either engine adds them in — the indicator sum is order-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_word


def _rho(w: Column, bits: int) -> Column:
    """Position (1-based) of the leftmost 1-bit of ``w`` seen as a
    ``bits``-wide word; ``bits + 1`` when w == 0. Computed via the
    binary-string representation (conv -> lpad -> instr) — exact
    integer/string ops only, no float log2 whose edge rounding could
    disagree between engines at exact powers of two."""
    s = F.lpad(F.conv(w.cast("string"), 10, 2), bits, "0")
    return F.when(w == 0, F.lit(bits + 1)).otherwise(
        F.instr(s, "1").cast("int")
    )


def _bloom_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a key — ONE md5 digest, word p%4 seeded
    p//4. The single derivation bloom_bits / bloom_probe / bloom_gate
    all share: a drifted copy on any side would silently break the
    no-false-negative contract."""
    digest = F.md5(F.concat(F.lit("0:"), key))
    return [
        F.pmod(h32_word(digest, p), F.lit(m_bits)).cast("int") for p in range(k)
    ]


def _cms_cells(value_str: Column, depth: int, width: int) -> Column:
    """The depth (row, cell) pairs of a value — shared by build and
    probe so the seeds can never diverge."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), (h32(value_str, r) % width).alias("cell")
            )
            for r in range(depth)
        ]
    )


def _hll_estimate_expr(m: int):
    """The HLL estimate over (n_used, _s_used) agg columns: raw
    alpha_m * m^2 / S with the small-range linear-counting branch, the
    LARGE-range 32-bit-saturation correction (Flajolet 2007:
    E > 2^32/30 -> -2^32 ln(1 - E/2^32) — without it the estimate caps
    near 2^32), and 0.0 for an empty register table (sum over zero rows
    is NULL). One definition for the global and grouped variants."""
    # Flajolet 2007's exact small-m constants; the asymptotic formula
    # only holds for m >= 128 (a ~+0.4% multiplicative bias at m=16
    # otherwise). p >= 7 paths (every oracled query, p=12) unchanged.
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    two32 = float(1 << 32)
    s = F.coalesce(F.col("_s_used"), F.lit(0.0)) + (
        F.lit(m) - F.col("n_used")
    )
    zeros = F.lit(m) - F.col("n_used")
    raw = F.lit(alpha * m * m) / s
    return (
        F.when(F.col("n_used") == 0, F.lit(0.0))
        .when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )



def hll_registers(
    df: DataFrame, value_col: str, p: int = 8, seed: int = 0
) -> DataFrame:
    """Build the HyperLogLog register table ``(register, max_rho)`` for
    a column: register = top ``p`` bits of h32(value), rho = leading-
    zero rank of the remaining ``32 - p`` bits. The sketch is the
    m = 2^p registers' MAX — one map-side-combined groupBy; registers
    never seen are absent (they read as rho 0 at estimate time).

    Merging two corpora's sketches = union + groupBy(register) max —
    the property that lets every partition / day / shard summarize
    independently and combine losslessly."""
    return _hll_register_rows(df, value_col, p, seed)


def _hll_register_rows(
    df: DataFrame,
    value_col: str,
    p: int,
    seed: int,
    group_col: str | None = None,
) -> DataFrame:
    """ONE register/rho derivation for the global and grouped sketches —
    the hash split is the cross-engine replay contract, and the
    previous hand-copied twins could silently diverge on a derivation
    change while both still "worked"."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    h = h32(F.col(value_col).cast("string"), seed)
    lower_bits = 32 - p
    reg = F.shiftright(h, lower_bits).cast("bigint")
    w = h % F.lit(2**lower_bits)
    gcols = [F.col(group_col).alias("grp")] if group_col else []
    # a NULL value hashes to NULL and would add a phantom
    # (register=NULL, max_rho=NULL) row that biases BOTH estimate
    # branches and merges into standing tables forever
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, reg.alias("register"), _rho(w, lower_bits).alias("_r"))
        .groupBy(*(["grp"] if group_col else []), "register")
        .agg(F.max("_r").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row cardinality estimate from a register table:
    ``(m, n_used, estimate)`` where estimate applies the standard
    HyperLogLog formula alpha_m * m^2 / sum(2^-rho_j) (absent registers
    contribute 2^0 = 1) with the small-range linear-counting correction
    (E <= 2.5m and empty registers exist -> m * ln(m / V)). Estimate is
    6-dp rounded; the raw indicator sum is fp-exact (module docstring),
    so the round is engine-stable."""
    m = 2**p
    agg = registers.agg(
        F.count("*").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s_used"),
    )
    est = _hll_estimate_expr(m)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_used").cast("bigint").alias("n_used"),
        F.round(est, 6).alias("estimate"),
    )


def cms_table(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch as a ``(row, cell, cnt)`` table:
    ``depth`` independent h32 seeds, cell = h32_r(value) % width,
    cnt = sum of weights (1 per occurrence by default). At most
    depth * width rows regardless of input size.

    Shape: one narrow projection fans each input row into ``depth``
    (row, cell) pairs via an inline posexplode of the seed array, then
    ONE map-side-combined groupBy — with depth*width distinct keys the
    combiners collapse virtually everything map-side, so the shuffle
    carries ~depth*width rows per partition. Merging sketches is
    cell-wise sum (union + groupBy sum)."""
    if depth < 1 or width < 2:
        raise ValueError("cms_table: need depth >= 1, width >= 2")
    v = F.col(value_col).cast("string")
    wcol = (
        F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    )
    cells = _cms_cells(v, depth, width)
    # NULL values hash to NULL cells: phantom rows that break the
    # depth*width bound and pollute merged standing sketches
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.explode(cells).alias("_rc"), wcol.alias("_w"))
        .groupBy(F.col("_rc.row").alias("row"), F.col("_rc.cell").alias("cell"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for a (small) query set from a CMS
    table: ``(value, estimate)`` with estimate = min over the sketch's
    ``depth`` rows of the value's cell count (the one-sided Count-Min
    guarantee: estimate >= true count; overshoot <= e/width * total
    with prob 1 - e^-depth). The query side re-derives its cells with
    the same seeds and joins the sketch on (row, cell) — broadcast-
    sized by construction (depth*width cells)."""
    v = F.col(value_col).cast("string")
    cells = _cms_cells(v, depth, width)
    q = queries.select(
        F.col(value_col).alias("value"), F.explode(cells).alias("_rc")
    ).select("value", F.col("_rc.row").alias("row"), F.col("_rc.cell").alias("cell"))
    return (
        q.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    bins: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-grid histogram as a mergeable sketch: ``(group?, bin, cnt,
    lo, hi, n)`` with bin = clamp(floor((x - lo) / w), 0, bins - 1) over
    the [lo, hi] range from a one-row (per-group) min/max pass. The
    scale answer to quantile questions: the exact ``percentile``
    aggregate buffers every value per group, which at 100 TB per key is
    the memory wall — the histogram carries at most ``bins`` rows per
    group through one map-side-combined groupBy, and same-grid
    histograms merge by cell sum.

    Binning is engine-exact: lo/hi/w and the floor are the same double
    arithmetic on the same values in any engine, so a DuckDB oracle
    reproduces every cell (same idiom as the sketch hashes — no
    engine-private internals in the artifact)."""
    if bins < 2:
        raise ValueError("histogram_sketch: need bins >= 2")
    gcols = [group_col] if group_col else []
    # one NaN would poison hi (Spark sorts NaN above every double),
    # collapse every row into the last bin, and NaN all quantiles; a
    # NULL group key would be aggregated by the stats pass but silently
    # dropped by the null-rejecting equi-join one line later — exclude
    # both up front so the two passes see the same population
    df = df.where(~F.isnan(F.col(value_col).cast("double")))
    for g in gcols:
        df = df.where(F.col(g).isNotNull())
    stats = df.groupBy(*gcols).agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
        F.count(value_col).alias("n"),
    )
    joined = (
        df.join(F.broadcast(stats), gcols)
        if gcols
        else df.crossJoin(F.broadcast(stats))
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    raw_bin = F.floor(
        (F.col(value_col).cast("double") - F.col("lo")) / w
    )
    b = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(F.least(F.greatest(raw_bin, F.lit(0)), F.lit(bins - 1)))
        .cast("int")
    )
    return (
        joined.where(F.col(value_col).isNotNull())
        .groupBy(*gcols, b.alias("bin"))
        .agg(
            F.count("*").alias("cnt"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.first("n").alias("n"),
        )
        # the grid width is part of the SKETCH, not the reader's guess:
        # histogram_quantiles used to take an independent bins param,
        # and a mismatch silently halved/doubled every bin width
        .withColumn("bins", F.lit(int(bins)))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """Quantile estimates from a :func:`histogram_sketch` table:
    ``(group?, q, est)`` — est interpolates linearly inside the first
    bin whose cumulative count reaches ceil-less q*n:
    est = lo + w * (bin + (q*n - cum_before) / cnt). Max error is one
    bin width (hi - lo) / bins. Everything happens on the ≤bins-row
    sketch: a per-group window cumsum plus one small join — nothing
    corpus-sized moves."""
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    # trust the sketch's own recorded grid when present (a column, so
    # no extra driver job; legacy sketches without it fall back to the
    # caller's parameter — whose mismatch silently mis-scaled every
    # bin width, the bug the recorded column removes)
    has_bins = "bins" in hist.columns
    win = Window.partitionBy(*gcols).orderBy("bin") if gcols else (
        Window.orderBy("bin")
    )
    cum = hist.select(
        *gcols,
        "bin",
        "cnt",
        "lo",
        "hi",
        "n",
        (
            F.col("bins").cast("double")
            if has_bins
            else F.lit(float(bins))
        ).alias("_bins"),
        (F.sum("cnt").over(win) - F.col("cnt")).alias("cum_before"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    w = (F.col("hi") - F.col("lo")) / F.col("_bins")
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(
                f"quantiles must be in (0, 1], got {q} — q=0 has no row"
                " under the strict cumulative bound (use the sketch's lo)"
            )
    target = F.col("q") * F.col("n")
    inside = (
        F.col("lo")
        + w
        * (
            F.col("bin")
            + (target - F.col("cum_before")) / F.col("cnt")
        )
    )
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.least(F.greatest(inside, F.col("lo")), F.col("hi"))
    )
    hit = cum.crossJoin(F.broadcast(qdf)).where(
        (target <= F.col("cum_before") + F.col("cnt"))
        & (target > F.col("cum_before"))
    )
    return hit.groupBy(*gcols, "q").agg(
        F.round(F.min(est), 6).alias("est")
    )


def bloom_bits(
    df: DataFrame,
    key: Column,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``key`` as a DISTINCT bit-position table
    ``(bit int)`` — the distributed representation of an m-bit filter.

    Position ``p`` of a key is word ``p % 4`` of its seeded md5 digest
    (``h32_word``, seed ``p // 4``) mod ``m_bits``: k <= 4 costs ONE md5
    per key, and a DuckDB oracle replays every position bit-for-bit.
    The table holds at most ``m_bits`` rows regardless of input size, so
    after the build's single map-side-combined distinct it broadcasts
    anywhere — the point of a Bloom membership gate at 100 TB: the probe
    side (below) never shuffles the corpus, unlike an exact semi-join
    against a billion-key benchmark set. Union-merge tables to merge
    filters (bitwise OR); estimate fill with ``count / m_bits``.

    Reference parity: the reference keeps no membership sketch — this
    serves its decontamination gate (dedup.contamination_pairs) at
    scales where the benchmark set itself is too big to broadcast raw.
    """
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (one md5 digest), got {k}")
    # NULL keys have no positions; without the filter a (bit=NULL) row
    # lands in the table, breaks the m_bits row bound, and crashes
    # bloom_gate's position collection
    return (
        df.where(key.isNotNull())
        .select(
            F.explode(F.array(*_bloom_positions(key, m_bits, k))).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    key: Column,
    bits: DataFrame,
    m_bits: int = 4096,
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe a :func:`bloom_bits` filter: ``(id, n_hits, member)`` where
    ``member`` is true iff ALL ``k`` positions of SOME row's key are
    set (the usual Bloom semantics: no false negatives, false-positive
    rate ~(1 - e^(-k*n/m))^k). Membership is decided PER ROW then
    max-rolled per id: an id occurring on several rows must not sum its
    duplicate hits into a false negative (2k != k). NULL keys are never
    members. The probe explodes k rows per key and broadcast-joins the
    <= m_bits-row bit table — a narrow corpus pass.
    """
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (one md5 digest), got {k}")
    probes = df.select(
        F.col(id_col).alias("id"),
        F.monotonically_increasing_id().alias("_row"),
        key.alias("_key"),
    ).select(
        "id",
        "_row",
        F.explode(F.array(*_bloom_positions(F.col("_key"), m_bits, k))).alias(
            "bit"
        ),
    )
    hit = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    per_row = hit.groupBy("id", "_row").agg(
        F.sum(F.coalesce(F.col("_set"), F.lit(0))).cast("int").alias("_nh")
    )
    return per_row.groupBy("id").agg(
        F.max("_nh").alias("n_hits"),
        F.max(F.col("_nh") == k).alias("member"),
    )


def hll_registers_grouped(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-group HyperLogLog register tables in ONE pass:
    ``(group, register, max_rho)`` — the answer to "distinct X per
    source/day/shard" as a single map-side-combined groupBy over at most
    ``n_groups * 2^p`` cells, where the exact answer shuffles every
    (group, X) pair. Cells merge across corpora by (group, register)
    max, exactly like the global sketch."""
    return _hll_register_rows(df, value_col, p, seed, group_col=group_col)


def hll_estimate_grouped(registers: DataFrame, p: int = 8) -> DataFrame:
    """Per-group estimates from :func:`hll_registers_grouped`:
    ``(grp, m, n_used, estimate)`` — same formula and small-range
    correction as :func:`hll_estimate`, one tiny keyed aggregate."""
    m = 2**p
    agg = registers.groupBy("grp").agg(
        F.count("*").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s_used"),
    )
    est = _hll_estimate_expr(m)
    return agg.select(
        "grp",
        F.lit(m).alias("m"),
        F.col("n_used").cast("bigint").alias("n_used"),
        F.round(est, 6).alias("estimate"),
    )


def bloom_gate(
    key: Column,
    bits,
    m_bits: int = 4096,
    k: int = 3,
) -> Column:
    """Boolean membership COLUMN from a :func:`bloom_bits` filter — the
    stateless form: the bit table packs into ``m_bits / 64`` longs held
    as a literal array (KBs on the driver), and each row tests its k
    positions with shift/mask expressions. Pure narrow, zero joins —
    composable into Structured Streaming micro-batches (a static filter
    over a stream needs no stateful operator) and into any scan-side
    gate where even a broadcast join is unwelcome.

    ``bits`` is the bloom_bits DataFrame (collected once — bounded by
    m_bits) or an iterable of set bit positions.
    """
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (one md5 digest), got {k}")
    if isinstance(bits, DataFrame):
        positions = {r["bit"] for r in bits.collect()}
    else:
        positions = set(bits)
    if positions and (min(positions) < 0 or max(positions) >= m_bits):
        raise ValueError("bit position outside [0, m_bits)")
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for b in positions:
        words[b // 64] |= 1 << (b % 64)
    # two's-complement fold: BIGINT literals are signed
    lits = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.array(*[F.lit(w).cast("long") for w in lits])
    cond = None
    for pos in _bloom_positions(key, m_bits, k):
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        # call_function: the SQL shiftright takes a COLUMN shift amount,
        # unlike the python F.shiftright wrapper (literal ints only)
        hit = (
            F.call_function("shiftright", word, pos % 64).bitwiseAND(
                F.lit(1)
            )
            == 1
        )
        cond = hit if cond is None else (cond & hit)
    return cond
