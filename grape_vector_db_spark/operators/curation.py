"""Corpus-curation operators (LLM-data-pipeline additions).

The cleanup passes a large-scale training-data pipeline runs between raw
ingest and tokenization: repetition profiling (Gopher-style quality
signals, Rae et al. 2021 §A1.1), C4-style line filtering (Raffel et al.
2020 §2.2), PII redaction, cross-document boilerplate-line removal, and
per-source quota capping for mixture balancing.

Scale shapes (what each pass costs at 100 TB):

- ``repetition_signals``: explode + map-side-combined groupBy per signal
  family (lines, 2-grams, 3-grams) — three shuffles keyed by doc_id, then
  doc_id-aligned joins of tiny per-doc aggregates. No driver collect, no
  windows over the raw corpus.
- ``c4_line_filter`` / ``pii_redact``: single narrow map, pure JVM
  expressions (array filter / regexp_replace) — zero shuffles.
- ``strip_boilerplate``: one distinct-per-doc line count, a broadcast
  anti-join against the (thresholded, therefore compact) frequent-line
  set — the same hot-key-cap shape as dedup's hot-shingle cap — and one
  groupBy(doc) re-assembly.
- ``source_quota``: one shuffle by group + per-group rank. A group is
  processed by one task, so quotas over very hot groups should cap the
  group first (the rank never needs to see more than ``per_group`` rows
  after AQE skew split; document-count skew is bounded by the quota).

Everything is engine-portable: hashes are the repo-wide md5-derived h32,
floats are rounded to 6 dp, and arg-max tie-breaks use (count, value)
struct ordering so the DuckDB oracle reproduces results bit-for-bit.

Reference parity: the reference's content_analysis config exposes
quality-filter knobs (ref:src/config.rs:291-321) but has no repetition /
boilerplate / PII pass at all — these are capability ADDITIONS per the
build plan (SURVEY.md §2.9 spirit: what a pipeline at this scale needs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32
from ..functions.text import word_grams, ws_tokens, ws_tokens_cased

# Substrings whose presence disqualifies a line (C4 drops lines with
# "javascript", docs with "lorem ipsum" / "{"; we apply all three at the
# line level and surface a doc-level keep flag).
LINE_BLOCKLIST = ["javascript", "lorem ipsum", "cookie"]

# Redaction patterns — kept to syntax shared by Java regex and RE2 so the
# DuckDB oracle applies the identical automaton.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


# edge-whitespace trim class for _lines: the FULL Unicode whitespace set
# (F.trim strips only ' ', so a tab/NBSP-only "line" counted as content —
# inflating c4_line_filter's denominator, surviving into strip_boilerplate's
# clean_text, and feeding repetition_signals' dup_line_frac)
_WS_EDGE = r"^[\t\n\x0B\f\r\x{85}\p{Z}]+|[\t\n\x0B\f\r\x{85}\p{Z}]+$"


def _lines(text_col: Column, delim: str) -> Column:
    """Non-empty whitespace-trimmed lines of ``text_col`` split on
    ``delim`` — escaped first: F.split takes a Java REGEX, so a literal
    delimiter like "|" or "." would otherwise split between every
    character. Trimming uses the Unicode whitespace class (_WS_EDGE),
    so a line of tabs/NBSP is empty, not content. Oracle twin:
    regexp_replace(l, '^[\\t\\n\\x0B\\f\\r\\x85\\pZ]+|'
    '[\\t\\n\\x0B\\f\\r\\x85\\pZ]+$', '')."""
    import re

    return F.filter(
        F.transform(
            F.split(text_col, re.escape(delim)),
            lambda l: F.regexp_replace(l, _WS_EDGE, ""),
        ),
        lambda l: F.length(l) > 0,
    )


def _word_grams(toks: Column, n: int) -> Column:
    """All space-joined word ``n``-grams of a token array (empty if the
    doc has fewer than ``n`` tokens) — zip_with fold, see
    :func:`~grape_vector_db_spark.functions.text.word_grams`."""
    return word_grams(toks, n)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Gopher-style repetition profile per document.

    Returns ``(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top2gram_char_frac, top3gram_char_frac)`` where

    - ``dup_line_frac``    = 1 - distinct_lines / total_lines (the excess
      occurrences of repeated lines, Rae et al. 2021 "duplicate line
      fraction"),
    - ``dup_line_char_frac`` = chars in those excess occurrences / total
      line chars,
    - ``top{n}gram_char_frac`` = occurrences-of-most-frequent-word-n-gram
      × n-gram length / doc chars (ties broken toward the lexicographically
      greatest gram via (count, gram) struct ordering — deterministic in
      both engines).

    Docs above the usual Gopher thresholds (e.g. dup_line_frac > 0.30,
    top2gram_char_frac > 0.20) are candidates for removal; thresholding is
    left to the caller so the signals stay reusable.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_txt"),
        _lines(F.col(text_col), delim).alias("_lines"),
        # trim first: a leading newline/space would otherwise yield an
        # empty first token that forms bogus n-grams (the signal must be
        # whitespace-invariant)
        ws_tokens_cased(F.col(text_col)).alias("_toks"),
    )

    # Per-doc line repetition: explode -> groupBy(doc, line) -> per-doc agg.
    line_counts = (
        base.select("doc_id", F.explode("_lines").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count("*").alias("c"))
    )
    line_stats = line_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.round(
            F.sum(F.col("c") - 1).cast("double") / F.sum("c").cast("double"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("c") - 1) * F.length("line")).cast("double")
            / F.greatest(F.sum(F.col("c") * F.length("line")), F.lit(1)).cast(
                "double"
            ),
            6,
        ).alias("dup_line_char_frac"),
    )

    def top_gram_frac(n: int) -> DataFrame:
        grams = base.select(
            "doc_id",
            F.length("_txt").alias("_nc"),
            F.explode(_word_grams(F.col("_toks"), n)).alias("gram"),
        )
        counts = grams.groupBy("doc_id", "_nc", "gram").agg(
            F.count("*").alias("c")
        )
        return counts.groupBy("doc_id").agg(
            F.round(
                F.max(F.struct("c", "gram")).getField("c")
                * F.length(F.max(F.struct("c", "gram")).getField("gram"))
                / F.first("_nc").cast("double"),
                6,
            ).alias(f"top{n}gram_char_frac")
        )

    # every input doc gets a row — a doc with NO non-empty lines (empty
    # or whitespace-only text) reports zeroed signals instead of silently
    # vanishing from the profile (callers gate with "keep unless flagged")
    out = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(line_stats, "doc_id", "left")
        .join(top_gram_frac(2), "doc_id", "left")
        .join(top_gram_frac(3), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias(
                "dup_line_char_frac"
            ),
            F.coalesce("top2gram_char_frac", F.lit(0.0)).alias(
                "top2gram_char_frac"
            ),
            F.coalesce("top3gram_char_frac", F.lit(0.0)).alias(
                "top3gram_char_frac"
            ),
        )
    )
    return out


def c4_line_filter(
    df: DataFrame,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2) as one
    narrow, shuffle-free map.

    A line is kept when it has ≥ ``min_words`` whitespace words, (if
    ``require_terminal_punct``) ends in terminal punctuation, and contains
    no blocklisted substring (case-insensitive). Returns ``(doc_id,
    n_lines, n_kept_lines, clean_text, keep)`` where ``clean_text``
    rejoins kept lines with newlines and ``keep`` flags docs retaining at
    least half their lines (and at least one).
    """

    def line_ok(l: Column) -> Column:
        ok = F.size(F.regexp_extract_all(l, F.lit(r"\S+"), 0)) >= min_words
        if require_terminal_punct:
            ok = ok & l.rlike("[.!?\"']$")
        low = F.lower(l)
        for bad in LINE_BLOCKLIST:
            ok = ok & ~low.contains(bad)
        return ok & ~l.contains("{")

    lines = _lines(F.col(text_col), delim)
    kept = F.filter(lines, line_ok)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, delim).alias("clean_text"),
    ).withColumn(
        "keep",
        (F.col("n_kept_lines") >= 1)
        & (F.col("n_kept_lines") * 2 >= F.col("n_lines")),
    )


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Regex PII scrub: emails → ``[EMAIL]``, IPv4 → ``[IP]``, NANP-style
    phone numbers → ``[PHONE]``, applied in that order (email bodies may
    contain dots that would otherwise feed the IP pattern). One narrow
    map, zero shuffles; patterns are RE2-compatible so the oracle matches
    byte-for-byte. Returns ``(doc_id, n_emails, n_ips, n_phones,
    clean_text)``.
    """
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    n_ip = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "[IP]")
    n_phone = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(after_ip, PHONE_RE, "[PHONE]")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_email.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_phone.alias("n_phones"),
        clean.alias("clean_text"),
    )


def frequent_lines(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Lines appearing in ≥ ``min_docs`` DISTINCT documents — the
    cross-document boilerplate table (nav bars, cookie banners, licence
    headers). Distinct-per-doc first so a line repeated inside one doc
    doesn't count as boilerplate; one map-side-combined count shuffle.
    Returns ``(line, n_docs)``.
    """
    per_doc = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_lines(F.col(text_col), delim)).alias("line"),
        )
        .distinct()
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    max_broadcast_lines: int = 1_000_000,
) -> DataFrame:
    """Remove cross-document boilerplate lines and re-assemble documents
    in original line order. Returns ``(doc_id, n_kept_lines, clean_text)``
    — documents whose every line is boilerplate drop out entirely.

    Boilerplate lines are exactly the hot keys a shuffled anti-join would
    skew on (same reasoning as dedup's hot-shingle cap), so broadcasting
    the frequent-line set is the preferred plan — but "lines in >=
    min_docs docs" is NOT compact by construction at corpus scale with a
    low threshold, and an unconditional F.broadcast hint bypasses the
    autoBroadcastJoinThreshold safety. The set is therefore COUNTED
    first: at or under ``max_broadcast_lines`` it broadcasts, above it
    the join falls back to a shuffled anti-join and lets AQE's skew
    handling split hot line keys. The count re-runs the frequent-line
    aggregation once (deliberately not persisted — a cache here would
    outlive the call, the exact leak pattern vocabulary() had); that
    aggregation is a fraction of the posexplode+groupBy this operator
    already pays.
    """
    freq = frequent_lines(df, min_docs, id_col, text_col, delim)
    n_freq = freq.count()
    positioned = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_lines(F.col(text_col), delim)).alias("pos", "line"),
    )
    freq_side = F.broadcast(freq) if n_freq <= max_broadcast_lines else freq
    kept = positioned.join(freq_side, "line", "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.getField("line"),
                ),
                delim,
            ).alias("clean_text"),
        )
        .select("doc_id", "n_kept_lines", "clean_text")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    subgroups: int | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign every document a token
    offset range in its group's concatenated token stream, and the fixed
    ``max_tokens`` windows ("bins") that range lands in — the standard
    pre-tokenization layout for LLM training (documents are concatenated
    in id order and the stream is sliced into equal windows; docs may
    straddle a boundary).

    Returns ``(group, doc_id, n_tokens, start_offset, bin_first,
    bin_last)`` where ``start_offset`` is the doc's position in the
    group stream and ``bin_* = offset // max_tokens``.

    Scale shape: one window cumsum partitioned by ``group_col`` — packing
    is inherently sequential per stream, so the group is the parallelism
    unit (1000 sources = 1000 independent streams). If one group holds a
    corpus-scale share of the rows, set ``subgroups=k`` to pre-split
    every group into ``k`` hash-bucketed streams
    (``concat(group, '#', h32(doc_id) % k)``): the window then
    parallelizes k-ways per source. Packing quality is unaffected —
    windows never span groups anyway, and each subgroup is its own
    self-consistent stream (offsets/bins are PER emitted group, which is
    why the output's ``group`` column carries the subgroup label).
    """
    from pyspark.sql import Window

    from ..functions.hashing import h32

    n_tok = F.size(ws_tokens_cased(F.col(text_col)))
    group_expr = F.col(group_col)
    if subgroups is not None and subgroups > 1:
        group_expr = F.concat(
            F.col(group_col).cast("string"),
            F.lit("#"),
            (h32(F.col(id_col).cast("string")) % subgroups).cast("string"),
        )
    w = (
        Window.partitionBy("group")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        group_expr.alias("group"),
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
    )
    cum = base.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return cum.select(
        "group",
        "doc_id",
        "n_tokens",
        "start_offset",
        # integer div, not float-divide-then-floor: offsets at the 100 TB
        # token-stream scale exceed double's 2^53 exact-integer range
        F.expr(f"start_offset div {int(max_tokens)}").alias("bin_first"),
        F.expr(
            f"(start_offset + greatest(n_tokens, 1) - 1) div {int(max_tokens)}"
        ).alias("bin_last"),
    )


def mixture_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group corpus share for mixture weighting: ``(group, n_docs,
    n_tokens, token_share)`` where token_share is the group's fraction of
    all whitespace tokens (6-dp). One map-side-combined groupBy; the
    grand total joins back as a broadcast single row.
    """
    n_tok = F.size(ws_tokens_cased(F.col(text_col)))
    per = df.select(F.col(group_col).alias("group"), n_tok.alias("nt")).groupBy(
        "group"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "group",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("tot"), 6).alias(
            "token_share"
        ),
    )


def pack_bins(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    subgroups: int | None = None,
) -> DataFrame:
    """Materialize the packed training windows that :func:`pack_sequences`
    only addresses: one row per ``(group, bin)`` with the window's actual
    token content — ``(group, bin, n_docs, n_tokens, bin_text)``.

    A document straddling a window boundary contributes its intersecting
    token slice to each window it touches (token ``t`` of the group
    stream lands in bin ``t div max_tokens``); every bin holds exactly
    ``max_tokens`` tokens except each stream's last. Shape: the
    pack_sequences window cumsum, a join back to the tokenized docs, a
    per-doc explode over the (usually 1..2) touched bins, and one
    groupBy(group, bin) re-assembly — all narrow except the two keyed
    shuffles.
    """
    packed = pack_sequences(
        df, max_tokens, id_col, text_col, group_col, subgroups
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens_cased(F.col(text_col)).alias("toks"),
    )
    mt = int(max_tokens)
    seg = (
        packed.join(toks, "doc_id")
        .select(
            "group",
            "doc_id",
            "start_offset",
            "n_tokens",
            "toks",
            F.explode(F.sequence("bin_first", "bin_last")).alias("bin"),
        )
        .select(
            "group",
            "bin",
            "start_offset",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("bin") * mt - F.col("start_offset"),
            ).alias("lo"),
            F.least(
                F.col("n_tokens").cast("long"),
                (F.col("bin") + 1) * mt - F.col("start_offset"),
            ).alias("hi"),
            "toks",
        )
    )
    sliced = seg.select(
        "group",
        "bin",
        "start_offset",
        (F.col("hi") - F.col("lo")).alias("seg_len"),
        F.slice(
            "toks",
            (F.col("lo") + 1).cast("int"),
            (F.col("hi") - F.col("lo")).cast("int"),
        ).alias("segment"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("start_offset", "segment")))
    return sliced.groupBy("group", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("seg_len").alias("n_tokens"),
        F.array_join(
            F.flatten(F.transform(ordered, lambda s: s.getField("segment"))),
            " ",
        ).alias("bin_text"),
    )


def span_corruption(
    df: DataFrame,
    mask_denom: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al. 2020 §3.1.4):
    ``(doc_id, n_tokens, n_masked, n_spans, input_text, targets_text)``
    where masked token runs collapse to ``<extra_id_k>`` sentinels in the
    input and the targets are the sentinels followed by the dropped
    tokens — the standard denoising-objective data prep.

    Masking is DETERMINISTIC (oracle-checkable and reproducible across
    runs/partitionings): token ``i`` of doc ``d`` is masked iff
    ``h32(d || ':' || i) % mask_denom == 0`` (expected rate 1/denom);
    natural adjacency of masked tokens forms the multi-token spans.

    Shape: posexplode -> two per-doc windows (lag + running sum over
    ``pos``) -> one groupBy(doc) re-assembly — the document is the
    parallelism unit, same as every curation window here; the giant-doc
    ceiling is the doc itself, not the corpus.
    """
    from pyspark.sql import Window

    from ..functions.hashing import h32

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens_cased(F.col(text_col))).alias(
            "pos", "term"
        ),
    )
    masked = (
        h32(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("pos").cast("string"),
            )
        )
        % mask_denom
        == 0
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = toks.select(
        "doc_id", "pos", "term", masked.alias("masked")
    ).withColumn(
        "span_start",
        F.col("masked")
        & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
    ).withColumn(
        "span_id", F.sum(F.col("span_start").cast("long")).over(wrun)
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("span_id") - 1).cast("string"), F.lit(">")
    )
    inp_tok = (
        F.when(~F.col("masked"), F.col("term"))
        .when(F.col("span_start"), sentinel)
        .otherwise(F.lit(None))
    )
    tgt_tok = F.when(
        F.col("masked"),
        F.when(
            F.col("span_start"), F.concat(sentinel, F.lit(" "), F.col("term"))
        ).otherwise(F.col("term")),
    )
    per_tok = marked.select(
        "doc_id", "pos", "masked", "span_start",
        inp_tok.alias("it"), tgt_tok.alias("tt"),
    )

    def _joined(col: str) -> F.Column:
        arr = F.array_sort(F.collect_list(F.struct("pos", F.col(col).alias("t"))))
        return F.array_join(
            F.transform(
                F.filter(arr, lambda s: s.getField("t").isNotNull()),
                lambda s: s.getField("t"),
            ),
            " ",
        )

    return per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"),
        F.sum(F.col("span_start").cast("long")).alias("n_spans"),
        _joined("it").alias("input_text"),
        _joined("tt").alias("targets_text"),
    )


def mixture_temperature(
    df: DataFrame,
    tau: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture sampling weights (the multilingual /
    multi-source training standard; mT5's ``share^alpha`` with
    ``alpha = 0.3`` corresponds to ``tau = 1/alpha ≈ 3.3`` here):
    ``(group, n_tokens, token_share, sampling_weight)`` with
    ``w_g ∝ share_g^(1/tau)`` renormalized to sum 1 — softmax-temperature
    convention, so ``tau > 1`` flattens the mixture (upweights
    low-resource groups), ``tau = 1`` is proportional sampling, and
    ``tau < 1`` sharpens toward the dominant group.

    Shape: one map-side-combined groupBy over the corpus, then two
    single-row broadcast joins (token total, weight normalizer) over the
    group-count-sized table — nothing corpus-sized shuffles twice.
    """
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    n_tok = F.size(ws_tokens_cased(F.col(text_col)))
    per = (
        df.select(F.col(group_col).alias("group"), n_tok.alias("nt"))
        .groupBy("group")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    total = per.agg(F.sum("n_tokens").alias("tot"))
    shared = per.crossJoin(F.broadcast(total)).select(
        "group",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tot")).alias("share"),
    )
    w = shared.withColumn("w", F.pow(F.col("share"), F.lit(1.0 / tau)))
    wsum = w.agg(F.sum("w").alias("wsum"))
    return w.crossJoin(F.broadcast(wsum)).select(
        "group",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        F.round(F.col("w") / F.col("wsum"), 6).alias("sampling_weight"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most frequent word ``n``-grams: ``(gram, n_occurrences)``,
    top ``k`` by (count desc, gram asc). Map-side-combined count shuffle +
    engine-native TakeOrdered — no global sort materializes.
    """
    toks = ws_tokens(text_col)
    grams = df.select(F.explode(_word_grams(toks, n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def ngram_diversity(
    df: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical diversity of word ``n``-grams: ``(group,
    n_docs, total_ngrams, distinct_ngrams, diversity)`` where diversity
    = distinct/total (the distinct-n metric of Li et al. 2016,
    arXiv:1510.03055 §5, applied corpus-side) — LOW diversity flags a
    templated / self-repetitive source that will dominate gradient
    updates with near-identical sequences, the same signal
    repetition_signals computes per-document but aggregated where the
    mixture decision is made (per source).

    Scale shape: explode n-grams -> two map-side-combined aggregations
    ((group, gram) counts, then per-group reduce). The (group, gram)
    shuffle is df-bounded (distinct grams per group), and no window or
    driver materialization appears anywhere. Tokenization matches
    top_ngrams (trim, lower, split on whitespace) so the two read the
    same corpus the same way.
    """
    toks = ws_tokens(text_col)
    grams = df.select(
        F.col(group_col).alias("grp"),
        F.col(text_col),
        F.explode(_word_grams(toks, n)).alias("gram"),
    )
    per_gram = grams.groupBy("grp", "gram").agg(F.count("*").alias("cnt"))
    stats = per_gram.groupBy("grp").agg(
        F.sum("cnt").alias("total_ngrams"),
        F.count("*").alias("distinct_ngrams"),
    )
    docs = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    return (
        docs.join(stats, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_docs"),
            F.coalesce(F.col("total_ngrams"), F.lit(0)).alias("total_ngrams"),
            F.coalesce(F.col("distinct_ngrams"), F.lit(0)).alias(
                "distinct_ngrams"
            ),
            F.round(
                F.coalesce(F.col("distinct_ngrams"), F.lit(0)).cast("double")
                / F.greatest(
                    F.coalesce(F.col("total_ngrams"), F.lit(0)), F.lit(1)
                ).cast("double"),
                6,
            ).alias("diversity"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the ingest
    step that feeds an embedding model in a vector database (the
    reference embeds whole documents; chunking is what real deployments
    do so long docs stay within the model's context and retrieval hits
    the relevant span).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; a doc shorter than one
    window yields exactly one chunk. Returns ``(doc_id, chunk_id,
    start_token, n_chunk_tokens, chunk_text)``. Pure narrow map (split +
    sequence + slice), zero shuffles — the scan absorbs it.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    d = df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens_cased(F.col(text_col)).alias("toks"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(f"(size(toks) - {overlap} + {stride} - 1) div {stride}"),
    )
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.col("toks"),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * stride).alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.size("toks") - F.col("chunk_id") * stride
        ).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
        ).alias("chunk_text"),
    )


def mixture_rebalance(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Downsample over-represented groups to the smallest group's token
    mass: each group keeps rows with probability
    ``min_group_tokens / group_tokens`` via the deterministic md5 hash
    gate — the uniform-mixture rebalancing step after
    :func:`mixture_stats` diagnoses the skew. Returns the kept
    ``(doc_id, group)`` rows.

    Scale shape: one groupBy for the per-group token masses (a
    groups-sized table, broadcast back), then a pure narrow gate filter —
    the selection is reproducible on any engine or partitioning, so the
    SAME rows are kept when the pipeline reruns (sampling.hash_gate
    semantics).
    """
    from .sampling import hash_gate

    n_tok = F.size(ws_tokens_cased(F.col(text_col)))
    per = (
        df.select(F.col(group_col).alias("group"), n_tok.alias("nt"))
        .groupBy("group")
        .agg(F.sum("nt").alias("gtok"))
    )
    frac = per.crossJoin(
        F.broadcast(per.agg(F.min("gtok").alias("mintok")))
    ).select(
        "group", (F.col("mintok") / F.col("gtok")).alias("frac")
    )
    base = df.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group"))
    return base.join(F.broadcast(frac), "group").where(
        hash_gate(F.col("doc_id"), F.col("frac"), seed)
    ).select("doc_id", "group")


def source_quota(
    df: DataFrame,
    per_group: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-group cap for mixture balancing: keep at most
    ``per_group`` rows per ``group_col``, chosen by md5-hash order of the
    id (a reproducible uniform sample, not head-of-file order — the same
    hash-gate idiom as sampling.hash_gate). Returns the input columns
    plus ``rk``, the 1-based hash rank within the group.

    One shuffle keyed by group; ties in the 32-bit hash break on the id
    itself so the rank is total and engine-portable.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(
            h32(F.col(id_col).cast("string"), seed).asc(),
            F.col(id_col).asc(),
        )
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_group)
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (the Dolma /
    RefinedWeb recipe: near-dup removal at document level misses the
    boilerplate paragraph repeated across millions of pages — dedup the
    PARAGRAPHS, keep each one's globally FIRST occurrence, and stitch
    documents back together). First = smallest (doc_id, position), a
    total order, so the survivor set is deterministic on any partitioning.

    Returns (doc_id, n_paras, n_kept, kept_text) for every document.

    Scale: the first-occurrence pass is a groupBy(md5) with min(struct
    (doc_id, idx)) — map-side combinable, so a paragraph repeated in 10M
    docs costs one combiner row per input partition, NOT a 10M-row window
    partition (the window formulation would pin one task per hot hash).
    Reassembly is one shuffle on doc_id with an in-array sort.
    """
    paras = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "p"),
        )
        .select("doc_id", "idx", F.trim("p").alias("para"))
        .where(F.length("para") > 0)
        .withColumn("h", F.md5("para"))
    )
    firsts = paras.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    kept = paras.join(firsts, "h").where(
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("idx") == F.col("first.idx"))
    )
    counts = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("kept_text"),
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(counts, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("int").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def pool_chunk_embeddings(
    chunks: DataFrame,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Pool per-chunk embeddings back into one document vector (mean
    pooling + L2 renormalization) — the read side of the chunk -> embed
    -> pool ingest pipeline that pairs with :func:`chunk_documents`.
    (The reference embeds whole documents, src/embeddings.rs; pooling is
    how real deployments aggregate chunked long docs.)

    ONE shuffle (groupBy doc): chunk vectors are gathered with
    collect_list — bounded per doc because chunk counts are
    ceil(doc_tokens / stride) and document length is capped upstream —
    then summed element-wise with a zip_with fold, divided by the chunk
    count, and renormalized. No explode: the dim axis never multiplies
    the row count, so shuffle bytes are exactly the input embedding
    bytes. Returns (doc_col, n_chunks int, pooled array<double>).
    """
    from ..functions.text import normalize_vector

    agg = chunks.groupBy(doc_col).agg(
        F.collect_list(vec_col).alias("_vs"), F.count("*").alias("n_chunks")
    )
    dim = F.size(F.element_at("_vs", 1))
    summed = F.aggregate(
        "_vs",
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    mean = F.transform(summed, lambda s: s / F.col("n_chunks"))
    pooled = normalize_vector(mean) if normalize else mean
    return agg.select(
        doc_col,
        F.col("n_chunks").cast("int").alias("n_chunks"),
        pooled.alias("pooled"),
    )


def mixture_apply(
    df: DataFrame,
    tau: float = 0.7,
    token_budget: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Materialize a temperature mixture: compute the
    :func:`mixture_temperature` weights, turn them into per-group keep
    fractions ``f_g = min(1, budget * w_g / tokens_g)`` (the fraction of
    each group's token mass that realizes the target mixture inside a
    ``token_budget``), and select rows with the deterministic md5 hash
    gate — same reproducible-selection semantics as
    :func:`mixture_rebalance`, but sampling TO the temperature weights
    instead of to the smallest group.

    Scale shape: weights come from one map-side-combined groupBy plus
    two single-row broadcast joins; the selection is a pure narrow gate
    over a broadcast groups-sized fraction table. Returns
    ``(doc_id, group, keep_frac)``.
    """
    from .sampling import hash_gate

    w = mixture_temperature(
        df, tau=tau, id_col=id_col, text_col=text_col, group_col=group_col
    )
    frac = w.select(
        "group",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget))
                * F.col("sampling_weight")
                / F.col("n_tokens"),
            ),
            6,
        ).alias("keep_frac"),
    )
    base = df.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group"))
    return (
        base.join(F.broadcast(frac), "group")
        .where(hash_gate(F.col("doc_id"), F.col("keep_frac"), seed))
        .select("doc_id", "group", "keep_frac")
    )


def dedup_doc_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """WITHIN-document exact line dedup: drop every repeat of a line the
    same document already emitted, keeping first occurrence order —
    navigation menus, cookie banners, and pagination footers repeat
    inside a single scraped page, which per-doc repetition *signals*
    flag but don't fix, and cross-doc boilerplate removal
    (:func:`strip_boilerplate`) can't see.

    Scale shape: a pure narrow map — ``array_distinct`` is
    order-preserving (first occurrence wins) and runs per row, so the
    whole pass is zero-shuffle regardless of corpus size.
    Returns (doc_id, n_lines, n_kept, clean_text).

    ``delim`` is a LITERAL string: it is regex-escaped before the split
    so it always matches the literal join on output (an unescaped '|'
    would regex-split between every character).
    """
    import re as _re

    # bind the split ONCE as a projected column: higher-order-function
    # lambda bodies get no subexpression elimination, so inlining the
    # split expression re-ran the full regex split per array ELEMENT
    # (O(lines) splits x O(text) each — quadratic in doc size on the
    # zero-shuffle path this docstring sells as scale-free)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), _re.escape(delim)).alias("_lines"),
    )
    lines = F.col("_lines")
    # blank lines are STRUCTURE, not repeated content: dedup only
    # non-blank lines (array_distinct would keep one '' and delete every
    # later paragraph separator, merging paragraphs); first occurrence
    # wins via the 1-based array_position probe
    kept = F.filter(
        lines,
        lambda x, i: (F.length(F.trim(x)) == 0)
        | (F.array_position(lines, x) == i + 1),
    )
    return base.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, delim).alias("clean_text"),
    )


def curriculum_shards(
    df: DataFrame,
    n_shards: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum-ordered shard assignment: documents ranked by the
    :func:`textanalysis.quality_score` heuristic and cut into
    ``n_shards`` equal-size shards — shard 0 is the lowest-quality
    decile, shard n-1 the highest. Training loaders that warm up on
    clean text then anneal onto the full mix read shards in REVERSE
    (n-1 first); ascending order gives an anti-curriculum.

    Scale shape: the quality pass is a narrow map; the global rank uses
    the two-level bucketed rank (:func:`rank.global_row_number` — no
    single-partition window); the shard cut is pure arithmetic on
    (rank, total), so the assignment is deterministic and equal-size by
    construction. Returns (doc_id, quality, shard).
    """
    from .rank import global_row_number
    from .textanalysis import quality_score

    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        "doc_id", "quality"
    )
    ranked = global_row_number(
        q, "quality", ["doc_id"], out_col="_rn", total_col="_n"
    )
    return ranked.select(
        "doc_id",
        "quality",
        F.floor((F.col("_rn") - 1) * n_shards / F.col("_n"))
        .cast("int")
        .alias("shard"),
    )


#: Cc control characters minus the text-bearing \t \n \r (Cc is exactly
#: U+0000-001F + U+007F-009F, so explicit ranges express "Cc except
#: whitespace controls" without the regex class intersection RE2 lacks).
CONTROL_CHAR_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
) -> DataFrame:
    """Unicode text normalization — the canonicalization pass every
    web-scale corpus runs before dedup/tokenization (CCNet, OSCAR, C4
    all normalize first; without it, byte-identical prose with
    different encodings of "é" or stray zero-width marks defeats exact
    dedup and splinters the BPE vocabulary). Appends ``out_col``:

    1. strip Cc control characters except ``\\t \\n \\r``
       (:data:`CONTROL_CHAR_RE`) and all Cf format characters
       (zero-width space/joiner, BOM, bidi marks),
    2. Unicode ``form`` canonicalization (NFC default: combining
       sequences compose, so e + U+0301 == é — one token, one hash),
    3. collapse space/tab runs to a single space,
    4. trim leading/trailing spaces.

    Python has no JVM-side NFC, so this is the repo's designated slow
    path done right: ONE vectorized Arrow-batched pandas UDF (never
    per-row Python), purely narrow — zero shuffles, the scan absorbs
    it. The rule set is deliberately RE2-expressible so the DuckDB
    oracle (nfc_normalize + the same regexes) replays it exactly;
    NBSP (Zs) is deliberately NOT collapsed — it is meaningful
    typography, and C4-style filters handle it downstream.
    """
    import re as _re
    import unicodedata as _ud

    from pyspark.sql.functions import pandas_udf

    ctrl = _re.compile(CONTROL_CHAR_RE)
    runs = _re.compile(r"[ \t]+")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            x = ctrl.sub("", x)
            x = "".join(c for c in x if _ud.category(c) != "Cf")
            x = _ud.normalize(form, x)
            x = runs.sub(" ", x)
            return x.strip(" ")

        return s.map(one)

    return df.withColumn(out_col, _norm(F.col(text_col)))


def phrase_blocklist_hits(
    df: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-boundary multi-phrase matching: ``(doc_id, n_hits)`` for
    every document containing at least one blocklist phrase, where a
    phrase matches only as a whole-word token sequence (lowercased,
    whitespace-tokenized — the same normalization as :func:`top_ngrams`,
    so "ad" never matches inside "adapt" the way a substring scan
    would). The content-policy / NSFW-blocklist primitive of a curation
    pipeline.

    Scale shape: phrases are grouped by word count; for each length n
    the document side streams its word n-grams (zip_with fold, narrow)
    into a BROADCAST hash join against that length's phrase table —
    matching is O(corpus tokens x distinct lengths) with no corpus
    shuffle before the per-doc count. This is the join-based analogue
    of Aho-Corasick: the automaton state is the broadcast hash table,
    and it scales to blocklists far beyond what a single regex
    alternation compiles to.
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    by_len: dict[int, list[str]] = {}
    for p in phrases:
        norm = " ".join(p.lower().split())
        if norm:
            by_len.setdefault(len(norm.split(" ")), []).append(norm)
    if not by_len:
        raise ValueError("every phrase normalized to empty")
    toks = ws_tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    spark = df.sparkSession
    # ONE corpus pass for every phrase length (r11): the per-length gram
    # streams concat into a single explode and meet ONE broadcast phrase
    # table — a space-joined n-gram can never equal an m-gram (n != m),
    # so merging the per-length joins changes nothing but the pass count
    # (was: one tokenize+explode pass and one union branch per length).
    ptab = spark.createDataFrame(
        [(p,) for ps in by_len.values() for p in sorted(set(ps))],
        "gram string",
    )
    gram_arrays = [
        word_grams(F.col("toks"), n) for n in sorted(by_len)
    ]
    all_grams = (
        gram_arrays[0]
        if len(gram_arrays) == 1
        else F.concat(*gram_arrays)
    )
    grams = base.select("doc_id", F.explode(all_grams).alias("gram"))
    hits = grams.join(F.broadcast(ptab), "gram")
    return hits.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_hits"))


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Groups of quasi-identifier values held by FEWER than ``k`` rows:
    ``(quasi..., group_size)`` — the k-anonymity audit a release
    pipeline runs before publishing per-record metadata (a combination
    seen < k times re-identifies its members; Sweeney 2002). One
    map-side-combined groupBy on the quasi columns; the violating set is
    small by definition (every row in it belongs to a group of < k)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # filter on the LONG count, cast after: a >2^31-row group (easy at
    # 100 TB for a coarse quasi-column) must not wrap into a false
    # violation (or throw under ANSI)
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("_gs"))
        .where(F.col("_gs") < k)
        .select(*quasi_cols, F.col("_gs").cast("int").alias("group_size"))
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a
    pseudo-random permutation key ``h32(seed:id)``, a ``shard`` (key mod
    ``n_shards``) and a 1-based ``pos`` inside its shard — the exact
    (shard, pos) order a training loader should read so consecutive
    examples are decorrelated, reproducibly across reruns and engines
    (the oracle replays the same md5-derived key).

    Scale shape: ONE hash shuffle on ``shard`` plus a per-shard local
    sort (each shard is a window partition), never a global sort. The
    32-bit key is uniform, so shards are balanced to ~n/n_shards rows
    (key collisions break ties by id). Size ``n_shards`` to at least the
    cluster's parallelism: one shard = one task's sort. Epoch reshuffle
    = a different ``seed``.
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = h32(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy("shard").orderBy(
        F.col("_key").asc(), F.col(id_col).asc()
    )
    return (
        df.select(id_col)
        .withColumn("_key", key)
        .withColumn("shard", (F.col("_key") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("_key")
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Budgeted subset selection (the DataComp-style "fill the token
    budget from the top of the quality ranking" step): rows taken in
    ``score_col``-descending order (ties -> lowest id) while the
    running token total stays within ``budget``. Returns the selected
    rows with their ``cum_tokens`` — a row is kept iff its INCLUSIVE
    cumulative sum <= budget, so the result never overshoots.

    Scale shape: the exact global running sum comes from
    :func:`rank.global_prefix_sum` (two-level bucketed cumsum — no
    single-partition window over the corpus); the budget cut is then a
    narrow filter. Token counts are integral, so the sum is exact.
    """
    from .rank import global_prefix_sum

    ordered = df.select(
        id_col, score_col, tokens_col
    ).withColumn("_negscore", -F.col(score_col).cast("double"))
    cum = global_prefix_sum(
        ordered, "_negscore", [id_col], tokens_col, out_col="cum_tokens"
    )
    return (
        cum.where(F.col("cum_tokens") <= budget)
        .select(id_col, score_col, tokens_col, "cum_tokens")
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022, PSM
    order): pick a middle token span, emit ``<PRE> prefix <SUF> suffix
    <MID> middle`` so a causal LM learns infilling — the standard code
    training-data prep. Returns ``(doc_id, n_tokens, mid_start,
    mid_len, fim_text)``.

    The two cut points are DETERMINISTIC (reproducible and
    oracle-checkable, like span_corruption's mask): ``h32(doc_id:f1/f2)
    % (n+1)``, sorted. Shape: pure narrow array expressions — split,
    two slices, array_join; zero shuffle, zero explode, so it
    parallelizes embarrassingly at any corpus size.
    """
    from ..functions.hashing import h32

    did = F.col(id_col).cast("string")
    toks = ws_tokens_cased(F.col(text_col))
    n = F.size(toks)
    c1 = h32(F.concat(did, F.lit(":f1"))) % (n + 1)
    c2 = h32(F.concat(did, F.lit(":f2"))) % (n + 1)
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")
    full = F.concat(
        F.array(F.lit(pre_tok)),
        F.slice(toks, 1, lo),
        F.array(F.lit(suf_tok)),
        F.slice(toks, hi + 1, n - hi),
        F.array(F.lit(mid_tok)),
        F.slice(toks, lo + 1, hi - lo),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        lo.alias("mid_start"),
        (hi - lo).alias("mid_len"),
        F.array_join(full, " ").alias("fim_text"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize the deterministic training shuffle: attach
    :func:`shuffle_shards`'s (shard, pos) to the full rows and write
    ``path/shard=N/`` parquet, one file per shard, rows stored in
    ``pos`` order — the artifact a training loader streams sequentially
    (sequential reads, no seek), shard dirs round-robined across
    workers. Re-running with the same seed rewrites byte-identical
    order; a new epoch is a new seed.

    Shape: the shuffle_shards hash shuffle + one repartition(shard) +
    in-partition sort — two shuffles of the payload total, no global
    sort. One file per shard keeps the within-shard order meaningful;
    size n_shards so a shard fits a task (and a loader's read budget).
    """
    order = shuffle_shards(df, n_shards=n_shards, id_col=id_col, seed=seed)
    (
        df.join(order, id_col)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


#: candidate payment-card spans: MAXIMAL runs of >= 13 digits with
#: optional single space/dash separators. The run is unbounded on top —
#: a bounded {12,18} window would carve 16 digits out of a longer
#: account/reference number, half-redacting it and leaking the residual
#: digits (RE2 has no lookahead to anchor the right edge, so maximal
#: match + a length check in the validator is the portable form).
CARD_CAND_RE = r"\b\d(?:[ -]?\d){12,}\b"


def _luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a candidate span (separators stripped): from
    the RIGHT, double every second digit, subtract 9 when > 9; valid
    iff the sum is divisible by 10. Pure nested Catalyst lambdas —
    stays in codegen, and the identical arithmetic is expressible in
    the DuckDB oracle."""
    d = F.regexp_replace(cand, "[ -]", "")
    n = F.length(d)
    # bind each digit ONCE (substring+cast), then weight by position —
    # the nested-when form re-evaluated the extraction four times per
    # digit and was easy to desynchronize when edited
    digits = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substring(d, (n - i + 1).cast("int"), 1).cast("int"),
    )
    terms = F.transform(
        digits,
        lambda x, j: F.when(
            (j + 1) % 2 == 0,
            F.when(x * 2 > 9, x * 2 - 9).otherwise(x * 2),
        ).otherwise(x),
    )
    total = F.aggregate(terms, F.lit(0), lambda a, x: a + x)
    return total % 10 == 0


def card_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Payment-card PII pass (presidio-style): find maximal digit runs
    of >= 13 digits, validate each with card length (13-19 digits) plus
    the Luhn checksum, and redact ALL candidate runs to ``[CARD]``
    whole (conservative, and never a partial redaction that leaks
    residual digits of a longer number). Returns ``(doc_id,
    n_candidates, n_valid_cards, clean_text)`` — n_valid_cards is the
    count that pass length+Luhn, the auditing signal that separates
    real card leaks from arbitrary long numbers. One narrow map, zero
    shuffle; RE2-compatible pattern and integer-only checksum, so the
    oracle reproduces both counts byte-for-byte.
    """
    t = F.col(text_col)
    cands = F.regexp_extract_all(t, F.lit(CARD_CAND_RE), 0)
    valid = F.filter(
        cands,
        lambda c: (F.length(F.regexp_replace(c, "[ -]", "")) <= 19)
        & _luhn_valid(c),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(cands).alias("n_candidates"),
        F.size(valid).alias("n_valid_cards"),
        F.regexp_replace(t, CARD_CAND_RE, "[CARD]").alias("clean_text"),
    )
