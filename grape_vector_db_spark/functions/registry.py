"""SQL function registry — makes the vector kit available to plain
``spark.sql`` users (SURVEY §4.2 item 3).

Uses Spark's SQL scalar functions (CREATE TEMPORARY FUNCTION ... RETURN
<expr>), NOT Python UDFs: the bodies are the same codegen-friendly
higher-order expressions the DataFrame kit builds, so
``SELECT cosine_sim(a, b)`` costs exactly what the Column API costs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS: dict[str, str] = {
    # dot/(|a||b|), 0.0 on zero norm — reference cosine (src/storage.rs:851-865)
    "cosine_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN coalesce(try_divide(
            aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x),
            sqrt(aggregate(transform(a, x -> x * x), 0D, (s, x) -> s + x)) *
            sqrt(aggregate(transform(b, x -> x * x), 0D, (s, x) -> s + x))
        ), 0D)
    """,
    "l2_norm": """
        CREATE OR REPLACE TEMPORARY FUNCTION l2_norm(a ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN sqrt(aggregate(transform(a, x -> x * x), 0D, (s, x) -> s + x))
    """,
    "euclidean_dist": """
        CREATE OR REPLACE TEMPORARY FUNCTION euclidean_dist(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)),
                              0D, (s, x) -> s + x))
    """,
    "hamming_dist": """
        CREATE OR REPLACE TEMPORARY FUNCTION hamming_dist(
            a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS BIGINT
        RETURN aggregate(zip_with(a, b, (x, y) -> bigint(bit_count(x ^ y))),
                         0L, (s, x) -> s + x)
    """,
    "dot_product": """
        CREATE OR REPLACE TEMPORARY FUNCTION dot_product(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)
    """,
    # functions.hashing.h32 as SQL — same md5 derivation, so SQL users
    # get the SAME deterministic gates/folds as the DataFrame kit
    "h32": """
        CREATE OR REPLACE TEMPORARY FUNCTION h32(s STRING, seed INT)
        RETURNS BIGINT
        RETURN cast(conv(substr(md5(concat(cast(seed AS STRING), ':', s)),
                         1, 8), 16, 10) AS BIGINT)
    """,
    # sequence.decayed_user_scores' per-event weight as a scalar:
    # 2^(-age_days / half_life) relative to an anchor timestamp
    "decay_weight": """
        CREATE OR REPLACE TEMPORARY FUNCTION decay_weight(
            ts TIMESTAMP, anchor TIMESTAMP, half_life_days DOUBLE)
        RETURNS DOUBLE
        RETURN pow(0.5D, (cast(timestampdiff(MICROSECOND, ts, anchor)
                               AS DOUBLE) / 86400000000D) / half_life_days)
    """,
    "jaccard_tokens": """
        CREATE OR REPLACE TEMPORARY FUNCTION jaccard_tokens(
            a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE
        RETURN coalesce(try_divide(
            cast(size(array_intersect(a, b)) AS DOUBLE),
            cast(size(array_union(a, b)) AS DOUBLE)), 0D)
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the kit as SQL temporary functions; returns the names."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(_FUNCTIONS)
