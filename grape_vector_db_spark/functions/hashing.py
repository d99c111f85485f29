"""Engine-portable deterministic hashes.

The dedup/minhash/simhash operators need a hash that (a) is stable across
engines so the DuckDB oracle reproduces it bit-for-bit, and (b) is cheap
JVM-side. Spark's xxhash64 and DuckDB's hash() disagree, so we derive a
32-bit hash from md5 (both engines implement RFC-1321 md5 identically):

    h32(s) = int(md5(s)[:8 hex chars], 16)          # in [0, 2^32)

32 bits per seed is plenty for MinHash (collision prob per shingle pair
~2^-32) and keeps all sums well inside BIGINT range. md5 is ~2x slower than
xxhash64 but still JVM-side and vectorized; at 100 TB the shingle explode
dominates, not the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash of a string column as BIGINT.

    Seeded by prefixing ``"{seed}:"`` — the oracle writes
    ``('0x' || substr(md5(seed || ':' || s), 1, 8))::BIGINT``.
    """
    seeded = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str, seed: int = 0) -> str:
    """DuckDB SQL text equivalent of :func:`h32` for oracle queries."""
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 8))::BIGINT)"


def h32_word(digest_col: Column, word: int) -> Column:
    """32-bit word ``word`` (0-3) of a 128-bit md5 hex digest column as
    BIGINT. One digest yields FOUR independent 32-bit hashes — hash
    families (MinHash, SimHash) should derive hash ``p`` as word ``p % 4``
    of the digest seeded ``p // 4``, quartering the md5 evaluations vs one
    :func:`h32` call per member. Word 0 of seed s == ``h32(col, s)``.
    """
    return F.conv(F.substring(digest_col, 1 + 8 * word, 8), 16, 10).cast("bigint")


def h32_word_sql(expr: str, p: int) -> str:
    """DuckDB SQL twin of the (seed = p//4, word = p%4) family derivation."""
    seed, w = divmod(p, 4)
    return (
        f"(('0x' || substr(md5('{seed}:' || {expr}), {1 + 8 * w}, 8))::BIGINT)"
    )
