"""Sparse vector scalar ops (reference F4; SparseVector, src/types.rs:16-89).

A sparse vector is the column pair ``(indices array<int> sorted asc,
values array<float|double>)``. The reference implements dot/norm/cosine as
a two-pointer merge over the sorted index lists (src/types.rs:53-88); the
Spark expression equivalent walks one side and probes the other with
``array_position`` (binary-search-free but the same O(nnz) work for the
short side probing the long side's sorted list; for table-scale sparse
data the relational form — the doc_terms long table joined on term_id — is
the scale path, see operators.sparse).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sparse_dot(ai: Column, av: Column, bi: Column, bv: Column) -> Column:
    """sum over shared indices of av[k]*bv[k] (src/types.rs:53-68).

    ``array_position`` returns 0 when absent; the CASE guard keeps
    ``element_at`` from seeing index 0 (an ANSI-mode error)."""

    def term(acc: Column, s: Column) -> Column:
        pos = F.array_position(bi, s["i"]).cast("int")
        hit = F.when(pos > 0, F.element_at(bv, pos) * s["v"]).otherwise(F.lit(0.0))
        return acc + hit

    return F.aggregate(
        F.zip_with(ai, av, lambda i, v: F.struct(i.alias("i"), v.alias("v"))),
        F.lit(0.0),
        term,
    )


def sparse_norm(av: Column) -> Column:
    """L2 norm over the stored values (src/types.rs:71-74)."""
    return F.sqrt(
        F.aggregate(
            F.transform(av, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )


def sparse_cosine(ai: Column, av: Column, bi: Column, bv: Column) -> Column:
    """dot/(|a|*|b|), 0.0 when either norm is zero (src/types.rs:77-88)."""
    return F.coalesce(
        F.try_divide(
            sparse_dot(ai, av, bi, bv), sparse_norm(av) * sparse_norm(bv)
        ),
        F.lit(0.0),
    )
