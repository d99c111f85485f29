"""Programmatic physical-plan audit — the library form of the checks
`tests/test_plans.py` pins and SCALE.md documents, so pipeline authors
can assert the plan properties their job depends on (zero shuffles, a
pushed filter, no cross join) in THEIR OWN tests instead of discovering
a regression at 100 TB.

Everything works on the executed-plan string; Spark exposes no stable
structured plan API in Python, and the string form is what the plan
tests in this repo already key on.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Formatted executed physical plan (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanAudit:
    """Counts of the plan features that matter at scale."""

    exchanges: int
    single_partition_exchanges: int
    broadcast_exchanges: int
    reused_exchanges: int
    sort_merge_joins: int
    broadcast_hash_joins: int
    nested_loop_joins: int
    cartesian_products: int
    scans: int
    pushed_filters: bool
    partition_filters: bool
    python_evals: int

    @property
    def shuffles(self) -> int:
        """Data-moving exchanges (broadcasts excluded — they ship a
        built table, not a repartition of the stream; ReusedExchange
        excluded — a reuse reads an already-shuffled output, it moves
        nothing new)."""
        return self.exchanges - self.broadcast_exchanges


def audit_plan(df: DataFrame) -> PlanAudit:
    """Inspect ``df``'s physical plan and count the properties a
    scale-review asks about. Typical assertions::

        a = audit_plan(my_pipeline)
        assert a.shuffles <= 2
        assert a.single_partition_exchanges == 0
        assert a.cartesian_products == 0 and a.python_evals == 0
    """
    import re

    p = plan_string(df)
    # per-scan flags: ANY scan carrying a non-empty list counts — a
    # whole-string check would false-negative whenever a second,
    # legitimately-unfiltered scan prints 'PushedFilters: []' (union or
    # join pipelines)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    parts = re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
    # Classify exchanges by the NODE NAME at the head of each plan line,
    # not by substring over the whole string: a ReusedExchange node
    # contains 'Exchange' (and its simpleString repeats the reused
    # child's description, e.g. '... BroadcastExchange ...'), so naive
    # p.count() both inflates `exchanges` and misclassifies a reused
    # broadcast as a data-moving shuffle. AQE wrappers (ShuffleQueryStage,
    # AQEShuffleRead, BroadcastQueryStage) are deliberately NOT counted —
    # they re-describe an Exchange node that is itself printed on its own
    # line in the same plan.
    node_re = re.compile(r"^[\s:+\-*]*(?:\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)")
    fresh_ex = broadcast_ex = reused_ex = single_ex = 0
    for line in p.splitlines():
        m = node_re.match(line)
        if not m:
            continue
        name = m.group(1)
        if name == "ReusedExchange":
            reused_ex += 1
        elif name == "BroadcastExchange":
            broadcast_ex += 1
        elif name == "Exchange":
            fresh_ex += 1
            if "SinglePartition" in line:
                single_ex += 1
    return PlanAudit(
        exchanges=fresh_ex + broadcast_ex,
        single_partition_exchanges=single_ex,
        broadcast_exchanges=broadcast_ex,
        reused_exchanges=reused_ex,
        sort_merge_joins=p.count("SortMergeJoin"),
        broadcast_hash_joins=p.count("BroadcastHashJoin"),
        nested_loop_joins=p.count("BroadcastNestedLoopJoin"),
        cartesian_products=p.count("CartesianProduct"),
        scans=p.count("Scan parquet") + p.count("Scan orc"),
        pushed_filters=any(m.strip() for m in pushed),
        partition_filters=any(m.strip() for m in parts),
        python_evals=p.count("BatchEvalPython") + p.count("ArrowEvalPython"),
    )
