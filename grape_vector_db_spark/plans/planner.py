"""Query planning above Catalyst (reference §4; src/query_engine.rs:254-372).

Catalyst owns expression/join planning; what it can't know is which *index
strategy* to use for a similarity query — that's data the engine tracks
(corpus size, available index tables). The reference's QueryOptimizer only
clamps parameters (limit<=100, threshold>=0.1, src/query_engine.rs:254-337);
we keep those clamps API-compatible and add the real decision:

  corpus <= brute_force_limit          -> exact scan k-NN  (zero shuffle)
  IVF tables present                   -> nprobe-pruned scan + exact rescore
  packed binary present                -> hamming two-stage
  else                                 -> exact scan (correct, warn on size)

These are *physical strategy picks over index tables*, not Catalyst rules:
every choice is still a declarative DataFrame plan that AQE re-optimizes at
runtime.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_LIMIT = 100          # src/query_engine.rs:254-263
MIN_THRESHOLD = 0.1      # src/query_engine.rs:321-337


@dataclass
class PlanChoice:
    strategy: str        # "brute_force" | "ivf" | "binary_two_stage"
    reason: str


def clamp_request(limit: int, threshold: float | None) -> tuple[int, float | None]:
    """Reference parameter clamps (QueryOptimizer::optimize_query)."""
    limit = min(limit, MAX_LIMIT)
    if threshold is not None and threshold < MIN_THRESHOLD:
        threshold = MIN_THRESHOLD
    return limit, threshold


def choose_search_strategy(
    corpus_rows: int,
    has_ivf: bool = False,
    has_packed: bool = False,
    has_sq: bool = False,
    brute_force_limit: int = 1_000_000,
) -> PlanChoice:
    if corpus_rows <= brute_force_limit:
        return PlanChoice("brute_force", f"corpus {corpus_rows} <= {brute_force_limit}")
    if has_ivf:
        return PlanChoice("ivf", "IVF index tables available")
    if has_sq:
        # SQ8 coarse ranking keeps magnitude info -> better recall than
        # 1-bit hamming at the same rescore budget; prefer it when present
        return PlanChoice("sq_two_stage", "SQ8 index table available")
    if has_packed:
        return PlanChoice("binary_two_stage", "packed binary index available")
    return PlanChoice(
        "brute_force",
        f"no index tables; exact scan over {corpus_rows} rows (build an index!)",
    )
