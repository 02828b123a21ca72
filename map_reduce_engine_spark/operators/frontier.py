"""2-D Pareto frontier (skyline) operator.

The skyline query — rows not dominated by any other row on a
(minimize, maximize) objective pair — is a classic analytics operator the
reference framework could only express as a full MapReduce with a giant
reduce (its model, ``framework-src``, has no non-equi join at all).  Spark
has no native skyline either; this implements the textbook two-phase
distributed algorithm:

1. **Partition-local prune** (``mapInPandas``, one pass per partition,
   no shuffle): a row that is dominated inside its partition is dominated
   globally, so each partition emits only its local frontier.  Because a
   globally non-dominated row is non-dominated in every subset, no frontier
   row can be lost; because dominance is transitive, every dominated row
   remains dominated by some surviving candidate.
2. **Global prune over the candidate set** (bounded: the union of local
   frontiers, typically ~frontier-sized): shuffled to one partition
   (``repartition(1)`` — a real exchange, so phase 1 keeps its
   parallelism) and pruned with the identical rule.

Scale shape: phase 1 is embarrassingly parallel with zero shuffle; only the
already-tiny candidate set is moved.  At 100 TB the candidate set is the sum
of per-partition frontier sizes — for random data O(log n) per partition —
so the single-task phase 2 is a few thousand rows, not the corpus.

Dominance rule (ties kept): ``s`` dominates ``r`` iff ``s.min_col <=
r.min_col`` and ``s.max_col >= r.max_col`` with strict inequality in at
least one coordinate.  Duplicate points therefore survive together.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _prune_local(pdf: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Drop rows dominated within ``pdf`` (vectorized, O(n log n))."""
    if pdf.empty:
        return pdf
    # per-price-group max size, running max over strictly cheaper groups
    g = pdf.groupby(min_col)[max_col].max().sort_index()
    run_lt = g.cummax().shift(1)  # NaN for the cheapest group (no cheaper rows)
    best_lt = pdf[min_col].map(run_lt)
    best_eq = pdf[min_col].map(g)
    dominated = (best_lt >= pdf[max_col]) | (best_eq > pdf[max_col])
    return pdf[~dominated.fillna(False)]


def pareto_frontier_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``df`` not dominated on (minimize ``min_col``, maximize
    ``max_col``).  Output set is unique regardless of physical layout."""
    schema = df.schema

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _prune_local(pdf, min_col, max_col)

    def global_(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # single coalesced partition: gather all candidate batches, prune once
        parts = [pdf for pdf in it]
        if not parts:
            return
        yield _prune_local(pd.concat(parts, ignore_index=True), min_col, max_col)

    candidates = df.mapInPandas(local, schema)
    # repartition(1), not coalesce(1): coalesce is a NARROW dependency, so it
    # would fuse phase 1 into the single downstream task and serialize the
    # whole scan.  The round-robin shuffle of the tiny candidate set keeps
    # phase 1 embarrassingly parallel; only local frontiers cross the wire.
    return candidates.repartition(1).mapInPandas(global_, schema)
