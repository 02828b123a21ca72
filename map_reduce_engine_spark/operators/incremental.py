"""Incremental aggregate maintenance (materialized-view emulation).

The reference's ``AddInterface`` merge (``ReduceRunner.java:154-172``,
SURVEY.md A11) is partial-aggregate state merged across chunk files at the
end of one job. The same algebra, persisted, is incremental view
maintenance: keep the aggregate STATE (sum/count per key — every avg is
derived, never stored), and fold each new batch in with one key-wise merge.
At 100 TB this is the difference between re-scanning all history per day
and scanning one day's partition: the state table is |keys|-sized, the
merge is one shuffle of state ⊕ one batch's partial aggregate.

Mergeability contract: only decomposable aggregates (sum, count, min, max —
and anything derivable from them) may live in the state. Exactly the
commutative/associative contract ``AddInterface.add`` imposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate name -> (state-producing fn, merge fn over the state column)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts merge by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def agg_state(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Partial-aggregate state of ``df``: one row per key group.

    ``aggs`` maps output column -> (agg_name, input_column); agg_name must be
    mergeable (sum/count/min/max).
    """
    exprs = []
    for out, (name, col) in aggs.items():
        if name not in _MERGEABLE:
            raise ValueError(f"{name} is not a mergeable aggregate (state must be decomposable)")
        exprs.append(_MERGEABLE[name][0](col).alias(out))
    return df.groupBy(*keys).agg(*exprs)


def merge_agg_state(
    base: DataFrame, delta: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold a new batch's state into the base state: union + one key-wise merge.

    ``base`` and ``delta`` must both be state frames from :func:`agg_state`
    with the same ``aggs``. New keys appear, existing keys merge — the
    upsert-free formulation (no join), so the plan is one hash aggregate
    over the union regardless of how many increments have been folded in.
    """
    merged = []
    for out, (name, _) in aggs.items():
        merged.append(_MERGEABLE[name][1](out).alias(out))
    return base.unionByName(delta).groupBy(*keys).agg(*merged)
