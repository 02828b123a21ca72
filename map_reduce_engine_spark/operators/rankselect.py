"""Scale-safe exact order statistics: value-grid rank-select and sharded
prefix sums.

These are the two idioms that replaced every raw-row single-partition
window in round 5 (see SCALE.md "Sorts / top-k" and
``plans.single_partition_raw_nodes``); they live here so the nine query
bodies that use them share ONE implementation.

Value-grid rank-select: the k-th order statistic of a column equals the
smallest distinct value whose cumulative count reaches ``k`` — tie-breaks
can never change the VALUE at a rank, so ranking the (distinct value,
count) GRID is bit-identical to ranking raw rows, and the only ordered
window runs over the value-domain-bounded grid instead of the fact table.

Sharded prefix sums: a global row number / running sum in a total order
(shard, *order_cols) is computed as parallel within-shard prefixes plus
per-shard offsets from the (n_shards)-sized shard-total grid — the classic
two-pass distributed scan. The caller picks a ``shard`` expression that is
MONOTONE in the leading order column (contiguous key ranges), which makes
shard order + within-shard order = the global order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_grid_cum(
    df: DataFrame, col: str, cnt: str = "cnt", cum: str = "cum"
) -> DataFrame:
    """(col, cnt, cum) — per-distinct-value counts with the INCLUSIVE
    cumulative count over the value-ordered grid. The exclusive lower rank
    bound of a grid row is ``cum - cnt`` (for interval-containment picks).
    """
    g = df.groupBy(col).agg(F.count("*").cast("bigint").alias(cnt))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    return g.select(col, cnt, F.sum(cnt).over(w).cast("bigint").alias(cum))


def rank_pick(col: str, cum: str, k_sql: str) -> Column:
    """Aggregate expression: the ``k``-th order statistic off a
    ``value_grid_cum`` frame — min value whose cumulative count reaches k.
    ``k_sql`` is a SQL expression (it may reference broadcast columns).
    Returns NULL when k exceeds the row count, mirroring an empty
    ``WHERE rn = k`` pick."""
    return F.min(F.when(F.expr(f"{cum} >= ({k_sql})"), F.col(col)))


def sharded_running(
    df: DataFrame,
    shard_sql: str,
    order_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    rn: str = "rn",
) -> DataFrame:
    """Append a global row number ``rn`` (and a running sum ``cum_<c>`` per
    ``sum_cols`` entry) over the total order (shard asc, *order_cols asc),
    with no single-partition exchange: within-shard prefixes run keyed and
    parallel, offsets come from one window over the shard-total GRID.

    Bit-identical to ``row_number()/sum() OVER (ORDER BY ...)`` on raw rows
    because ``shard_sql`` is monotone in the leading order column.
    """
    d = df.withColumn("_shard", F.expr(shard_sql))
    wr = Window.partitionBy("_shard").orderBy(*order_cols)
    wl = wr.rowsBetween(Window.unboundedPreceding, 0)
    loc = d.select(
        "*",
        F.row_number().over(wr).cast("bigint").alias("_lrn"),
        *[
            F.sum(c).over(wl).cast("bigint").alias(f"_lc_{c}")
            for c in sum_cols
        ],
    )
    stot = d.groupBy("_shard").agg(
        F.count("*").cast("bigint").alias("_cnt"),
        *[F.sum(c).cast("bigint").alias(f"_s_{c}") for c in sum_cols],
    )
    wo = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    off = stot.select(
        "_shard",
        F.coalesce(F.sum("_cnt").over(wo), F.lit(0)).cast("bigint").alias("_ocnt"),
        *[
            F.coalesce(F.sum(f"_s_{c}").over(wo), F.lit(0))
            .cast("bigint")
            .alias(f"_o_{c}")
            for c in sum_cols
        ],
    )
    return loc.join(F.broadcast(off), "_shard").select(
        *df.columns,
        (F.col("_lrn") + F.col("_ocnt")).cast("bigint").alias(rn),
        *[
            (F.col(f"_lc_{c}") + F.col(f"_o_{c}"))
            .cast("bigint")
            .alias(f"cum_{c}")
            for c in sum_cols
        ],
    )
