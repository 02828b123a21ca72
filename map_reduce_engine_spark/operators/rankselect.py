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


# Value-range shard fan-out for numeric grids. Within-shard windows are
# keyed by shard and spread over spark.sql.shuffle.partitions tasks; the
# only ordered single-partition window runs over the <=258-row shard-total
# grid. 256 keeps a 5e7-distinct-cents grid at 100x under ~200k rows/shard.
_N_GRID_SHARDS = 256

_NUMERIC_BASES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
)


def value_grid_cum(
    df: DataFrame,
    col: str,
    cnt: str = "cnt",
    cum: str = "cum",
    n_shards: int = _N_GRID_SHARDS,
) -> DataFrame:
    """(col, cnt, cum) — per-distinct-value counts with the INCLUSIVE
    cumulative count over the value-ordered grid. The exclusive lower rank
    bound of a grid row is ``cum - cnt`` (for interval-containment picks).

    For numeric grids the cumulative count is a SHARDED two-pass prefix sum
    (``sharded_running``) over equal-width value-range shards derived from
    the grid's own min/max (two scalar SUBQUERIES over the grid — they plan
    as ``Subquery`` nodes, not joins, so no nested-loop join enters the
    plan and Catalyst reuses the grid's aggregation exchange). Equal-width
    bucketing of the value is monotone in the value, so shard order +
    within-shard value order = the global value order and the result is
    bit-identical to a global ordered window — but no task ever sorts more
    than ~1/n_shards of the grid, so a multi-million-row cents grid at
    100x never funnels through one task. NULL sorts first and NaN last
    (Spark ASC semantics) via explicit shard pins; infinities are pinned
    likewise, and min/max are taken over finite values only, so a
    pathological all-non-finite grid degrades to one shard rather than
    erroring. Non-numeric grids (rare: genuinely domain-bounded label/date
    grids) keep the single ordered window over the grid.
    """
    # _vg_lo/_vg_hi are the bounds aliases in the sharding SQL below — a
    # col/cnt colliding with them would surface as an opaque ambiguous-
    # reference analysis error instead of this clear one (ADVICE r06)
    for name in (col, cnt):
        if name in ("_vg_shard", "_vg_lo", "_vg_hi"):
            raise ValueError(f"value_grid_cum reserves column name {name!r}")
    g = df.groupBy(col).agg(F.count("*").cast("bigint").alias(cnt))
    base = dict(g.dtypes)[col].split("(")[0]
    if base not in _NUMERIC_BASES:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return g.select(col, cnt, F.sum(cnt).over(w).cast("bigint").alias(cum))
    q = f"`{col}`"
    v = f"CAST({q} AS DOUBLE)"
    finite = (
        f"{q} IS NOT NULL AND NOT isnan({v})"
        f" AND abs({v}) <> CAST('Infinity' AS DOUBLE)"
    )
    sharded = df.sparkSession.sql(
        f"""
        SELECT {q}, `{cnt}`,
               CASE WHEN {q} IS NULL THEN -2L
                    WHEN {v} = CAST('-Infinity' AS DOUBLE) THEN -1L
                    WHEN isnan({v}) THEN {n_shards + 1}L
                    WHEN {v} = CAST('Infinity' AS DOUBLE) THEN {n_shards}L
                    WHEN _vg_lo IS NULL OR _vg_hi <= _vg_lo THEN 0L
                    ELSE least({n_shards - 1}L, greatest(0L,
                         floor(({v} - _vg_lo)
                               / ((_vg_hi - _vg_lo) / {float(n_shards)}))))
               END AS _vg_shard
        FROM (SELECT *,
                     (SELECT min({v}) FROM {{g}} WHERE {finite}) AS _vg_lo,
                     (SELECT max({v}) FROM {{g}} WHERE {finite}) AS _vg_hi
              FROM {{g}})
        """,
        g=g,
    )
    res = sharded_running(sharded, "_vg_shard", [col], [cnt])
    return res.select(col, cnt, F.col(f"cum_{cnt}").alias(cum))


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

    Contract: ``sum_cols`` must be integral (the running sums are exact
    BIGINT arithmetic; a double/decimal column would be silently truncated
    by the casts) and the frame must not already contain the internal
    working names — both are checked eagerly so a bad caller errors instead
    of corrupting results.
    """
    integral = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(df.dtypes)
    for c in sum_cols:
        if dtypes.get(c, "").split("(")[0] not in integral:
            raise TypeError(
                f"sharded_running sum_cols must be integral (exact BIGINT "
                f"running sums); column {c!r} is {dtypes.get(c)!r} — "
                f"pre-scale to integer units (cents/nanos) first"
            )
    reserved = {"_shard", "_lrn", "_cnt", "_ocnt"}
    reserved.update(f"_{p}_{c}" for c in sum_cols for p in ("lc", "s", "o"))
    # output names must not collide with input columns either — the final
    # select would silently produce a duplicate-named frame
    reserved.add(rn)
    reserved.update(f"cum_{c}" for c in sum_cols)
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"sharded_running reserves internal/output column names "
            f"{sorted(clash)} — rename them in the input frame"
        )
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
