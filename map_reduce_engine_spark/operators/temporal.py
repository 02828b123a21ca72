"""Temporal join operators Spark lacks natively: as-of join and
tolerance-bounded range self-join.

The reference has no joins at all (SURVEY.md §2 Part B: "UDF-expressible
only"); these are custom operators composed from existing DataFrame ops —
no Pandas UDF, no per-row Python — chosen for their 100 TB shape:

- ``asof_join``: the union+window formulation. One shuffle on the join key,
  one ordered window pass; cost is O(left+right), independent of how far
  back a match lies. The naive alternative (range join + argmax) explodes
  quadratically on hot keys.
- ``range_self_join``: bucket time into tolerance-width bins, probe own and
  next bin — every qualifying pair collides in at least one bin, so the
  candidate join is an equi-join on (key, bin) with fan-out bounded by data
  density per tolerance window, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: attach to each left row the ``right_cols`` of the
    matching right row — backward: greatest ``right_time <= left_time``;
    forward: least ``right_time >= left_time`` — within the same ``on`` keys.
    Unmatched left rows keep nulls (left-join semantics). ``tolerance``
    (an interval Column) voids matches farther than the tolerance.

    Implementation: union both sides tagged with a side marker, then one
    window pass per ``on`` key ordered by (time, side) taking the last
    non-null right payload — right rows order before left rows at equal
    times, so same-timestamp matches are included (ASOF-standard inclusive
    bound). Ties among right rows at identical (key, time) resolve to the
    last under ``right_cols`` struct ordering of the window sort — pre-dedup
    the right side if exact tie determinism matters.
    """
    rv = F.struct(F.col(right_time).alias("__rt"), *[F.col(c) for c in right_cols])
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        rv.alias("__rv"),
    )
    rv_type = r_tagged.schema["__rv"].dataType.simpleString()

    l_tagged = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    r_tagged = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left.columns],
        "__t",
        "__rv",
        F.lit(0).alias("__side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__rv", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance is not None:
        gap_ok = (
            (F.col("__t") <= F.col("__m.__rt") + tolerance)
            if direction == "backward"
            else (F.col("__m.__rt") <= F.col("__t") + tolerance)
        )
        matched = matched.withColumn("__m", F.when(gap_ok, F.col("__m")))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("__m.__rt").alias(f"asof_{right_time}")
    ] + [F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols]
    return matched.select(*out_cols)


def range_self_join(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    time_col: str,
    tolerance_sec: int,
) -> DataFrame:
    """All pairs (id1 < id2) sharing ``key_cols`` with
    ``|t1 - t2| <= tolerance_sec``: (key..., id1, id2, gap_sec).

    Returns (key..., id1, id2, gap_us) with the gap in exact microseconds.

    Bucket each row at ``floor(epoch / tolerance)``; the probe side also
    visits the next bucket. Any pair within tolerance lands in a common
    bucket (if t1 <= t2 and t2-t1 <= tol then bucket(t2) is bucket(t1) or
    bucket(t1)+1), so candidates come from an equi-join on (key, bucket),
    verified exactly and deduplicated. Epoch extraction for TIMESTAMP_NTZ is
    pure arithmetic against the epoch literal — independent of the session
    timezone (unix_timestamp on NTZ would shift across DST boundaries).
    """
    dt = dict(df.dtypes)[time_col]
    if dt == "timestamp_ntz":
        epoch_us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{time_col}`)"
        )
    elif dt.startswith("timestamp"):
        epoch_us = F.unix_micros(F.col(time_col))
    else:
        epoch_us = (F.col(time_col) * 1_000_000).cast("bigint")
    tol_us = tolerance_sec * 1_000_000
    base = df.select(
        *key_cols,
        F.col(id_col).alias("id"),
        epoch_us.alias("__e"),
        F.floor(epoch_us / tol_us).alias("__b"),
    )
    probe = base.withColumn("__b", F.explode(F.array(F.col("__b"), F.col("__b") + 1)))
    a, b = probe.alias("a"), base.alias("b")
    return (
        a.join(b, [*key_cols, "__b"])
        .where(F.col("a.id") < F.col("b.id"))
        .where(F.abs(F.col("a.__e") - F.col("b.__e")) <= tol_us)
        .select(
            *key_cols,
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.abs(F.col("a.__e") - F.col("b.__e")).alias("gap_us"),
        )
        .distinct()
    )
