"""Temporal-join conformance queries over the events fixture.

As-of join and tolerance range join are the canonical time-series operators
a training-data/eventstream pipeline needs and Spark lacks natively
(operators/temporal.py implements them as shuffle-bounded compositions).
DuckDB's native ``ASOF JOIN`` is the oracle for the as-of path; the range
join's oracle is the quadratic formulation, tractable at oracle scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.temporal import asof_join, range_self_join
from map_reduce_engine_spark.queries.base import register, t


@register(
    "asof_purchase_last_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
           c.ts AS click_ts, c.value AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="as-of join: each purchase matched to the user's most recent prior click "
    "(union+window composition — one shuffle, no range explosion; oracle is "
    "DuckDB's native ASOF JOIN)",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # dedup clicks at identical (user_id, ts) so the as-of match is unique
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts", right_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


@register(
    "range_join_error_bursts",
    oracle="""
    SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800 * 1000000
    WHERE a.event_type = 'error' AND b.event_type = 'error'
    """,
    doc="range self-join: pairs of same-user error events within 30 min "
    "(tolerance-bucketed equi-join — never all-pairs; oracle is the quadratic form)",
)
def range_join_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "error")
    return range_self_join(
        ev, key_cols=["user_id"], id_col="event_id", time_col="ts", tolerance_sec=1800
    )


@register(
    "timeseries_interpolate",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, value FROM events WHERE user_id < 40
    ),
    bounds AS (
      SELECT user_id,
             date_trunc('hour', min(ts))::TIMESTAMP AS lo,
             date_trunc('hour', max(ts))::TIMESTAMP AS hi
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
      FROM bounds
    ),
    tagged AS (
      SELECT user_id, ts, value, 0 AS is_grid FROM ev
      UNION ALL
      SELECT user_id, ts, NULL, 1 FROM grid
    ),
    filled AS (
      SELECT user_id, ts, is_grid,
        last_value(value IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        first_value(value IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, is_grid
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
        first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, is_grid
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
      FROM tagged
    )
    SELECT user_id, ts,
           round(CASE
             WHEN prev_val IS NULL THEN next_val
             WHEN next_val IS NULL THEN prev_val
             WHEN prev_ts = next_ts THEN prev_val
             ELSE prev_val + (next_val - prev_val)
                  * date_diff('microsecond', prev_ts, ts)
                  / date_diff('microsecond', prev_ts, next_ts)
           END, 4) AS value_interp
    FROM filled WHERE is_grid = 1
    """,
    doc="time-series resample + linear interpolation: an hourly grid per "
    "user (F.sequence over the user's [first, last] hour — no recursion, "
    "no driver loop), unioned with raw events, then IGNORE NULLS window "
    "scans find the surrounding observations and interpolate by elapsed-"
    "microseconds fraction (timestampdiff — pure NTZ arithmetic, session-TZ-"
    "independent). Windows partition per user (bounded state). The "
    "gap-filling shape every timeseries engine ships as `interpolate()`; "
    "user_id < 40 bounds the fixture grid size",
)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 40).select(
        "user_id", "ts", "value"
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("ts"),
    )
    tagged = ev.withColumn("is_grid", F.lit(0)).unionByName(
        grid.withColumn("value", F.lit(None).cast("double")).withColumn(
            "is_grid", F.lit(1)
        )
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_ts = F.when(F.col("value").isNotNull(), F.col("ts"))
    filled = tagged.select(
        "user_id",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(back).alias("prev_val"),
        F.last(ev_ts, ignorenulls=True).over(back).alias("prev_ts"),
        F.first("value", ignorenulls=True).over(fwd).alias("next_val"),
        F.first(ev_ts, ignorenulls=True).over(fwd).alias("next_ts"),
    )
    # MICROSECOND diffs: timestamps are micro-precision, so the fraction is
    # exact and identical across engines (SECOND-level date_diff truncates
    # differently in Spark vs DuckDB)
    frac = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") / F.expr(
        "timestampdiff(MICROSECOND, prev_ts, next_ts)"
    )
    interp = (
        F.when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .when(F.col("prev_ts") == F.col("next_ts"), F.col("prev_val"))
        .otherwise(F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac)
    )
    return (
        filled.where(F.col("is_grid") == 1)
        .select("user_id", "ts", F.round(interp, 4).alias("value_interp"))
    )


@register(
    "time_weighted_value",
    oracle="""
    WITH seg AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    w AS (
      SELECT user_id,
             sum(value * date_diff('microsecond', ts, next_ts)) AS weighted,
             sum(date_diff('microsecond', ts, next_ts))::BIGINT AS total_us
      FROM seg WHERE next_ts IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, total_us, round(weighted / total_us, 4) AS twa_value
    FROM w
    """,
    doc="time-weighted average per user (the TimescaleDB time_weight shape, "
    "LOCF weighting): each observation holds until the next one, so its "
    "weight is its holding duration — the correct mean for irregularly "
    "sampled series where the arithmetic mean over-counts bursts. One "
    "lead() per user partition (bounded window state) + one aggregate; "
    "durations in MICROSECONDS so the fraction is exact on both engines "
    "(second-level diffs truncate differently). Single-event users carry "
    "no duration and drop out identically.",
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id", "value", "ts", F.lead("ts").over(w).alias("next_ts")
    ).where(F.col("next_ts").isNotNull())
    dur = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    agg = seg.groupBy("user_id").agg(
        F.sum(F.col("value") * dur).alias("weighted"),
        F.sum(dur).cast("bigint").alias("total_us"),
    )
    return agg.select(
        "user_id", "total_us", F.round(F.col("weighted") / F.col("total_us"), 4).alias("twa_value")
    )
