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
