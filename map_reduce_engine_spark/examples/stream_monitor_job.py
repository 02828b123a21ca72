"""End-to-end streaming operations monitor as one composable job.

The streaming surface as a product verb (next to group_comparison_job and
timeseries_health_job): drain the four bounded-state streaming monitors
over the events source and compose one ops gate — every stage a shipped
streaming operator with a registry twin.

Stages:
  1. sla      — streaming_error_rate_sla: watermarked 30-min windows with
                breach flags (is the error rate inside the SLA?)
  2. drift    — streaming_cusum_monitor: per-user two-sided CUSUM on
                purchase cents (has any user's spend level shifted?)
  3. reach    — streaming_kmv_distinct: per-event-type distinct users via
                bounded KMV state (how many users does each surface touch?)
  4. hotkeys  — streaming_mg_heavy_hitters: sharded Misra-Gries counters
                (which synthetic keys dominate the stream?)
  5. write    — one parquet per monitor + a single-row ops gate

Every monitor holds O(k) state per key (CUSUM: 3 BIGINTs; KMV: 64 hashes;
MG: 16 counters/shard; SLA: windowed partial counts bounded by the
watermark) — the whole dashboard runs against an unbounded source without
unbounded state, which is the point of the composition.

Run: ``python -m map_reduce_engine_spark stream-monitor <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    cusum_alarm_cents: int = 100_000,
) -> DataFrame:
    """Execute the monitor; returns the 1-row ops gate after writing the
    per-monitor artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    sla = REGISTRY["streaming_error_rate_sla"].fn(spark, sf_dir)
    cusum = REGISTRY["streaming_cusum_monitor"].fn(spark, sf_dir)
    kmv = REGISTRY["streaming_kmv_distinct_users"].fn(spark, sf_dir)
    mg = REGISTRY["streaming_mg_heavy_hitters"].fn(spark, sf_dir)

    write_parquet(sla, f"{out_dir}/error_rate_sla")
    write_parquet(cusum, f"{out_dir}/cusum_drift")
    write_parquet(kmv, f"{out_dir}/kmv_distinct")
    write_parquet(mg, f"{out_dir}/mg_heavy_hitters")

    sla_flag = sla.agg(
        F.count("*").cast("bigint").alias("n_sla_windows"),
        F.coalesce(F.sum(F.col("sla_breach").cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_sla_breaches"),
    )
    cusum_flag = cusum.agg(
        F.count("*").cast("bigint").alias("n_monitored_users"),
        F.coalesce(
            F.sum(
                (
                    (F.col("s_plus_cents") > cusum_alarm_cents)
                    | (F.col("s_minus_cents") > cusum_alarm_cents)
                ).cast("int")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_drift_alarms"),
    )
    kmv_flag = kmv.agg(
        F.count("*").cast("bigint").alias("n_event_types"),
        F.max("est_milli").cast("bigint").alias("max_reach_milli"),
    )
    mg_flag = mg.agg(
        F.coalesce(F.sum((~F.col("in_stream_candidates")).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_mg_guarantee_misses"),
    )
    gate = (
        sla_flag.crossJoin(F.broadcast(cusum_flag))
        .crossJoin(F.broadcast(kmv_flag))
        .crossJoin(F.broadcast(mg_flag))
        .select(
            "n_sla_windows",
            "n_sla_breaches",
            "n_monitored_users",
            "n_drift_alarms",
            "n_event_types",
            "max_reach_milli",
            "n_mg_guarantee_misses",
            (
                (F.col("n_sla_breaches") == 0)
                & (F.col("n_drift_alarms") == 0)
                & (F.col("n_mg_guarantee_misses") == 0)
            ).alias("stream_healthy"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
