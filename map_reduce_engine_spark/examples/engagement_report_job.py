"""End-to-end user-engagement analytics as one composable job.

The corpus_pipeline_job example shows the training-data surface; this one
shows the event-analytics surface the same way: raw events in, a per-user
engagement profile plus a per-cohort business report out, every stage a
shipped operator/query shape (the module only composes them).

Stages (all single-shuffle shapes — see SCALE.md):
  1. streaks      — gaps-and-islands longest consecutive-day run per user
  2. bitmaps      — mergeable 64-day bit_or activity bitmaps + density
  3. burstiness   — inter-arrival timing signature (bot screening)
  4. conversion   — signup→purchase time-to-convert by signup cohort
  5. write        — per-user profile parquet + the cohort report

Run: ``python -m map_reduce_engine_spark engagement-report <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Execute the report; returns the per-user profile DataFrame after
    writing both outputs."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    profile_parts = {
        "streaks": REGISTRY["longest_activity_streak"].fn(spark, sf_dir),
        "bitmaps": REGISTRY["activity_bitmap_rollup"].fn(spark, sf_dir),
        "burstiness": REGISTRY["interarrival_burstiness"].fn(spark, sf_dir),
    }
    # per-user profile: one row per user joining the three signals; bitmap
    # epochs aggregate to totals first so the join stays 1:1 on user_id
    bm = (
        profile_parts["bitmaps"]
        .groupBy("user_id")
        .agg(
            F.sum("active_days").alias("active_days"),
            F.count("*").alias("n_epochs"),
        )
    )
    profile = (
        profile_parts["streaks"]
        .join(bm, "user_id", "full_outer")
        .join(profile_parts["burstiness"], "user_id", "full_outer")
    )
    cohorts = REGISTRY["time_to_convert_cohorts"].fn(spark, sf_dir)

    write_parquet(profile, f"{out_dir}/user_profile")
    write_parquet(cohorts, f"{out_dir}/conversion_cohorts")
    return profile
