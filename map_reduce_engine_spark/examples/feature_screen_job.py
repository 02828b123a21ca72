"""End-to-end feature-screening report as one composable job.

The ML-tier example composition (next to training_mix_job and
recommender_job): fact tables in, the artifacts a feature-engineering
owner reviews before training a real model out — every stage a shipped
registry query (this module only composes them).

Stages:
  1. stump      — best single-threshold split of l_quantity for
                  predicting returns (1R baseline + Gini)
  2. auc        — the threshold-free Mann-Whitney screen of the same
                  feature (exact AUC ppm + tie-corrected z)
  3. dependence — mutual information between event_type and hour
                  (categorical-feature redundancy check)
  4. regression — closed-form 2-feature model of order value (the
                  do-features-explain-the-target sanity fit)
  5. write      — one parquet per artifact + a single-row sign-off gate

The returned gate row is the job's contract: the stump must beat the
majority-class baseline, AND the AUC screen must agree the feature
carries signal (|AUC - 0.5| above the caller's floor), or the feature
set does not graduate.

Run: ``python -m map_reduce_engine_spark feature-screen <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_auc_edge_ppm: int = 5_000,  # |AUC - 0.5| >= 0.5pp to call it signal
) -> DataFrame:
    """Execute the report; returns the 1-row sign-off gate after writing
    the per-screen artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    stump = REGISTRY["decision_stump_returnflag"].fn(spark, sf_dir)
    auc = REGISTRY["roc_auc_mann_whitney"].fn(spark, sf_dir)
    dependence = REGISTRY["feature_mutual_information"].fn(spark, sf_dir)
    regression = REGISTRY["multiple_regression_order_value"].fn(spark, sf_dir)

    write_parquet(stump, f"{out_dir}/stump")
    write_parquet(auc, f"{out_dir}/auc_screen")
    write_parquet(dependence, f"{out_dir}/dependence")
    write_parquet(regression, f"{out_dir}/regression_fit")

    gate = (
        stump.select("accuracy_bp", "baseline_bp")
        .crossJoin(F.broadcast(auc.select("auc_ppm")))
        .select(
            "accuracy_bp",
            "baseline_bp",
            "auc_ppm",
            (
                (F.col("accuracy_bp") >= F.col("baseline_bp"))
                & (
                    F.abs(F.col("auc_ppm") - F.lit(500_000))
                    >= F.lit(min_auc_edge_ppm)
                )
            ).alias("feature_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
