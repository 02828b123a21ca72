"""End-to-end model-evaluation report as one composable job.

The ML-evaluation-tier example composition (next to feature_screen_job):
a trained in-engine classifier in, the full pre-deployment evaluation
dossier out — every stage a shipped registry query (this module only
composes them).

Stages:
  1. train       — logistic regression via nano-frozen Newton rounds
                   (the model under evaluation)
  2. ranking     — exact average precision + cumulative-gains deciles of
                   the underlying score (threshold-free quality)
  3. calibration — reliability bins + Brier score (is the score a
                   probability?)
  4. fairness    — demographic-parity / equalized-odds audit by brand,
                   with BH-FDR control over the 25 simultaneous brand
                   tests (which gaps are real?)
  5. write       — one parquet per artifact + a single-row sign-off gate

The returned gate row is the job's contract: the model must beat the
majority class, the worst reliability-bin gap must stay inside the
caller's bound, and the fairness audit reports its worst selection-rate
gap alongside how many brands survive FDR — the numbers a review board
actually reads.

Run: ``python -m map_reduce_engine_spark model-eval <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_calib_gap_ppm: int = 300_000,
) -> DataFrame:
    """Execute the evaluation; returns the 1-row sign-off gate after
    writing the per-stage artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    model = REGISTRY["logistic_regression_newton"].fn(spark, sf_dir)
    ap = REGISTRY["average_precision_eval"].fn(spark, sf_dir)
    gains = REGISTRY["cumulative_gains_deciles"].fn(spark, sf_dir)
    calib = REGISTRY["calibration_brier"].fn(spark, sf_dir)
    fairness = REGISTRY["fairness_parity_audit"].fn(spark, sf_dir)
    fdr = REGISTRY["benjamini_hochberg_brands"].fn(spark, sf_dir)

    write_parquet(model, f"{out_dir}/model")
    write_parquet(ap, f"{out_dir}/average_precision")
    write_parquet(gains, f"{out_dir}/gains_deciles")
    write_parquet(calib, f"{out_dir}/calibration")
    write_parquet(fairness, f"{out_dir}/fairness_audit")
    write_parquet(fdr, f"{out_dir}/fdr_brand_tests")

    worst_calib = calib.agg(
        F.max(F.abs(F.col("gap_ppm"))).alias("max_calib_gap_ppm"),
        F.any_value("brier_ppm").alias("brier_ppm"),
    )
    worst_fair = fairness.agg(
        F.max(F.abs(F.col("sel_gap_ppm"))).alias("max_sel_gap_ppm"),
        F.max(F.abs(F.col("tpr_gap_ppm"))).alias("max_tpr_gap_ppm"),
    )
    n_flagged = fdr.agg(
        F.sum(F.when(F.col("rejected"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_brands_flagged_fdr")
    )
    gate = (
        model.select("accuracy_bp", "b1_nano", "b2_nano")
        .crossJoin(F.broadcast(ap.select("ap_ppm", "prevalence_ppm")))
        .crossJoin(F.broadcast(worst_calib))
        .crossJoin(F.broadcast(worst_fair))
        .crossJoin(F.broadcast(n_flagged))
        .select(
            "accuracy_bp",
            "ap_ppm",
            "prevalence_ppm",
            "brier_ppm",
            "max_calib_gap_ppm",
            "max_sel_gap_ppm",
            "max_tpr_gap_ppm",
            "n_brands_flagged_fdr",
            (
                (F.col("accuracy_bp") >= 5000)
                & (F.col("max_calib_gap_ppm") <= F.lit(max_calib_gap_ppm))
            ).alias("ship_ok"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
