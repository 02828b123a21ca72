"""End-to-end time-series health report as one composable job.

The time-series-diagnostics example composition (next to model_eval_job
and causal_audit_job): one revenue series in, the full "can I trust my
forecasting assumptions" dossier out — every stage a shipped registry
query.

Stages:
  1. trend        — Mann-Kendall significance + Huber robust slope (is
                    there a trend, and is it outlier-driven?)
  2. randomness   — Wald-Wolfowitz runs test + Ljung-Box portmanteau
                    (is there structure left?)
  3. structure    — binary-segmentation changepoint + STL-lite seasonal
                    decomposition (WHERE is the structure?)
  4. forecast     — Holt linear 7-day forecast off the frozen level/trend
  5. write        — one parquet per diagnostic + a single-row health gate

The returned gate row flags whether the naive "i.i.d. around a level"
assumption survives: no significant trend, no rejected randomness, and
no dominant changepoint — the checklist run before shipping any
constant-mean alerting threshold.

Run: ``python -m map_reduce_engine_spark timeseries-health <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_changepoint_share_bp: int = 5000,
) -> DataFrame:
    """Execute the report; returns the 1-row health gate after writing
    the per-diagnostic artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    mk = REGISTRY["mann_kendall_trend"].fn(spark, sf_dir)
    huber = REGISTRY["huber_robust_trend"].fn(spark, sf_dir)
    runs = REGISTRY["runs_test_randomness"].fn(spark, sf_dir)
    lb = REGISTRY["ljung_box_test"].fn(spark, sf_dir)
    cp = REGISTRY["changepoint_binary_segmentation"].fn(spark, sf_dir)
    seas = REGISTRY["seasonal_decompose_daily"].fn(spark, sf_dir)
    holt = REGISTRY["holt_linear_forecast"].fn(spark, sf_dir)

    write_parquet(mk, f"{out_dir}/mann_kendall")
    write_parquet(huber, f"{out_dir}/huber_trend")
    write_parquet(runs, f"{out_dir}/runs_test")
    write_parquet(lb, f"{out_dir}/ljung_box")
    write_parquet(cp, f"{out_dir}/changepoint")
    write_parquet(seas, f"{out_dir}/seasonal_decomposition")
    write_parquet(holt, f"{out_dir}/holt_forecast")

    gate = (
        mk.select(F.col("trend").alias("mk_trend"), F.col("z").alias("mk_z"))
        .crossJoin(F.broadcast(runs.select(F.col("nonrandom").alias("runs_nonrandom"))))
        .crossJoin(
            F.broadcast(lb.select(F.col("autocorrelated").alias("lb_autocorrelated")))
        )
        .crossJoin(
            F.broadcast(
                cp.select(
                    F.col("break_after_day").alias("cp_day"),
                    F.expr("(10000 * gain_unit) div tss_unit").alias(
                        "cp_explained_share_bp"
                    ),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                huber.select(
                    F.col("slope_millicents_per_day").alias("robust_slope_millicents"),
                    F.col("n_downweighted").alias("outlier_days"),
                )
            )
        )
        .select(
            "mk_trend",
            "mk_z",
            "runs_nonrandom",
            "lb_autocorrelated",
            "cp_day",
            "cp_explained_share_bp",
            "robust_slope_millicents",
            "outlier_days",
            (
                (F.col("mk_trend") == "none")
                & ~F.col("runs_nonrandom")
                & ~F.col("lb_autocorrelated")
                & (F.col("cp_explained_share_bp") <= F.lit(max_changepoint_share_bp))
            ).alias("iid_assumption_ok"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
