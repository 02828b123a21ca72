"""End-to-end causal-audit report as one composable job.

The causal-inference-tier example composition (next to model_eval_job):
one treatment question — "does discounting move outcomes?" — answered by
every estimator the engine ships, side by side, because the DIFFERENCES
between estimators are the diagnostic (naive vs adjusted gap = measured
confounding; IPW vs stratified gap = propensity-model sensitivity;
mediation splits the pathway). Every stage is a shipped registry query.

Stages:
  1. did        — difference-in-differences promo estimator
  2. adjusted   — propensity-stratified ATE + IPW/stratified/naive trio
  3. rd         — regression discontinuity at the quantity threshold
  4. pathways   — mediation (Sobel) through quantity; Oaxaca-Blinder
                  group-gap decomposition
  5. write      — one parquet per estimator + a single-row summary

The returned summary row carries each estimator's headline number and a
`confounding_detected` flag (naive vs stratified disagree beyond the
caller's tolerance) — the first question a reviewer asks of any
observational claim.

Run: ``python -m map_reduce_engine_spark causal-audit <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    confounding_tol_ppm: int = 2_000,
) -> DataFrame:
    """Execute the audit; returns the 1-row summary after writing the
    per-estimator artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    did = REGISTRY["promo_effect_did"].fn(spark, sf_dir)
    strata = REGISTRY["propensity_strata_ate"].fn(spark, sf_dir)
    trio = REGISTRY["ipw_ate_estimators"].fn(spark, sf_dir)
    rd = REGISTRY["regression_discontinuity"].fn(spark, sf_dir)
    mediation = REGISTRY["mediation_sobel"].fn(spark, sf_dir)
    oaxaca = REGISTRY["oaxaca_blinder_gap"].fn(spark, sf_dir)

    write_parquet(did, f"{out_dir}/did")
    write_parquet(strata, f"{out_dir}/stratified_ate")
    write_parquet(trio, f"{out_dir}/estimator_trio")
    write_parquet(rd, f"{out_dir}/regression_discontinuity")
    write_parquet(mediation, f"{out_dir}/mediation")
    write_parquet(oaxaca, f"{out_dir}/oaxaca_gap")

    summary = (
        trio.select("n_total", "ate_ipw_ppm", "ate_strat_ppm", "naive_diff_ppm")
        .crossJoin(F.broadcast(rd.select("jump_ppm")))
        .crossJoin(F.broadcast(mediation.select("indirect_ppm", "sobel_z")))
        .select(
            "n_total",
            "naive_diff_ppm",
            "ate_strat_ppm",
            "ate_ipw_ppm",
            F.col("jump_ppm").alias("rd_jump_ppm"),
            F.col("indirect_ppm").alias("mediated_ppm"),
            "sobel_z",
            (
                F.abs(F.col("naive_diff_ppm") - F.col("ate_strat_ppm"))
                > F.lit(confounding_tol_ppm)
            ).alias("confounding_detected"),
        )
    )
    write_parquet(summary, f"{out_dir}/summary")
    return summary
