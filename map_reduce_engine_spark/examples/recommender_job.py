"""End-to-end item-to-item recommender job: train, evaluate, gate.

The fourth example composition (next to corpus_pipeline_job,
engagement_report_job, and training_mix_job): order history in, the two
artifacts a recommendation deploy needs out — every stage a shipped
registry query (this module only composes them).

Stages:
  1. recommend — per-customer top-5 co-purchase recommendations
                 (``copurchase_recommendations``: basket-capped pair
                 matrix, owned-part anti-join, window top-k)
  2. evaluate  — leave-one-out hit-rate@5 over the same probe audience
                 (``recommender_hitrate_loo``)
  3. gate      — a single-row deploy decision: the measured hit rate must
                 clear the caller's floor or the model does not ship

The returned gate row is the job's contract: ``deploy_approved`` is true
iff ``hitrate_ppm >= min_hitrate_ppm``.

Run: ``python -m map_reduce_engine_spark recommend <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_hitrate_ppm: int = 100_000,  # 10% hit-rate@5 deploy floor
) -> DataFrame:
    """Execute the job; returns the 1-row deploy gate after writing the
    recommendation list and the evaluation report."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    recs = REGISTRY["copurchase_recommendations"].fn(spark, sf_dir)
    eval_report = REGISTRY["recommender_hitrate_loo"].fn(spark, sf_dir)

    write_parquet(recs, f"{out_dir}/recommendations")
    write_parquet(eval_report, f"{out_dir}/evaluation")

    gate = eval_report.select(
        "n_eval_users",
        "n_hits",
        "hitrate_ppm",
        (F.col("hitrate_ppm") >= min_hitrate_ppm).alias("deploy_approved"),
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
