"""End-to-end training-mix governance report as one composable job.

The third example composition (next to corpus_pipeline_job and
engagement_report_job): raw documents in, the decision artifacts a
pretraining-mix owner signs off on out — every stage a shipped registry
query (this module only composes them).

Stages:
  1. mixture   — per-language temperature-scaled sampling weights
                 (alpha = 0.3) next to raw shares
  2. budget    — per-language greedy token-budget selection by lexical
                 diversity
  3. split     — cluster-safe train/val/test assignment with the
                 leakage audit (n_leaks must be 0)
  4. drift     — token-distribution JS divergence between the splits
  5. write     — one parquet per artifact + a single-row sign-off gate

The returned gate row is the job's contract: ``split_leaks = 0`` and the
JS divergence under the caller's bound, or the mix does not ship.

Run: ``python -m map_reduce_engine_spark training-mix <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_js_nano: int = 100_000_000,  # 0.1 nat — generous split-drift bound
) -> DataFrame:
    """Execute the report; returns the 1-row sign-off gate after writing
    the per-language artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    weights = REGISTRY["temperature_mixture_weights"].fn(spark, sf_dir)
    budget = REGISTRY["token_budget_select"].fn(spark, sf_dir)
    splits = REGISTRY["split_leakage_guard"].fn(spark, sf_dir)
    drift = REGISTRY["token_js_divergence"].fn(spark, sf_dir)

    # per-language mix sheet: sampling weight next to the budget cut
    mix_sheet = weights.join(budget, "lang", "full_outer")
    write_parquet(mix_sheet, f"{out_dir}/mix_sheet")
    write_parquet(splits, f"{out_dir}/split_audit")
    write_parquet(drift, f"{out_dir}/split_drift")

    gate = (
        splits.agg(F.max("n_leaks").alias("split_leaks"))
        .crossJoin(F.broadcast(drift.select("js_nano")))
        .select(
            "split_leaks",
            "js_nano",
            (
                (F.col("split_leaks") == 0) & (F.col("js_nano") <= max_js_nano)
            ).alias("mix_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
