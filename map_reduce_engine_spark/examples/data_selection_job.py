"""End-to-end pretraining data-selection report as one composable job.

The 14th example composition: raw documents in, a target-matched,
dedup-audited selection manifest out — every stage a shipped registry query
(this module only composes them and joins their outputs).

Stages:
  1. selection     — DSIR importance resampling: top-k documents whose
                     hashed-ngram profile best matches the target
                     distribution (``dsir_importance_weights``)
  2. dedup audit   — MinHash-LSH verified near-dup pairs restricted to the
                     selected set: redundancy INSIDE the selection wastes
                     the budget the importance weights just spent
  3. contamination — eval-split shingle overlap per selected document
                     (``contamination_check``)
  4. diversity     — per-source distinct-n ratios as the corpus-health
                     sidecar (``distinct_n_diversity``)
  5. write + gate  — one parquet per artifact and a single sign-off row

The returned gate row is the job's contract: the selection ships only if
within-selection near-dup pairs and contaminated picks are both under the
caller's bounds.

Run: ``python -m map_reduce_engine_spark data-selection <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_dup_pairs: int = 5,
    max_contaminated: int = 10,
) -> DataFrame:
    """Execute the report; returns the 1-row sign-off gate after writing
    the selection manifest and its audits."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    # the two heavy pipelines are each referenced by several writes AND the
    # gate counts below — freeze them once (the neardup_pipeline lesson:
    # every un-checkpointed reference re-executes the whole upstream DAG)
    selection = (
        REGISTRY["dsir_importance_weights"].fn(spark, sf_dir)
        .localCheckpoint(eager=True)  # top-k rows — tiny
    )
    pairs = REGISTRY["minhash_near_dup"].fn(spark, sf_dir).localCheckpoint(
        eager=True  # verified dup pairs — bounded by banding, not corpus
    )
    contamination = REGISTRY["contamination_check"].fn(spark, sf_dir)
    diversity = REGISTRY["distinct_n_diversity"].fn(spark, sf_dir)

    sel_ids = selection.select(F.col("doc_id"))
    # near-dup pairs with BOTH ends inside the selection — the redundancy
    # the budget actually pays for (two equi-joins against the tiny
    # selected-id set; the pair table itself is already candidate-bounded)
    within = (
        pairs.join(sel_ids.withColumnRenamed("doc_id", "id1"), "id1")
        .join(sel_ids.withColumnRenamed("doc_id", "id2"), "id2")
        .select("id1", "id2", "jaccard")
        .localCheckpoint(eager=True)  # written AND counted by the gate
    )
    contaminated_picks = selection.join(
        contamination.where(F.col("n_contaminated") > 0).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)

    write_parquet(selection, f"{out_dir}/selection")
    write_parquet(within, f"{out_dir}/within_selection_dups")
    write_parquet(contaminated_picks, f"{out_dir}/contaminated_picks")
    write_parquet(diversity, f"{out_dir}/diversity")

    gate = (
        selection.agg(F.count("*").cast("bigint").alias("n_selected"))
        .crossJoin(
            F.broadcast(
                within.agg(F.count("*").cast("bigint").alias("n_dup_pairs"))
            )
        )
        .crossJoin(
            F.broadcast(
                contaminated_picks.agg(
                    F.count("*").cast("bigint").alias("n_contaminated_picks")
                )
            )
        )
        .select(
            "n_selected",
            "n_dup_pairs",
            "n_contaminated_picks",
            (
                (F.col("n_dup_pairs") <= max_dup_pairs)
                & (F.col("n_contaminated_picks") <= max_contaminated)
            ).alias("selection_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
