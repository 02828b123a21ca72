"""End-to-end retrieval-evaluation report as one composable job.

The 15th example composition: the corpus's retrieval stack — lexical
(BM25 + Dirichlet query likelihood), dense (exact-cosine probes), and
feedback (Rocchio) — evaluated side by side, every stage a shipped
registry query (this module only composes them and joins their outputs).

Stages:
  1. lexical rankers    — BM25 top-20 (``bm25_doc_scores``) and
                          Dirichlet query-likelihood top-20
                          (``query_likelihood_dirichlet``) for the same
                          fixed query terms
  2. ranker agreement   — overlap@20 and total rank displacement between
                          the two lexical rankings (two retrieval models
                          that disagree wildly flag a degenerate corpus
                          or a broken tokenizer)
  3. dense eval         — nDCG@10 (``ndcg_retrieval_eval``) and MRR@10
                          (``mrr_retrieval_eval``) of exact-cosine probe
                          retrieval with label relevance
  4. feedback lift      — positives in the Rocchio re-ranked top-10
                          (``rocchio_feedback_rerank``) minus positives
                          in the initial top-10: did feedback help?
  5. write + gate       — one parquet per artifact and a single sign-off
                          row

Run: ``python -m map_reduce_engine_spark retrieval-eval <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_mean_ndcg_ppm: int = 0,
    min_common_at20: int = 1,
) -> DataFrame:
    """Execute the report; returns the 1-row sign-off gate after writing
    the per-stage artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY
    from map_reduce_engine_spark.session import load_tables

    # every output below is both written AND aggregated into the gate —
    # freeze each once (all are <= a few dozen rows by construction)
    bm25 = REGISTRY["bm25_doc_scores"].fn(spark, sf_dir).localCheckpoint(
        eager=True
    )
    ql = REGISTRY["query_likelihood_dirichlet"].fn(spark, sf_dir).localCheckpoint(
        eager=True
    )
    ndcg = REGISTRY["ndcg_retrieval_eval"].fn(spark, sf_dir).localCheckpoint(
        eager=True
    )
    mrr = REGISTRY["mrr_retrieval_eval"].fn(spark, sf_dir).localCheckpoint(
        eager=True
    )
    rocchio = REGISTRY["rocchio_feedback_rerank"].fn(spark, sf_dir).localCheckpoint(
        eager=True
    )

    # ranker agreement: docs in BOTH lexical top-20s, with how far the two
    # models displace each rank (equi-join of two 20-row frames)
    b_rank = bm25.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .cast("bigint")
        .alias("bm25_rank"),
    )
    q_rank = ql.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("loglik"), "doc_id"))
        .cast("bigint")
        .alias("ql_rank"),
    )
    agreement = (
        b_rank.join(q_rank, "doc_id")
        .select(
            "doc_id",
            "bm25_rank",
            "ql_rank",
            F.abs(F.col("bm25_rank") - F.col("ql_rank"))
            .cast("bigint")
            .alias("displacement"),
        )
        .localCheckpoint(eager=True)
    )

    # feedback lift: label-relevant count in the re-ranked top-10 vs the
    # initial top-10 (rocchio's n_pos column records the initial count)
    emb = load_tables(spark, sf_dir)["embeddings"]
    labels = emb.select("vec_id", "label")
    lift = (
        rocchio.join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
            ),
            "query_id",
        )
        .groupBy("query_id")
        .agg(
            F.sum((F.col("nlabel") == F.col("qlabel")).cast("int"))
            .cast("bigint")
            .alias("n_pos_rerank"),
            F.min("n_pos").cast("bigint").alias("n_pos_initial"),
        )
        .select(
            "query_id",
            "n_pos_initial",
            "n_pos_rerank",
            (F.col("n_pos_rerank") - F.col("n_pos_initial"))
            .cast("bigint")
            .alias("pos_lift"),
        )
        .localCheckpoint(eager=True)
    )

    write_parquet(bm25, f"{out_dir}/bm25_top20")
    write_parquet(ql, f"{out_dir}/query_likelihood_top20")
    write_parquet(agreement, f"{out_dir}/lexical_agreement")
    write_parquet(ndcg, f"{out_dir}/ndcg")
    write_parquet(mrr, f"{out_dir}/mrr")
    write_parquet(rocchio, f"{out_dir}/rocchio_rerank")
    write_parquet(lift, f"{out_dir}/feedback_lift")

    # mean_ndcg_ppm follows the CONVENTIONAL mean-over-evaluable-queries: a
    # probe with NULL ndcg_ppm (zero corpus-relevant docs) is excluded from
    # the denominator rather than coalesced to 0 — zeros-included silently
    # deflated the gate metric relative to the per-query ndcg artifact
    # (ADVICE r06). n_evaluable_queries exposes the denominator so the gate
    # row reconciles against the artifact exactly.
    gate = (
        ndcg.agg(
            F.count("*").cast("bigint").alias("n_probe_queries"),
            F.count("ndcg_ppm").cast("bigint").alias("n_evaluable_queries"),
            F.expr(
                "CAST(CASE WHEN count(ndcg_ppm) = 0 THEN 0 "
                "ELSE sum(ndcg_ppm) div count(ndcg_ppm) END AS BIGINT)"
            ).alias("mean_ndcg_ppm"),
        )
        .crossJoin(F.broadcast(mrr.select("mrr_ppm", "n_with_relevant")))
        .crossJoin(
            F.broadcast(
                agreement.agg(
                    F.count("*").cast("bigint").alias("lexical_common_at20"),
                    F.coalesce(F.sum("displacement"), F.lit(0))
                    .cast("bigint")
                    .alias("lexical_displacement"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                lift.agg(
                    # coalesced like lexical_displacement: an empty lift
                    # frame must gate as 0, not NULL (ADVICE r06)
                    F.coalesce(F.sum("pos_lift"), F.lit(0))
                    .cast("bigint")
                    .alias("feedback_pos_lift")
                )
            )
        )
        .select(
            "n_probe_queries",
            "n_evaluable_queries",
            "mean_ndcg_ppm",
            "mrr_ppm",
            "n_with_relevant",
            "lexical_common_at20",
            "lexical_displacement",
            "feedback_pos_lift",
            (
                (F.col("mean_ndcg_ppm") >= min_mean_ndcg_ppm)
                & (F.col("lexical_common_at20") >= min_common_at20)
            ).alias("retrieval_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
