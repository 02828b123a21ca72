"""ANN serving as one composable, gated job — the product surface of the
persisted IVF index (the composition VERDICT r09 #4 asked for, giving the
ANN tier the same daily-operated story the tile/band indexes got from
``incremental-ingest``).

Stages (queries = vec_id < 5 — the registry's probe convention; batch =
the next ``batch_size`` ids — today's appended embeddings; history = the
rest — yesterday's corpus):

  1. build + persist — the history trains ONCE (``ivf_train_assign``,
                       cell count from the grow-with-corpus sizing rule)
                       and persists as a cell-bucketed parquet table plus
                       centroid companion (``write_ivf_index``)
  2. roll forward    — today's batch is absorbed into the STORED index
                       with NO retrain (``ivf_roll_forward``: batch-only
                       assignment against the stored centroids, left-anti
                       re-run guard) and persisted as tomorrow's table
  3. staleness check — ``ivf_staleness`` runs its two sizing-rule
                       triggers (capacity: corpus outgrew the trained
                       cell count; skew: drift piled vectors into few
                       cells); the verdict rides the gate row — a
                       deployment retrains when ``retrain_due`` flips
  4. serve           — queries probe the ROLLED index
                       (``ivf_topk(index=...)`` — no corpus, no retrain)
  5. recall report   — the served top-k is scored against exact
                       brute-force cosine kNN over the full corpus
                       (integer permille per query — the in-engine recall
                       measurement, same discipline as
                       ``blocking_recall_report``)
  6. gate            — one sign-off row: the indexed count reconciles
                       exactly (history + batch), mean recall clears the
                       caller's floor, empty inputs are an explicit
                       reject (the tokenizer-bakeoff NULL-gate lesson)

Run: ``python -m map_reduce_engine_spark ann-serve <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    k: int = 10,
    n_probe: int = 4,
    batch_size: int = 50,
    min_recall_permille: int = 500,
    index_table: str = "mre_ivf_index",
) -> DataFrame:
    """Execute the serve; returns the 1-row sign-off gate after writing
    the persisted + rolled index tables, the served top-k, and the
    per-query recall report."""
    from map_reduce_engine_spark.io import read_table, write_parquet
    from map_reduce_engine_spark.operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    batch = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 5 + batch_size))
    history = emb.where(F.col("vec_id") >= 5 + batch_size)

    # 1. train on the history ONCE and persist (cell count from the
    # sizing rule so per-cell population stays bounded at any corpus size)
    centers, cb = sim.ivf_train_assign(
        history, "vec_id", "embedding", n_cells=None
    )
    sim.write_ivf_index(centers, cb, index_table, path=f"{out_dir}/ivf_index")
    stored = sim.read_ivf_index(spark, index_table)

    # 2. roll today's batch into the STORED index — no retrain, the
    # history is never re-read — and persist tomorrow's table
    rolled = sim.ivf_roll_forward(stored, batch, "vec_id", "embedding")
    sim.write_ivf_index(
        rolled[0], rolled[1], f"{index_table}_next", path=f"{out_dir}/ivf_index_next"
    )
    served_index = sim.read_ivf_index(spark, f"{index_table}_next")

    # 3. staleness diagnostic (one |cells|-sized aggregate) — the retrain
    # trigger rides the gate row
    stale = sim.ivf_staleness(served_index)

    # 4. serve the queries against the rolled, persisted index
    topk = sim.ivf_topk(
        None, queries, "vec_id", "embedding", k=k, n_probe=n_probe,
        index=served_index,
    ).localCheckpoint(eager=True)  # written AND recall-joined AND counted

    # 5. recall vs exact brute-force cosine over the SAME corpus the
    # index holds (history + batch; queries are held out of the index)
    corpus = history.unionByName(batch)
    exact = sim.cosine_topk(corpus, queries, "vec_id", "embedding", k=k).select(
        "query_id", "neighbor_id"
    )
    recall = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(
            topk.join(exact, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.lit(1000) * F.coalesce("n_hits", F.lit(0)))
            .cast("bigint")
            .alias("_m"),
        )
        .select(
            "query_id",
            "n_hits",
            F.expr(f"_m div {int(k)}").alias("recall_permille"),
        )
        .localCheckpoint(eager=True)  # written AND aggregated by the gate
    )

    write_parquet(topk, f"{out_dir}/served_topk")
    write_parquet(recall, f"{out_dir}/recall_report")

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias(name))

    gate = (
        n(history, "n_history")
        .crossJoin(F.broadcast(n(batch, "n_batch")))
        .crossJoin(F.broadcast(n(spark.table(index_table), "n_indexed_before")))
        .crossJoin(
            F.broadcast(n(spark.table(f"{index_table}_next"), "n_indexed_after"))
        )
        .crossJoin(F.broadcast(n(queries, "n_queries")))
        .crossJoin(
            F.broadcast(
                recall.agg(
                    F.coalesce(F.sum("n_hits"), F.lit(0))
                    .cast("bigint")
                    .alias("total_hits")
                )
            )
        )
        .select(
            "n_history",
            "n_batch",
            "n_indexed_before",
            "n_indexed_after",
            "n_queries",
            F.expr(f"(1000 * total_hits) div greatest(n_queries * {int(k)}, 1)").alias(
                "mean_recall_permille"
            ),
            F.lit(stale["n_cells"]).cast("bigint").alias("n_cells"),
            F.lit(stale["max_cell_pop"]).cast("bigint").alias("max_cell_pop"),
            F.lit(stale["cells_needed"]).cast("bigint").alias("cells_needed"),
            F.lit(bool(stale["retrain_due"])).alias("retrain_due"),
            F.coalesce(
                (F.col("n_queries") > 0)
                & (F.col("n_history") > 0)
                # mergeable-state reconciliation: the rolled table holds
                # exactly yesterday's index plus today's batch
                & (F.col("n_indexed_after") == F.col("n_indexed_before") + F.col("n_batch"))
                & (
                    F.expr(
                        f"(1000 * total_hits) div greatest(n_queries * {int(k)}, 1)"
                    )
                    >= F.lit(int(min_recall_permille))
                ),
                F.lit(False),
            ).alias("serve_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
