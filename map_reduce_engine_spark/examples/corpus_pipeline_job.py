"""End-to-end training-corpus preparation as one composable job.

The reference ships two example jobs (wordcount/wordlength); this is the
example for the engine's north-star extension surface: a corpus goes in,
a deduplicated, quality-filtered, split, augmentation-ready corpus comes
out, with an audit row per stage. Every stage is a shipped operator —
this module only composes them, which is the point: a production pipeline
is configuration over the operator library, not new code.

Stages (all declarative, all scale-shaped — see SCALE.md):
  1. quality gate   — heuristic scores, keep score >= threshold
  2. exact dedup    — normalized-text fingerprint, min-id survivor
  3. near dedup     — MinHash-LSH candidates + exact-Jaccard verify,
                      connected components, min-id survivor per cluster
  3b. substring tier — exact-substring rewrite (Lee et al. ACL'22): every
                      non-canonical occurrence of a duplicated >= k-token
                      run excised from the text (span-level, so one shared
                      license block no longer drags whole documents out);
                      audit row is in TOKEN units
  4. split          — deterministic key-modulus train/val/test
  5. write          — parquet partitioned by split

Run: ``python -m map_reduce_engine_spark corpus-pipeline <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.85,
    substring_k: int = 50,
) -> DataFrame:
    """Execute the pipeline; returns the per-stage audit DataFrame
    (stage, rows_in, rows_out) after writing the final corpus."""
    from map_reduce_engine_spark.io import read_table, write_parquet
    from map_reduce_engine_spark.operators import dedup as dd
    from map_reduce_engine_spark.operators.graph import connected_components
    from map_reduce_engine_spark.operators.text import quality_score

    docs = read_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    n0 = docs.count()

    # 1. quality gate (pure column expressions, one scan)
    scored = quality_score(docs, "doc_id", "text")
    kept_ids = scored.where(F.col("quality") >= min_quality).select("doc_id")
    q = docs.join(kept_ids, "doc_id", "left_semi")
    n1 = q.count()

    # 2. exact dedup (normalized fingerprint, deterministic survivor)
    e = dd.dedup_exact(q, subset=["text"], order_by=["doc_id"])
    n2 = e.count()

    # 3. near dedup: LSH candidates -> exact Jaccard -> components ->
    #    keep each cluster's min-id member
    sigs = dd.minhash_signatures(e, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    pairs = dd.jaccard_pairs(
        e, "doc_id", "text", min_jaccard=jaccard_threshold, candidates=cands
    )
    cc = connected_components(pairs.select("id1", "id2"))
    drop = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    nd = e.join(drop, "doc_id", "left_anti").localCheckpoint(eager=True)
    n3 = nd.count()

    # 3b. exact-substring rewrite: duplicated >= k-token runs excised from
    # every non-canonical holder (the canonical = min-doc_id copy survives
    # verbatim). Token-unit stage: document count is unchanged unless a
    # document was NOTHING but duplicated spans (then it empties and drops
    # like the input blank filter).
    rw = dd.substring_dedup_rewrite(nd, "doc_id", "text", k=substring_k)
    tok = rw.agg(
        F.sum("n_tokens").cast("bigint").alias("t_in"),
        (F.sum("n_tokens") - F.sum("removed_tokens")).cast("bigint").alias("t_out"),
    ).collect()[0]
    nd2 = (
        nd.drop("text")
        .join(
            rw.where(F.col("text") != "").select(
                F.col("id").alias("doc_id"), "text"
            ),
            "doc_id",
        )
        .localCheckpoint(eager=True)
    )
    n3b = nd2.count()

    # 4. deterministic split (key modulus — stable under re-runs/partitioning)
    final = nd2.withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train")
        .when(F.col("doc_id") % 10 == 8, "val")
        .otherwise("test"),
    )

    # 5. write partitioned by split
    write_parquet(final, out_dir, partition_by=["split"])

    return spark.createDataFrame(
        [
            ("0_input", n0, n0),
            ("1_quality_gate", n0, n1),
            ("2_exact_dedup", n1, n2),
            ("3_near_dedup", n2, n3),
            ("3b_substring_rewrite_tokens", int(tok.t_in), int(tok.t_out)),
            ("3b_substring_rewrite_docs", n3, n3b),
            ("4_split_write", n3b, n3b),
        ],
        "stage string, rows_in bigint, rows_out bigint",
    )
