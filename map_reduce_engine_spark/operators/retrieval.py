"""Retrieval scoring and broadcast model inference.

Two capability classes a training-data pipeline bolts onto the corpus the
reference covers with generic map/reduce jobs (SURVEY.md §2 Part C):

- **BM25 keyword retrieval** (``bm25_scores``): the standard Okapi BM25
  ranking function over an inverted-index-shaped plan. The query-term set is
  tiny (broadcast); corpus-side work is two hash aggregates (document
  lengths, per-(doc, term) tf restricted to the query terms BEFORE the
  aggregate) — the shape that stays linear at 100 TB.
- **Hashing-trick linear model inference** (``hashed_linear_score``): a
  logistic-regression quality filter applied with the weight vector as a
  broadcast table — the deployment shape of a fastText/CCNet-style quality
  classifier. Featurization (token → bucket) is the engine-portable
  md5-prefix hash, so inference is pure JVM column math: no model file
  shipped to executors, no Python in the hot path.

Both emit deterministic, DuckDB-recomputable outputs (the portable hash +
fixed affine pseudo-weights), so the driver oracle hash-checks them end to
end like every other query in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.dedup import portable_base31
from map_reduce_engine_spark.operators.text import tokens_col

_MASK31 = (1 << 31) - 1

# Fixed affine constants for the pseudo-trained weight vector (Knuth
# multiplicative constants, same family as operators.dedup.minhash_family).
# A real deployment loads learned weights from a table; the affine derivation
# keeps the demo deterministic and oracle-recomputable without a model file.
WEIGHT_A = (2654435761 * 11) & _MASK31 | 1
WEIGHT_B = (2246822519 * 13 + 40503) & _MASK31


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k documents by Okapi BM25 against a fixed query-term set.

    Plan shape (the one you'd want at 100 TB):

    - ``dl``: one hash aggregate over the token stream → per-doc length;
      corpus totals (N, avgdl) ride along via a broadcast crossJoin, so the
      scalar never becomes a driver-side collect.
    - ``tf``: the explode is filtered to the query terms BEFORE the
      aggregate — corpus-size work shrinks to matching postings at the scan,
      exactly an inverted-index probe.
    - ``dft`` (document frequency) rides along as a window count over the
      token-partitioned ``tf`` table — |query| distinct keys, no second
      pass over the corpus.
    - Final ranking is ``orderBy → limit`` = TakeOrderedAndProject (per
      partition top-k, then a k-sized merge on the driver — no global sort).

    idf uses the +1 variant ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive, Lucene's choice). Ties broken by ``id_col`` so output order is
    deterministic across engines.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    # dl feeds BOTH the corpus stats and the score join — Spark does not
    # share common subplans across those subtrees, so without
    # materialization each pair re-scans and re-tokenizes the corpus
    # (4 scans total in the round-10 plan). localCheckpoint the ONE
    # doc-sized intermediate both need: the corpus is tokenized exactly
    # TWICE (once into dl here, once into tf below) behind a single eager
    # barrier — round 11 checkpointed tf as well, and the second blocking
    # job cost more than the scan it saved at bench scale (VERDICT r11 §
    # "What's wrong" #1). tf stays lazy: its one consumer chain gets dft
    # from a window over the SAME tf subtree (below), so laziness no
    # longer duplicates the tokenization.
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl")).localCheckpoint(eager=True)
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # dft (document frequency) as a count over a token-partitioned window
    # instead of a groupBy + broadcast join-back: the join-back form embeds
    # the tf subtree twice (one per side), re-tokenizing the corpus; the
    # window reuses tf's rows in place — one exchange on the tiny
    # |docs × query|-sized table, zero extra corpus work, identical counts.
    tf = (
        toks.where(F.col("token").isin(query_terms))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .withColumn("dft", F.count("*").over(Window.partitionBy("token")))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(topk)


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    bias: float = -3.0,
    scale: float = 0.2,
) -> DataFrame:
    """Logistic quality score via hashing-trick features × broadcast weights.

    The inference pattern for a linear text classifier at corpus scale:
    tokens hash into ``dim`` buckets (portable md5-prefix base, the same
    hash family as the dedup sketches), per-(doc, bucket) counts aggregate
    map-side, and the ``dim``-row weight vector joins in as a BROADCAST
    table — the generic "model parameters as a small dimension table"
    deployment, no per-row Python, no model artifact on executors.

    Weights here are pseudo-trained: ``w_j = (affine(j)/2^31 − 0.5)·scale``
    with fixed constants, so the DuckDB oracle regenerates the identical
    vector from ``generate_series`` and hash-checks the scores end to end.
    """
    spark = df.sparkSession
    weights = spark.range(dim).select(
        F.col("id").alias("bucket"),
        (
            (
                ((F.lit(WEIGHT_A) * F.col("id") + F.lit(WEIGHT_B)) % F.lit(_MASK31 + 1))
                / F.lit(float(_MASK31 + 1))
                - 0.5
            )
            * scale
        ).alias("w"),
    )
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    feats = (
        toks.select(F.col(id_col), (portable_base31(F.col("token")) % dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("x"))
    )
    logits = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(bias)).alias("logit"))
    )
    return logits.select(
        F.col(id_col),
        F.round(F.col("logit"), 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6).alias("prob"),
        (F.col("logit") >= 0).alias("keep"),
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack et al.).

    Each input carries (query_col, id_col, rank_col); a candidate's fused
    score is ``sum over lists of 1/(rrf_k + rank)``, with absent candidates
    contributing nothing.  Scores are computed in exact integer nano-units
    (``1e9 div (rrf_k + rank)``) so the fusion is engine-portable — float
    reciprocal sums differ at the ulp across engines, integer division does
    not (see the maxsim_late_interaction precedent).

    Scale shape: every per-list input is already top-k-per-query (bounded:
    n_queries x k rows), so fusion is an outer join + hash aggregate over
    candidate-list-sized data — never corpus-sized.  Output keeps the top
    ``k`` fused candidates per query with a deterministic tiebreak.
    """
    contribs = [
        df.select(
            query_col,
            id_col,
            F.expr(f"1000000000L div ({rrf_k} + {rank_col})").alias(f"__c{i}"),
        )
        for i, df in enumerate(ranked)
    ]
    fused = contribs[0]
    for i, nxt in enumerate(contribs[1:], start=1):
        fused = fused.join(nxt, [query_col, id_col], "full_outer")
    score = sum(
        (F.coalesce(F.col(f"__c{i}"), F.lit(0).cast("bigint")) for i in range(len(contribs))),
        start=F.lit(0).cast("bigint"),
    )
    scored = fused.select(query_col, id_col, score.alias("rrf_nano"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(F.col("rrf_nano").desc(), F.col(id_col))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("fused_rank") <= k)
    )
