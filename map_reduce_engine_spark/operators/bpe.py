"""BPE tokenizer training as an iterative DataFrame loop.

Byte-pair-encoding merge training (Sennrich et al., ACL'16) — the step that
turns a cleaned corpus into a tokenizer. The classic trainer operates on the
word-frequency dictionary, not the corpus, and so does this one: after ONE
corpus-sized aggregate (word counts), every merge round runs over the
exploded (word, pos, symbol) table — vocabulary-sized by Heaps' law
(~corpus^0.5 distinct words), independent of corpus size. That is what makes
BPE training feasible at 100 TB: the corpus is touched once.

Each round is pure relational algebra, mirrored exactly by the DuckDB
oracle's unrolled CTEs (queries/retrieval.py):

1. pair counts: ``lead(sym)`` over a per-word window (bounded state: one
   word's symbols per task), then a weighted hash aggregate;
2. best pair: global argmax with a total-order tiebreak
   (count desc, left, right) — ``orderBy().limit(1)`` plans
   TakeOrderedAndProject and the 1-row result broadcasts;
3. greedy leftmost non-overlapping merge: candidate positions are grouped
   into consecutive runs (``pos - row_number``) and every odd-indexed run
   member merges — the standard window-function encoding of the sequential
   left-to-right scan, identical on any engine;
4. renumber positions, eagerly ``localCheckpoint`` (same lineage-truncation
   discipline as operators/graph.py: without it the per-round nested plan
   blows up the optimizer long before data size matters).

The driver holds only the loop counter; the learned merge table stays
distributed (1 broadcast row per round).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.conf import loop_conf

EOW = "</w>"  # end-of-word marker, merged like any other symbol


def word_symbols(words: DataFrame, word_col: str = "word", cnt_col: str = "wcnt") -> DataFrame:
    """(word, wcnt) → (word, wcnt, pos, sym): characters + end-of-word marker."""
    chars = F.expr(f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))")
    syms = F.concat(chars, F.array(F.lit(EOW)))
    return words.select(
        F.col(word_col).alias("word"),
        F.col(cnt_col).alias("wcnt"),
        F.posexplode(syms).alias("pos0", "sym"),
    ).select("word", "wcnt", (F.col("pos0") + 1).alias("pos"), "sym")


def bpe_train(words: DataFrame, n_merges: int = 6) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, wcnt) frequency table.

    Returns the merge table — the trained tokenizer: one row per round with
    (round, lhs, rhs, merged, pair_cnt). Deterministic: the argmax
    tiebreak is (count desc, left asc, right asc), so the same dictionary
    yields the same merges on every engine, run, and partitioning.
    """
    merge_rows, _ = _train_rounds(words, n_merges)
    return reduce(DataFrame.unionByName, merge_rows)


def bpe_train_and_segment(words: DataFrame, n_merges: int = 6) -> tuple[DataFrame, DataFrame]:
    """Both artifacts of ONE training run: (merge table, final symbol
    table). Callers needing the learned merges AND the segmentation (the
    tokenizer bake-off's vocabulary-inventory accounting) use this instead
    of calling :func:`bpe_train` + :func:`bpe_segment` separately, which
    would train the identical model twice."""
    merge_rows, syms = _train_rounds(words, n_merges)
    return reduce(DataFrame.unionByName, merge_rows), syms


def bpe_segment(words: DataFrame, n_merges: int = 6) -> DataFrame:
    """Word-type segmentation after ``n_merges`` learned merges.

    Returns the final (word, wcnt, pos, sym) symbol table — every word
    type's subword sequence. This is the ENCODE side of BPE: because
    tokenization is per word type, encoding a 100 TB corpus means
    segmenting the vocabulary-sized dictionary once and joining the result
    back to the token stream — the corpus itself never re-enters the merge
    loop.
    """
    _, syms = _train_rounds(words, n_merges)
    return syms


def _train_rounds(words: DataFrame, n_merges: int) -> tuple[list[DataFrame], DataFrame]:
    syms = word_symbols(words).localCheckpoint(eager=True)
    # Same fixed-round loop discipline as the graph operators: the loop
    # state is the VOCABULARY-sized symbol table, so partitions are sized
    # to it (capped at the session setting) and AQE is off for the loop
    # scope — per-round wall time on static tiny-state shapes is stage
    # scheduling, and every surplus partition costs n_merges rounds x
    # several window/join stages of task-launch latency.
    spark = words.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nparts = max(1, min(session_parts, syms.count() // 200_000 + 1))
    with loop_conf(spark, nparts):
        merge_rows, syms = _train_rounds_inner(syms, n_merges)
    return merge_rows, syms


def _train_rounds_inner(syms: DataFrame, n_merges: int) -> tuple[list[DataFrame], DataFrame]:
    w_pos = Window.partitionBy("word").orderBy("pos")
    merge_rows = []
    for r in range(1, n_merges + 1):
        p = syms.withColumn("nxt", F.lead("sym").over(w_pos))
        best = (
            p.where(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("wcnt").alias("pair_cnt"))
            .orderBy(F.desc("pair_cnt"), "sym", "nxt")
            .limit(1)
            .select(
                F.col("sym").alias("l"),
                F.col("nxt").alias("r"),
                F.col("pair_cnt"),
            )
            .localCheckpoint(eager=True)  # 1 row; freezes the round's argmax
        )
        merge_rows.append(
            best.select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.concat("l", "r").alias("merged"),
                F.col("pair_cnt").cast("bigint").alias("pair_cnt"),
            )
        )
        cand = p.crossJoin(F.broadcast(best)).withColumn(
            "cand", (F.col("sym") == F.col("l")) & (F.col("nxt") == F.col("r"))
        )
        # greedy leftmost non-overlap: consecutive candidate positions form a
        # run (pos - row_number is constant within one); odd run members merge
        runs = cand.where("cand").withColumn(
            "grp", F.col("pos") - F.row_number().over(w_pos)
        )
        kept = (
            runs.withColumn(
                "rn", F.row_number().over(Window.partitionBy("word", "grp").orderBy("pos"))
            )
            .where(F.col("rn") % 2 == 1)
            .select("word", F.col("pos").alias("kpos"))
        )
        merged = (
            cand.join(
                kept.withColumnRenamed("kpos", "pos"), ["word", "pos"], "left_semi"
            )
            .select("word", "pos")
            .withColumn("is_merge", F.lit(True))
        )
        absorbed = merged.select("word", (F.col("pos") + 1).alias("pos"))
        syms = (
            cand.join(absorbed, ["word", "pos"], "left_anti")
            .join(merged, ["word", "pos"], "left")
            .select(
                "word",
                "wcnt",
                "pos",
                F.when(F.col("is_merge"), F.concat("sym", "nxt")).otherwise(F.col("sym")).alias("sym"),
            )
            .withColumn("pos", F.row_number().over(w_pos))
            .localCheckpoint(eager=True)
        )
    return merge_rows, syms
