"""Unigram-LM (SentencePiece-style) tokenizer training as relational algebra.

Kudo (ACL'18, "Subword Regularization") trains the OTHER major subword
family beside BPE (operators/bpe.py): a piece vocabulary with
log-probabilities, segmenting each word by its highest-likelihood split
instead of greedy merges. This is the hard-EM (Viterbi-EM) variant, built so
every step is an equi-join / hash aggregate the DuckDB oracle replays
exactly:

1. **Seed**: candidate pieces are all substrings up to ``PIECE_MAX_LEN``
   chars, counted over the word-frequency dictionary — after ONE
   corpus-sized aggregate (word counts) everything is vocabulary-sized by
   Heaps' law, the same scale posture that makes BPE training feasible at
   100 TB. All single characters are kept (guaranteeing full coverage) plus
   the top-``n_multi`` multi-char pieces by weighted count
   (``orderBy().limit`` → TakeOrderedAndProject, never a global window).
2. **E-step**: per-word-type Viterbi segmentation is a MIN-PLUS shortest
   path 0 → len(word) over piece edges. The sequential DP recursion is not
   relational, but its matrix-power form is: ``ceil(log2(len_cap))``
   path-doubling rounds (join the state table to itself on the midpoint,
   keep the per-(word, j, i) minimum) cover every split of a word up to
   ``len_cap`` chars — the classic repeated-squaring shortest-path trick.
   Ties break on (cost, path-string), so the chosen segmentation is
   identical on any engine, run, and partitioning.
3. **M-step**: piece counts along the best paths (explode the
   space-joined path string — pieces can never contain whitespace, the
   tokenizer split guarantees it — weighted by word count), then
   add-half-smoothed cost re-estimation so unseen pieces survive with a
   high cost instead of vanishing: cost = -ln((2c+1) / (2·total + |V|)).

Costs are frozen to BIGINT micro-nats (the zipf_law_fit recipe: ln on exact
integer ratios → engine-identical doubles → one round) so path sums, argmins
and tiebreaks are exact-integer decisions in both engines.

Words longer than ``len_cap`` are excluded from training — the standard
SentencePiece practice of capping trainable token length; at corpus scale
such outliers are URLs/DNA-strings that would only bloat the seed set.

Scale shape: the corpus is touched once (the word-count aggregate); the DP
state is |vocabulary| × O(len_cap²) rows, localCheckpoint-truncated per
doubling round (operators/graph.py discipline), and the piece table is a
broadcast at any corpus size.

Reference parity anchor: the reference ships no tokenizer trainer (its jobs
are WordCount/WordLength, wordcount-src/WordCount.java:13-35); this extends
the SURVEY Part C tokenizer family (operators/bpe.py) with the unigram-LM
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.conf import loop_conf

PIECE_MAX_LEN = 4
WORD_LEN_CAP = 16  # 2^4: four path-doubling rounds cover any split
N_DOUBLINGS = 4
N_SEED_MULTI = 40


def trainable_words(words: DataFrame, word_col: str = "word", cnt_col: str = "wcnt") -> DataFrame:
    """Apply the training length cap (standard SentencePiece practice)."""
    return words.select(
        F.col(word_col).alias("word"), F.col(cnt_col).cast("bigint").alias("wcnt")
    ).where((F.length("word") >= 1) & (F.length("word") <= WORD_LEN_CAP))


def piece_edges(words: DataFrame) -> DataFrame:
    """(word, wcnt) → (word, wcnt, j, i, piece): every ≤PIECE_MAX_LEN-char
    substring as a DP edge j → i (0-based cut positions, substr 1-based).

    Pure in-row array math inside one codegen projection — no join, no
    shuffle; the explode fan-out is O(len · PIECE_MAX_LEN) per word type.
    """
    pairs = F.expr(
        "flatten(transform(sequence(0, length(word) - 1), "
        f"j -> transform(sequence(j + 1, least(j + {PIECE_MAX_LEN}, length(word))), "
        "i -> named_struct('j', j, 'i', i))))"
    )
    return (
        words.select("word", "wcnt", F.explode(pairs).alias("e"))
        .select("word", "wcnt", F.col("e.j").alias("j"), F.col("e.i").alias("i"))
        .withColumn("piece", F.expr("substring(word, j + 1, i - j)"))
    )


def seed_vocab(words: DataFrame, n_multi: int = N_SEED_MULTI) -> DataFrame:
    """Seed piece counts: ALL single chars (coverage guarantee) + the
    top-``n_multi`` multi-char substrings by weighted occurrence count.

    The top-k is ``orderBy().limit()`` — TakeOrderedAndProject with the
    (count desc, piece asc) deterministic tiebreak, never a global window
    over the piece grid.
    """
    cnts = piece_edges(words).groupBy("piece").agg(F.sum("wcnt").alias("cnt"))
    singles = cnts.where(F.length("piece") == 1)
    multis = (
        cnts.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(n_multi)
    )
    return singles.unionByName(multis).select("piece", F.col("cnt").cast("bigint").alias("cnt"))


def smoothed_costs(vocab_cnts: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cnt, cost): add-half-smoothed micro-nat costs.

    cost = -round(ln((2c+1) / (2·total + |V|)) · 1e6) — exact-integer
    operands into ln (the zipf_law_fit recipe), so both engines freeze the
    identical BIGINT. The totals row is a 1-row broadcast.
    """
    totals = vocab_cnts.agg(
        F.sum("cnt").cast("bigint").alias("_total"), F.count("*").cast("bigint").alias("_nv")
    )
    return (
        vocab_cnts.crossJoin(F.broadcast(totals))
        .withColumn(
            "cost",
            (
                -F.round(
                    F.log(
                        (2 * F.col("cnt") + 1).cast("double")
                        / (2 * F.col("_total") + F.col("_nv")).cast("double")
                    )
                    * F.lit(1e6)
                )
            ).cast("bigint"),
        )
        .select("piece", "cnt", "cost")
    )


def viterbi_paths(words: DataFrame, vocab: DataFrame, n_doublings: int = N_DOUBLINGS) -> DataFrame:
    """Best (min-cost) segmentation per word type under ``vocab`` costs.

    Min-plus repeated squaring: state rows are (word, j, i, cost, path);
    each round unions the composition of the state with itself (equi-join
    on the midpoint) and keeps the per-(word, j, i) minimum by
    (cost, path) — after ``n_doublings`` rounds every path of up to
    2^n_doublings pieces is represented. Returns (word, wcnt, cost, path).
    """
    state = (
        piece_edges(words)
        .join(F.broadcast(vocab.select("piece", "cost")), "piece")
        .select("word", "j", "i", "cost", F.col("piece").alias("path"))
        .localCheckpoint(eager=True)
    )
    w_min = Window.partitionBy("word", "j", "i").orderBy("cost", "path")
    for _ in range(n_doublings):
        comp = (
            state.alias("x")
            .join(
                state.alias("y"),
                (F.col("x.word") == F.col("y.word")) & (F.col("x.i") == F.col("y.j")),
            )
            .select(
                F.col("x.word").alias("word"),
                F.col("x.j").alias("j"),
                F.col("y.i").alias("i"),
                (F.col("x.cost") + F.col("y.cost")).alias("cost"),
                F.concat_ws(" ", "x.path", "y.path").alias("path"),
            )
        )
        state = (
            state.unionByName(comp)
            .withColumn("rn", F.row_number().over(w_min))
            .where(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
    w2 = words.select("word", "wcnt").withColumn("_wlen", F.length("word"))
    return (
        w2.alias("w")
        .join(
            state.alias("s"),
            (F.col("w.word") == F.col("s.word"))
            & (F.col("s.j") == 0)
            & (F.col("s.i") == F.col("w._wlen")),
        )
        .select(
            F.col("w.word").alias("word"),
            F.col("w.wcnt").alias("wcnt"),
            F.col("s.cost").alias("cost"),
            F.col("s.path").alias("path"),
        )
    )


def unigram_train(words: DataFrame, n_rounds: int = 2, n_multi: int = N_SEED_MULTI) -> DataFrame:
    """Train the unigram-LM vocabulary: ``n_rounds`` of Viterbi-EM.

    Input is the (word, wcnt) frequency dictionary (ONE corpus aggregate
    upstream). Returns the trained piece table (piece, cnt, cost) — cnt is
    the final E-step's weighted piece count, cost its smoothed micro-nat
    negative log-probability. Deterministic end to end.
    """
    words = trainable_words(words).localCheckpoint(eager=True)
    spark = words.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # DP state is vocabulary-sized: |words| × O(len_cap²/2) rows
    nparts = max(1, min(session_parts, words.count() * 80 // 200_000 + 1))
    with loop_conf(spark, nparts):
        vocab = smoothed_costs(seed_vocab(words, n_multi)).localCheckpoint(eager=True)
        for _ in range(n_rounds):
            best = viterbi_paths(words, vocab)
            counted = (
                best.select("wcnt", F.explode(F.split("path", " ")).alias("piece"))
                .groupBy("piece")
                .agg(F.sum("wcnt").cast("bigint").alias("cnt"))
            )
            vocab = smoothed_costs(
                vocab.select("piece")
                .join(counted, "piece", "left")
                .select("piece", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"))
            ).localCheckpoint(eager=True)
    return vocab


def unigram_segment(words: DataFrame, n_rounds: int = 2, n_multi: int = N_SEED_MULTI) -> DataFrame:
    """ENCODE side: best segmentation of every word type under the trained
    vocabulary — one more Viterbi pass with the final costs. Encoding a
    100 TB corpus segments the vocabulary-sized dictionary once and joins
    back to the token stream (the bpe_segment posture)."""
    vocab = unigram_train(words, n_rounds=n_rounds, n_multi=n_multi)
    words = trainable_words(words).localCheckpoint(eager=True)
    spark = words.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nparts = max(1, min(session_parts, words.count() * 80 // 200_000 + 1))
    with loop_conf(spark, nparts):
        return viterbi_paths(words, vocab)
