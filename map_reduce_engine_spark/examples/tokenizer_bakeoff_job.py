"""Tokenizer bake-off report as one composable job: BPE vs unigram-LM.

The 16th example composition: both trained-subword families — BPE merges
(``operators/bpe.py``, Sennrich ACL'16) and the unigram LM
(``operators/unigram_lm.py``, Kudo ACL'18) — trained on the IDENTICAL
corpus dictionary and compared the way a tokenizer bake-off actually
decides: per-domain fertility (pieces emitted per word — the compute cost
of the tokenizer to each domain), vocabulary utilization, and corpus
codelength.

**Population rule (ADVICE r07):** BOTH families train on, and are scored
over, the words within the unigram trainer's 16-char cap
(``unigram_lm.WORD_LEN_CAP`` — the standard SentencePiece trainable-length
cap; beyond it live URL/DNA-string outliers). The earlier revision trained
BPE uncapped while the unigram leg was capped, which biased per-source
winners toward unigram on long-word sources; with one shared dictionary
the comparison is apples-to-apples and the "same corpus dictionary" claim
is literally true.

Each family trains ONCE and every leg reuses the trained model
(``unigram_segment(words, vocab=...)`` / ``bpe_train_and_segment`` —
ADVICE r07: the per-leg registry queries each retrain by design because
they are standalone oracle-checked units; a composed job must not).

Stages:
  1. BPE fertility       — per source, under the 6 learned merges
  2. unigram fertility   — per source, under the pruned-to-target vocab
  3. vocab utilization   — unigram: trained pieces with em_cnt > 0.
                           BPE: the FULL learned symbol inventory
                           (alphabet + end-of-word marker + merge
                           outputs) vs the symbols the final segmentation
                           actually emits — merges ABSORB characters, so
                           utilization < 100% is meaningful (ADVICE r07:
                           the old occurrences>0 count over the final
                           symbol table was definitionally 100%)
  4. unigram codelength  — corpus micro-nats/char (modeling fit)
  5. per-source bake-off — fertility side by side, delta in exact ppm
                           (integer div — engines cannot disagree), winner
                           per domain with the deterministic tie rule
                           (tie -> 'tie')
  6. write + gate        — one parquet per artifact and a single sign-off
                           row; approved = both corpus fertilities under
                           the ``--max-fertility-ppm`` ceiling AND the
                           corpus is non-empty (a zero-word corpus yields
                           NULL ppm — coalesced to an explicit REJECT, not
                           a silently-undecided NULL; ADVICE r07)

Run: ``python -m map_reduce_engine_spark tokenizer-bakeoff <sf_dir> <out>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_fertility_ppm: int = 10_000_000,  # 10 pieces/word — generous default
) -> DataFrame:
    """Execute the bake-off; returns the 1-row sign-off gate after writing
    the per-stage artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.operators import bpe, unigram_lm
    from map_reduce_engine_spark.operators.bpe import word_symbols
    from map_reduce_engine_spark.operators.text import tokens_col
    from map_reduce_engine_spark.queries.base import t

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    # the ONE shared dictionary both families train on: word types within
    # the 16-char trainable cap (see the population rule in the module doc)
    words = unigram_lm.trainable_words(
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    ).localCheckpoint(eager=True)
    # per-(source, word) counts over the SAME population — the scoring side
    st = (
        docs.select("source", F.explode(tokens_col("text")).alias("word"))
        .where(F.length("word") <= unigram_lm.WORD_LEN_CAP)
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )

    # ---- unigram: train ONCE, segment ONCE, derive all three legs
    uni_vocab = unigram_lm.unigram_train(words).localCheckpoint(eager=True)
    uni_seg = unigram_lm.unigram_segment(words, vocab=uni_vocab).localCheckpoint(eager=True)
    uni_v = uni_vocab.select(
        "piece", F.col("cnt").alias("em_cnt"), F.col("cost").alias("cost_micro")
    )
    n_pieces = uni_seg.select(
        "word", F.size(F.split("path", " ")).cast("bigint").alias("n_pieces")
    )
    uni_f = (
        st.join(F.broadcast(n_pieces), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("n_pieces")).cast("bigint").alias("total_pieces"),
            F.sum("c").cast("bigint").alias("total_words"),
            F.round(F.sum(F.col("c") * F.col("n_pieces")) * 1.0 / F.sum("c"), 4).alias(
                "fertility"
            ),
        )
        .localCheckpoint(eager=True)
    )
    uni_cl = (
        st.join(F.broadcast(uni_seg.select("word", "cost")), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("cost")).cast("bigint").alias("total_micronats"),
            F.sum(F.col("c") * F.length("word")).cast("bigint").alias("total_chars"),
            F.expr("sum(c * cost) div sum(c * length(word))")
            .cast("bigint")
            .alias("micronats_per_char"),
        )
        .localCheckpoint(eager=True)
    )

    # ---- BPE: train ONCE on the same dictionary; keep merges AND syms
    merges, bpe_syms = bpe.bpe_train_and_segment(words, n_merges=6)
    bpe_syms = bpe_syms.localCheckpoint(eager=True)
    n_sub = bpe_syms.groupBy("word").agg(F.count("*").cast("bigint").alias("n_sub"))
    bpe_f = (
        st.join(F.broadcast(n_sub), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("n_sub")).cast("bigint").alias("total_subwords"),
            F.sum("c").cast("bigint").alias("total_words"),
            F.round(F.sum(F.col("c") * F.col("n_sub")) * 1.0 / F.sum("c"), 4).alias(
                "fertility"
            ),
        )
        .localCheckpoint(eager=True)
    )
    # FULL learned inventory: every base symbol (chars + the end-of-word
    # marker) plus every merge output; occurrences from the final
    # segmentation, zero for symbols the merges absorbed out of use
    inventory = (
        word_symbols(words)
        .select("sym")
        .distinct()
        .unionByName(merges.select(F.col("merged").alias("sym")))
        .distinct()
    )
    usage = bpe_syms.groupBy("sym").agg(
        F.sum("wcnt").cast("bigint").alias("occurrences"),
        F.countDistinct("word").cast("bigint").alias("n_word_types"),
    )
    bpe_v = (
        inventory.join(usage, "sym", "left")
        .select(
            "sym",
            F.coalesce("occurrences", F.lit(0)).cast("bigint").alias("occurrences"),
            F.coalesce("n_word_types", F.lit(0)).cast("bigint").alias("n_word_types"),
        )
        .localCheckpoint(eager=True)
    )

    # per-source bake-off: exact integer-ppm fertilities from the raw
    # totals (the float `fertility` columns are display-rounded; the ppm
    # div on BIGINT totals is the engine-exact comparison)
    bakeoff = (
        bpe_f.select(
            "source",
            F.col("total_subwords").alias("bpe_pieces"),
            F.col("total_words").alias("bpe_words"),
            F.expr("1000000 * total_subwords div total_words").alias("bpe_fert_ppm"),
        )
        .join(
            uni_f.select(
                "source",
                F.col("total_pieces").alias("uni_pieces"),
                F.col("total_words").alias("uni_words"),
                F.expr("1000000 * total_pieces div total_words").alias("uni_fert_ppm"),
            ),
            "source",
        )
        .select(
            "source",
            "bpe_pieces",
            "bpe_words",
            "uni_pieces",
            "uni_words",
            "bpe_fert_ppm",
            "uni_fert_ppm",
            (F.col("uni_fert_ppm") - F.col("bpe_fert_ppm"))
            .cast("bigint")
            .alias("uni_minus_bpe_ppm"),
            F.when(F.col("uni_fert_ppm") < F.col("bpe_fert_ppm"), "unigram")
            .when(F.col("bpe_fert_ppm") < F.col("uni_fert_ppm"), "bpe")
            .otherwise("tie")
            .alias("winner"),
        )
        .localCheckpoint(eager=True)
    )

    write_parquet(bpe_f, f"{out_dir}/bpe_fertility")
    write_parquet(uni_f, f"{out_dir}/unigram_fertility")
    write_parquet(bpe_v, f"{out_dir}/bpe_vocab")
    write_parquet(uni_v, f"{out_dir}/unigram_vocab")
    write_parquet(uni_cl, f"{out_dir}/unigram_codelength")
    write_parquet(bakeoff, f"{out_dir}/bakeoff")

    # corpus-level means weight every WORD equally (micro totals over the
    # summed numerators/denominators), not every source — a tiny domain
    # must not swing the headline number
    gate = (
        bakeoff.agg(
            F.count("*").cast("bigint").alias("n_sources"),
            F.expr("1000000 * sum(bpe_pieces) div sum(bpe_words)").alias(
                "bpe_corpus_fert_ppm"
            ),
            F.expr("1000000 * sum(uni_pieces) div sum(uni_words)").alias(
                "uni_corpus_fert_ppm"
            ),
            F.sum((F.col("winner") == "unigram").cast("int"))
            .cast("bigint")
            .alias("unigram_wins"),
            F.sum((F.col("winner") == "bpe").cast("int"))
            .cast("bigint")
            .alias("bpe_wins"),
        )
        .crossJoin(
            F.broadcast(
                bpe_v.agg(
                    F.count("*").cast("bigint").alias("bpe_vocab_size"),
                    F.sum((F.col("occurrences") > 0).cast("int"))
                    .cast("bigint")
                    .alias("bpe_vocab_used"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                uni_v.agg(
                    F.count("*").cast("bigint").alias("uni_vocab_size"),
                    F.sum((F.col("em_cnt") > 0).cast("int"))
                    .cast("bigint")
                    .alias("uni_vocab_used"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                # modeling-fit leg of the trio: corpus-level nats/char under
                # the unigram LM, exact integer division of summed totals
                uni_cl.agg(
                    F.expr("sum(total_micronats) div sum(total_chars)")
                    .cast("bigint")
                    .alias("uni_micronats_per_char")
                )
            )
        )
        .select(
            "n_sources",
            "bpe_corpus_fert_ppm",
            "uni_corpus_fert_ppm",
            "unigram_wins",
            "bpe_wins",
            "bpe_vocab_size",
            "bpe_vocab_used",
            "uni_vocab_size",
            "uni_vocab_used",
            "uni_micronats_per_char",
            # an EMPTY corpus makes the ppm divisions NULL; a gate must
            # reject explicitly, never ride a silently-NULL approved flag
            (
                F.coalesce(
                    (F.col("bpe_corpus_fert_ppm") <= max_fertility_ppm)
                    & (F.col("uni_corpus_fert_ppm") <= max_fertility_ppm),
                    F.lit(False),
                )
                & (F.col("n_sources") > 0)
            ).alias("tokenizer_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
