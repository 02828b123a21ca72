"""Tokenizer bake-off report as one composable job: BPE vs unigram-LM.

The 16th example composition: both trained-subword families — BPE merges
(``operators/bpe.py``, Sennrich ACL'16) and the unigram LM
(``operators/unigram_lm.py``, Kudo ACL'18) — trained on the SAME corpus
dictionary and compared the way a tokenizer bake-off actually decides:
per-domain fertility (pieces emitted per word — the compute cost of the
tokenizer to each domain) plus the vocabulary utilization each family
achieves. Every stage is a shipped registry query; this module only
composes them and joins their outputs.

Stages:
  1. BPE fertility       — ``bpe_fertility`` per source (6 merges)
  2. unigram fertility   — ``unigram_fertility`` per source (2 EM rounds)
  3. vocab utilization   — ``bpe_subword_vocab`` symbol table and
                           ``unigram_lm_vocab`` piece table; a trained
                           vocabulary full of never-used pieces is wasted
                           embedding rows
  4. per-source bake-off — fertility side by side, delta in exact ppm
                           (integer div — engines cannot disagree), winner
                           per domain with the deterministic tie rule
                           (tie -> 'tie')
  5. write + gate        — one parquet per artifact and a single sign-off
                           row: corpus-level mean fertilities, per-family
                           vocab size/utilization, per-domain win counts,
                           approved = both corpus fertilities under the
                           ``--max-fertility-ppm`` ceiling

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
    from map_reduce_engine_spark.queries.base import REGISTRY

    # every output is both written AND aggregated into the gate — freeze
    # each once (all are source- or vocabulary-bounded by construction)
    bpe_f = REGISTRY["bpe_fertility"].fn(spark, sf_dir).localCheckpoint(eager=True)
    uni_f = REGISTRY["unigram_fertility"].fn(spark, sf_dir).localCheckpoint(eager=True)
    bpe_v = REGISTRY["bpe_subword_vocab"].fn(spark, sf_dir).localCheckpoint(eager=True)
    uni_v = REGISTRY["unigram_lm_vocab"].fn(spark, sf_dir).localCheckpoint(eager=True)
    uni_cl = REGISTRY["unigram_codelength"].fn(spark, sf_dir).localCheckpoint(eager=True)

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
                    # every BPE symbol row comes from a surviving
                    # segmentation, so utilization is definitionally full;
                    # the column exists for report symmetry
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
            (
                (F.col("bpe_corpus_fert_ppm") <= max_fertility_ppm)
                & (F.col("uni_corpus_fert_ppm") <= max_fertility_ppm)
            ).alias("tokenizer_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
