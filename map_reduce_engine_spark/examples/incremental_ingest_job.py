"""Daily-crawl incremental ingest as one composable, gated job.

The 15th example composition — the pipeline the incremental dedup
operators' docstrings promise, executed: a NEW batch of documents is
cleaned against itself and against the EXISTING corpus, screened for
benchmark contamination, and appended — with the canonical tile index
persisted, probed, and rolled forward, never rebuilt from corpus text.

Stages (history = doc_id < 250, batch = doc_id >= 250 — the registry's
incremental convention; eval suite = history's held-out split
doc_id % 100 >= 90, matching contamination_check / corpus_split):

  1. batch-internal  — ``substring_dedup_survivors``' symmetric tier run
                       on the batch ALONE (``substring_dedup_rewrite``):
                       duplicated k-token spans inside the batch excised,
                       canonical copies kept
  2. index build     — the history's canonical tile-hash index built once
                       (``build_substring_index``) and PERSISTED as a
                       parquet table bucketed on the hash
                       (``write_substring_index``); every later stage
                       probes the STORED table — the corpus text is
                       structurally out of reach (corpus_df=None)
  3. corpus probe    — ``incremental_substring_dedup`` (the accounting
                       ledger) + ``incremental_substring_rewrite`` (the
                       excised text) against the stored index
  4. near-dup probe  — the history's MinHash band-bucket index is
                       persisted the same way (``build_band_index`` +
                       ``write_band_index``, bucketed on the probe's
                       (band, bucket) join key) and the batch's band
                       entries equi-join the STORED table — history
                       signatures are never recomputed; the exact-Jaccard
                       verify joins candidates to a SECOND stored
                       companion, the (id, toks) token table
                       (``build_token_table`` + ``write_token_table``,
                       bucketed on id), so the history text is never
                       re-tokenized either — every stage-4 cost scales
                       with the day, not the corpus; batch docs with a
                       >= threshold historical match drop
  5. decontamination — 13-gram spans shared with the eval suite
                       (``cross_corpus_contamination_spans``); affected
                       batch docs drop (GPT-3 appendix-C posture)
  6. append + roll   — the surviving payload is written, and its tiles,
                       band entries, and token arrays union into their
                       three stored tables (distinct-of-union / per-doc
                       union — the mergeable-state contract of
                       operators/incremental) to produce TOMORROW's
                       index tables
  7. gate            — one sign-off row reconciling every count; the
                       batch ships only if the near-dup rate and the
                       contaminated-doc count are under the caller's
                       bounds (empty batch = explicit reject, the
                       tokenizer-bakeoff lesson)

Every drop set is DISJOINT by construction (emptied -> near-dup ->
contaminated, each computed on the previous stage's survivors), so the
gate reconciles exactly: n_appended = n_batch - n_emptied -
n_near_dup_dropped - n_contaminated_dropped.

Run: ``python -m map_reduce_engine_spark incremental-ingest <sf_dir>
<out_dir>`` or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    k: int = 50,
    jaccard_threshold: float = 0.7,
    max_near_dup_bp: int = 2500,
    max_contaminated_docs: int = 10,
    index_table: str = "mre_tile_index",
    prebuilt: bool = False,
    eval_dir: str | None = None,
) -> DataFrame:
    """Execute the ingest; returns the 1-row sign-off gate after writing
    the append payload, the ledgers, and the rolled-forward tile index.

    ``prebuilt=False`` (day 1) builds and persists all three index tables
    from the history before probing. ``prebuilt=True`` is the DAY-2+
    shape — the loop this job exists for: the three tables named by
    ``index_table`` (``<t>``, ``<t>_bands``, ``<t>_toks``) must already
    exist (yesterday's ``<t>_next`` trio, re-pointed) and every probe
    runs against yesterday's rolled state — so a document appended on
    day 1 is caught as a duplicate on day 2 even though it never
    appeared in the original corpus.

    ``eval_dir`` points the decontamination screen at a SEPARATELY stored
    benchmark suite (a ``documents.parquet`` of eval docs — the way a
    real deployment stores one). With it, a prebuilt run never touches
    the history text at all: ``sf_dir`` can be JUST today's crawl, and
    the only history state read is the three stored index tables.
    Without it, the eval suite is carved from ``sf_dir``'s history slice
    (the self-contained fixture form).

    Each day needs a FRESH ``out_dir``: stage 6 writes tomorrow's trio to
    ``{out_dir}/*_next``, and reusing yesterday's directory would
    overwrite the very files backing the stored tables being read in the
    same plan — the run refuses (``assert_fresh_write_target``) before
    touching anything (ADVICE r10)."""
    from map_reduce_engine_spark.io import read_table, write_parquet
    from map_reduce_engine_spark.operators import dedup as dd

    docs = read_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    history = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    if eval_dir is not None:
        eval_suite = read_table(spark, eval_dir, "documents").where(
            F.trim("text") != ""
        )
    else:
        eval_suite = history.where(F.col("doc_id") % 100 >= 90)

    # 1. batch-internal substring dedup (the symmetric tier on the batch
    # alone — exactly the scope the incremental probe delegates)
    internal = dd.substring_dedup_rewrite(batch, "doc_id", "text", k=k).select(
        "id", "text", "n_tokens", F.col("removed_tokens").alias("internal_removed")
    )

    # 2. build + PERSIST the canonical tile index (day 1), or read
    # yesterday's rolled table (day 2+) — either way, from here on the
    # history text is never rescanned
    if not prebuilt:
        dd.write_substring_index(
            dd.build_substring_index(history, "doc_id", "text", k=k),
            index_table,
            path=f"{out_dir}/tile_index",
        )
    stored = dd.read_substring_index(spark, index_table)

    # 3. probe the stored index: accounting ledger + excised text
    ledger = dd.incremental_substring_dedup(
        None, internal, "id", "text", k=k, index_df=stored
    )
    rewritten = (
        dd.incremental_substring_rewrite(
            None, internal, "id", "text", k=k, index_df=stored
        )
        .select(
            "id", "text", "n_tokens", F.col("removed_tokens").alias("corpus_removed")
        )
        .join(internal.select("id", "internal_removed"), "id")
        # referenced by the empty-split, the near-dup probe, the payload
        # writes AND the gate counts — freeze once (data_selection lesson)
        .localCheckpoint(eager=True)
    )
    emptied = rewritten.where(F.trim("text") == "")
    alive = rewritten.where(F.trim("text") != "")

    # 4. incremental MinHash probe: the history's band-bucket index is
    # PERSISTED too (bucketed on the probe's exact join key) and the batch
    # band entries equi-join the STORED table — history signatures are
    # never recomputed. The exact-Jaccard verify probes a SECOND stored
    # companion, the (id, toks) token table (bucketed on the verify join's
    # id), so the history TEXT is out of reach for this stage too — verify
    # cost scales with the day, not the corpus (VERDICT r09 #1)
    if not prebuilt:
        dd.write_band_index(
            dd.build_band_index(history, "doc_id", "text"),
            f"{index_table}_bands",
            path=f"{out_dir}/band_index",
        )
        dd.write_token_table(
            dd.build_token_table(history, "doc_id", "text"),
            f"{index_table}_toks",
            path=f"{out_dir}/token_table",
        )
    # the read-back asserts the stored banding/tokenization parameters
    # match the probe's (ADVICE r09: a silent mismatch = zero candidates
    # on the band side, silently-wrong similarities on the verify side)
    stored_bands = dd.read_band_index(spark, f"{index_table}_bands")
    stored_toks = dd.read_token_table(spark, f"{index_table}_toks")
    # overwrite guard (ADVICE r10): stage 6 writes tomorrow's trio to
    # {out_dir}/*_next — if a prebuilt run reused yesterday's output_dir,
    # those targets ARE the files backing the stored tables read above
    # (lazy scans — overwriting them mid-plan deletes the only copy of the
    # rolled state). Fail fast, before any stage runs or file moves.
    for tbl, target in (
        (index_table, f"{out_dir}/tile_index_next"),
        (f"{index_table}_bands", f"{out_dir}/band_index_next"),
        (f"{index_table}_toks", f"{out_dir}/token_table_next"),
    ):
        dd.assert_fresh_write_target(spark, tbl, target)
    sig_new = dd.minhash_signatures(alive, "id", "text")
    cands = dd.minhash_cross_candidates(sig_new, None, hist_index_df=stored_bands)
    near_dups = (
        dd.jaccard_pairs(
            alive,
            "id",
            "text",
            min_jaccard=jaccard_threshold,
            candidates=cands,
            hist_toks_df=stored_toks,
        )
        .groupBy(F.col("id1").alias("id"))
        .agg(
            F.count("*").cast("bigint").alias("n_hist_matches"),
            F.max("jaccard").alias("best_jaccard"),
        )
        .localCheckpoint(eager=True)  # written AND counted by the gate
    )
    after_neardup = alive.join(near_dups.select("id"), "id", "left_anti")

    # 5. decontamination screen: 13-gram overlap with the eval suite
    contaminated = (
        dd.cross_corpus_contamination_spans(
            after_neardup,
            eval_suite.select(F.col("doc_id").alias("id"), "text"),
            "id",
            "text",
            k=13,
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum("span_tokens").cast("bigint").alias("contaminated_tokens"),
        )
        .localCheckpoint(eager=True)  # written AND counted by the gate
    )
    payload = after_neardup.join(
        contaminated.select("id"), "id", "left_anti"
    ).localCheckpoint(eager=True)  # written, counted, and tile-sourced

    # 6. roll all three stored tables forward: the appended payload's
    # tiles, band entries, and token arrays union in — one pass over the
    # BATCH each, the history is never retouched and (deliberately) never
    # SHUFFLED: each roll's dedup guard is roll_forward_guard's broadcast-
    # semi overlap probe (a linear scan of the stored side, wide work
    # batch-sized), never a corpus-wide distinct()/left_anti exchange.
    # Tiles have no doc id, so their guard is the anti-join on the hash
    # itself — bucket-co-located with the stored table's layout.
    rolled = stored.unionByName(
        dd.build_substring_index(payload, "id", "text", k=k).join(
            stored, "h", "left_anti"
        )
    )
    dd.write_substring_index(
        rolled, f"{index_table}_next", path=f"{out_dir}/tile_index_next"
    )
    # the guard makes a re-run/id-reuse repeat a no-op (ADVICE r09): a
    # payload doc already present in the stored index contributes nothing,
    # so count-based reconciliation survives repeats
    rolled_bands = stored_bands.unionByName(
        dd.roll_forward_guard(
            dd.build_band_index(payload, "id", "text"), stored_bands, ["id"]
        )
    )
    # tomorrow's trio is named <t>_next / <t>_next_bands / <t>_next_toks —
    # the same shape today's trio has under <t>, so a day-2 run chains by
    # just re-pointing index_table at <t>_next (prebuilt=True)
    dd.write_band_index(
        rolled_bands, f"{index_table}_next_bands", path=f"{out_dir}/band_index_next"
    )
    rolled_toks = stored_toks.unionByName(
        dd.roll_forward_guard(
            dd.build_token_table(payload, "id", "text"), stored_toks, ["id"]
        )
    )
    dd.write_token_table(
        rolled_toks, f"{index_table}_next_toks", path=f"{out_dir}/token_table_next"
    )

    write_parquet(ledger, f"{out_dir}/ledger")
    write_parquet(near_dups, f"{out_dir}/near_dup_drops")
    write_parquet(contaminated, f"{out_dir}/contaminated_drops")
    write_parquet(payload, f"{out_dir}/append_payload")

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias(name))

    gate = (
        n(batch, "n_batch")
        .crossJoin(F.broadcast(n(emptied, "n_emptied")))
        .crossJoin(F.broadcast(n(near_dups, "n_near_dup_dropped")))
        .crossJoin(F.broadcast(n(contaminated, "n_contaminated_dropped")))
        .crossJoin(
            F.broadcast(
                payload.agg(
                    F.count("*").cast("bigint").alias("n_appended"),
                    # the payload text is the rewrite output, so its token
                    # count is exactly n_tokens - corpus_removed per doc
                    F.coalesce(
                        F.sum(F.col("n_tokens") - F.col("corpus_removed")),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("tokens_appended"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                # removal accounting covers the WHOLE probed batch,
                # dropped docs included
                rewritten.agg(
                    F.coalesce(F.sum("internal_removed"), F.lit(0))
                    .cast("bigint")
                    .alias("internal_removed_tokens"),
                    F.coalesce(F.sum("corpus_removed"), F.lit(0))
                    .cast("bigint")
                    .alias("corpus_removed_tokens"),
                )
            )
        )
        .crossJoin(F.broadcast(n(spark.table(index_table), "index_tiles_before")))
        .crossJoin(
            F.broadcast(n(spark.table(f"{index_table}_next"), "index_tiles_after"))
        )
        .select(
            "n_batch",
            "n_emptied",
            "n_near_dup_dropped",
            "n_contaminated_dropped",
            "n_appended",
            "tokens_appended",
            "internal_removed_tokens",
            "corpus_removed_tokens",
            "index_tiles_before",
            "index_tiles_after",
            F.expr("(10000 * n_near_dup_dropped) div greatest(n_batch, 1)").alias(
                "near_dup_bp"
            ),
            F.coalesce(
                (F.col("n_batch") > 0)
                & (
                    F.expr("(10000 * n_near_dup_dropped) div greatest(n_batch, 1)")
                    <= F.lit(max_near_dup_bp)
                )
                & (F.col("n_contaminated_dropped") <= F.lit(max_contaminated_docs)),
                F.lit(False),
            ).alias("batch_approved"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
