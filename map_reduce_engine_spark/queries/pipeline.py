"""Training-data pipeline conformance queries (SURVEY.md §2 Part C).

The operations a large-scale pretraining-corpus pipeline runs between raw
ingest and the tokenizer: repetition-based quality filters (Gopher-style),
train/test contamination checks, sequence packing, domain-mixture
re-weighting, deterministic sampling, and winnowing fingerprints. None of
these exist in the reference (its only query language is the map/reduce UDF
pair, SURVEY.md §2 Part B) — each is defined here as a declarative DataFrame
pipeline with a DuckDB oracle twin.

Scale notes (100 TB posture):
- everything is per-document or per-(bounded-cardinality) group — no global
  windows over raw rows; packing windows partition by ``source`` so state
  never exceeds one domain's documents per task;
- n-gram explosion happens AFTER the per-doc tokenize projection, so the
  shuffle carries (doc_id, gram) pairs, never full texts;
- contamination joins shuffle distinct shingles only (map-side distinct
  first), and the mixture/packing aggregates reduce to |sources| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.text import tokens_col
from map_reduce_engine_spark.queries.base import register, t

# DuckDB-side tokenizer mirroring operators/text.py::tokens_col
_DUCK_TOKS = r"string_split_regex(trim(text), '\s+')"


# --------------------------------------------------------------------------
# Gopher-style repetition quality filters
# --------------------------------------------------------------------------


@register(
    "repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS l FROM documents WHERE trim(text) <> ''
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1])) AS gram
      FROM toks WHERE len(l) >= 2
    ),
    cnt AS (
      SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
    )
    SELECT doc_id,
           sum(c)::BIGINT                        AS n_bigrams,
           max(c)::BIGINT                        AS top_bigram_cnt,
           round(max(c) / sum(c), 4)             AS top_bigram_frac,
           round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c), 4)
                                                 AS dup_bigram_frac
    FROM cnt GROUP BY doc_id
    """,
    doc="Gopher-style repetition quality filter: per-document fraction of "
    "bigrams covered by the single most-frequent bigram and by any repeated "
    "bigram — the standard signals for dropping boilerplate/spam docs from "
    "a pretraining corpus. The shuffle carries (doc_id, bigram) pairs after "
    "per-doc projection; both aggregates are one hash-agg pass. Absent in "
    "reference (UDF-expressible only, SURVEY.md §2 Part B).",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select("doc_id", tokens_col("text").alias("l")).where(F.size("l") >= 2)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(l) - 1), i -> concat(l[i-1], ' ', l[i]))")
        ).alias("gram"),
    )
    cnt = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_cnt"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 4
        ).alias("dup_bigram_frac"),
    )


# --------------------------------------------------------------------------
# Train/test contamination check
# --------------------------------------------------------------------------


@register(
    "contamination_check",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % 100 >= 90 AS is_test, {_DUCK_TOKS} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    shingles AS (
      SELECT DISTINCT doc_id, is_test,
             unnest(list_transform(range(1, len(l) - 3),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4]))
               AS shingle
      FROM toks WHERE len(l) >= 5
    ),
    train_shingles AS (
      SELECT DISTINCT shingle FROM shingles WHERE NOT is_test
    )
    SELECT s.doc_id,
           count(*)::BIGINT AS n_shingles,
           count(ts.shingle)::BIGINT AS n_contaminated,
           round(count(ts.shingle) / count(*), 4) AS contamination_rate
    FROM shingles s LEFT JOIN train_shingles ts ON s.shingle = ts.shingle
    WHERE s.is_test
    GROUP BY s.doc_id
    """,
    doc="train/test contamination check: 5-gram shingle overlap between the "
    "held-out split (doc_id%100>=90, matching corpus_split) and the train "
    "side — the benchmark-leakage audit every eval pipeline needs. Both "
    "sides are map-side-distinct before the join, so the shuffle carries "
    "unique (shingle) rows, never documents; the join key is the shingle "
    "string (hash-partitioned, skew-free for natural text).",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "doc_id", (F.col("doc_id") % 100 >= 90).alias("is_test"), tokens_col("text").alias("l")
    ).where(F.size("l") >= 5)
    shingles = toks.select(
        "doc_id",
        "is_test",
        F.explode(
            F.expr(
                "transform(sequence(1, size(l) - 4),"
                " i -> concat_ws(' ', l[i-1], l[i], l[i+1], l[i+2], l[i+3]))"
            )
        ).alias("shingle"),
    ).distinct()
    train = shingles.where(~F.col("is_test")).select("shingle").distinct()
    test = shingles.where(F.col("is_test"))
    return (
        test.join(train.withColumn("hit", F.lit(1)), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") / F.count("*"), 4).alias("contamination_rate"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing (token-budget bin assignment)
# --------------------------------------------------------------------------


@register(
    "pack_sequences",
    oracle="""
    WITH est AS (
      SELECT source, doc_id, ceil(n_chars / 4)::BIGINT AS est_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, est_tokens,
             CAST(floor((sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                        / 2048) AS BIGINT) AS bin_id
      FROM est
    )
    SELECT source, bin_id,
           count(*)               AS n_docs,
           sum(est_tokens)::BIGINT AS n_tokens,
           min(doc_id)         AS first_doc,
           max(doc_id)         AS last_doc
    FROM packed
    GROUP BY source, bin_id
    """,
    doc="sequence packing: assign documents to fixed token-budget (2048) "
    "training bins by running-sum position, partitioned per source domain — "
    "the pre-tokenizer packing step that turns a corpus into uniform-length "
    "training examples. The window partitions by source (bounded state per "
    "task, no global ordering), so it scales horizontally with domains; "
    "within a domain order is the stable doc_id, making bin assignment "
    "reproducible across runs and re-partitioning.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.packing import pack_bins

    docs = t(spark, sf_dir, "documents")
    est = docs.select(
        "source", "doc_id", F.ceil(F.col("n_chars") / 4).cast("bigint").alias("est_tokens")
    )
    packed = pack_bins(est, "source", "doc_id", "est_tokens", budget=2048)
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("est_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# Domain mixture re-weighting
# --------------------------------------------------------------------------


@register(
    "domain_mixture",
    oracle="""
    WITH per_source AS (
      SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n_docs) AS total_docs, count(*) AS n_sources FROM per_source
    )
    SELECT source, n_docs,
           round(n_docs / total_docs, 4) AS share,
           round(least(1.0, (1.0 / n_sources) / (n_docs / total_docs)), 4)
             AS keep_rate,
           CAST(ceil(n_docs * least(1.0, (1.0 / n_sources) / (n_docs / total_docs)))
                AS BIGINT) AS expected_docs
    FROM per_source, tot
    """,
    doc="domain-mixture re-weighting: per-source corpus share and the "
    "downsampling rate that moves the mixture toward uniform across "
    "domains (capped at 1.0 — undersized domains are never upsampled). "
    "The totals join in as a 1-row broadcast over the |sources|-row "
    "aggregate, so the plan is one shuffle on source regardless of scale.",
)
def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("total_docs"), F.count("*").alias("n_sources")
    )
    share = F.col("n_docs") / F.col("total_docs")
    keep = F.least(F.lit(1.0), (F.lit(1.0) / F.col("n_sources")) / share)
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(share, 4).alias("share"),
            F.round(keep, 4).alias("keep_rate"),
            F.ceil(F.col("n_docs") * keep).cast("bigint").alias("expected_docs"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling (oracle-checked twin of stratified_sample)
# --------------------------------------------------------------------------


@register(
    "hash_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_sampled,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    WHERE ((doc_id % 1000003) * 2654435761) % 1000 < 250
    GROUP BY lang
    """,
    doc="deterministic 25% corpus sample via Knuth multiplicative hashing "
    "on the document key — unlike seeded Bernoulli sampling (stratified_"
    "sample) this is engine- and partitioning-independent, so the SAME "
    "documents are kept on every engine, run, and cluster size; the "
    "property that makes sample membership auditable at 100 TB. The "
    "modulus keeps the product within 64-bit range on any engine.",
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    keep = ((F.col("doc_id") % 1000003) * 2654435761) % 1000 < 250
    return (
        docs.where(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (rolling k-gram hash + sliding-window min)
# --------------------------------------------------------------------------


@register(
    "winnowing_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS l FROM documents WHERE trim(text) <> ''
    ),
    hashes AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(l[i:i+3], ' ')), 1, 8))::BIGINT AS h
      FROM toks, unnest(range(1, len(l) - 2)) AS u(i)
      WHERE len(l) >= 4
    ),
    winnowed AS (
      SELECT DISTINCT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM hashes
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_fingerprints,
           min(fp) AS min_fp,
           max(fp) AS max_fp
    FROM winnowed GROUP BY doc_id
    """,
    doc="winnowing document fingerprints (Schleimer et al., SIGMOD'03): "
    "hash every token 4-gram (md5-prefix rolling hash, engine-portable), "
    "then keep the minimum hash of each sliding window of 4 positions — "
    "the selected set is a position-robust fingerprint for plagiarism/"
    "near-dup detection that guarantees a match for any shared run of "
    "≥7 tokens. The window partitions by doc_id (per-document state only), "
    "and the fingerprint set is ~1/4 the gram count before the final agg.",
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.packing import winnow_fingerprints

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    winnowed = winnow_fingerprints(docs, "doc_id", "text", k=4, w=4).withColumnRenamed(
        "id", "doc_id"
    )
    return winnowed.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


@register(
    "consistent_group_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id)
               AS rk
      FROM documents
    )
    SELECT lang, doc_id, rk::BIGINT AS rk
    FROM ranked WHERE rk <= 5
    """,
    doc="consistent per-group sampling: keep the k=5 documents with the "
    "smallest md5 of their key per language — a deterministic, engine- "
    "and-partitioning-independent 'reservoir' (re-runs and backfills pick "
    "the SAME sample, and growing the corpus only ever swaps members in "
    "hash order, never reshuffles everything — the property random "
    "reservoir sampling lacks). One ranked window per group, top-k via "
    "rank filter",
)
def consistent_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("bigint").alias("rk"))
        .where(F.col("rk") <= 5)
    )


@register(
    "corpus_prep_pipeline",
    oracle=f"""
    WITH clean AS (
      SELECT doc_id, source, n_chars,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
      WHERE trim(text) <> '' AND len({_DUCK_TOKS}) >= 5
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM clean
      ) WHERE rn = 1
    ),
    split AS (
      SELECT *,
             CASE WHEN doc_id % 100 < 80 THEN 'train'
                  WHEN doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split,
             ceil(n_chars / 4)::BIGINT AS est_tokens
      FROM deduped
    ),
    packed AS (
      SELECT split, source, est_tokens,
             CAST(floor((sum(est_tokens) OVER (PARTITION BY split, source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                        / 2048) AS BIGINT) AS bin_id
      FROM split
    ),
    bins AS (
      SELECT split, source, count(DISTINCT bin_id) AS n_bins
      FROM packed GROUP BY split, source
    )
    SELECT p.split,
           count(*) AS n_docs,
           sum(p.est_tokens)::BIGINT AS total_tokens,
           (SELECT sum(n_bins) FROM bins b WHERE b.split = p.split)::BIGINT AS n_bins
    FROM packed p
    GROUP BY p.split
    """,
    doc="END-TO-END corpus preparation: clean (non-empty, ≥5 tokens) → "
    "exact near-normalized dedup (whitespace/case-insensitive fingerprint, "
    "min-id survivor) → deterministic train/val/test split → per-(split, "
    "source) sequence packing at 2048 tokens → per-split summary. The "
    "capstone composition a user of the reference would run as N chained "
    "map/reduce jobs with manual intermediate files — here one declarative "
    "plan (4 logical stages, 3 shuffles: fingerprint, packing window, "
    "summary agg) that Catalyst pipelines end-to-end; every stage is "
    "individually conformance-tested (quality_score, dedup_fingerprint, "
    "corpus_split, pack_sequences)",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from map_reduce_engine_spark.operators.packing import pack_bins

    docs = t(spark, sf_dir, "documents")
    clean = docs.where(
        (F.trim("text") != "") & (F.size(tokens_col("text")) >= 5)
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        clean.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    split = deduped.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 100 < 80, "train")
        .when(F.col("doc_id") % 100 < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.ceil(F.col("n_chars") / 4).cast("bigint").alias("est_tokens"),
    )
    packed = pack_bins(
        split.withColumn("grp", F.concat_ws("|", "split", "source")),
        "grp",
        "doc_id",
        "est_tokens",
        budget=2048,
    )
    # one partial aggregate per (split, source), then a rollup to split level
    # — no join, two chained shuffles (the second over |splits|×|sources| rows)
    per_group = packed.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("est_tokens").alias("total_tokens"),
        F.countDistinct("bin_id").alias("n_bins"),
    )
    return per_group.groupBy("split").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("n_bins").alias("n_bins"),
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffle + sharding, token-budget selection,
# length-bucketed batching
# --------------------------------------------------------------------------

# engine-portable 32-bit hash: md5 prefix as bigint (see base.py conventions)
_DUCK_EPOCH_H = "('0x' || substr(md5('epoch7:' || doc_id::VARCHAR), 1, 8))::BIGINT"
_SPARK_EPOCH_H = (
    "cast(conv(substr(md5(concat('epoch7:', cast(doc_id as string))), 1, 8), 16, 10)"
    " as bigint)"
)


@register(
    "epoch_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_DUCK_EPOCH_H} AS hv FROM documents
    )
    SELECT doc_id,
           (hv % 8)::BIGINT AS shard,
           (row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id))::BIGINT
             AS pos_in_shard
    FROM h
    """,
    doc="deterministic epoch shuffle + sharding: every document gets a "
    "pseudorandom but REPRODUCIBLE position — hash('epoch7:'||id) picks "
    "both the shard (h % 8) and the order within it. Global epoch order "
    "is (shard, pos_in_shard) lexicographic, so the total order is "
    "computed with ONE shard-partitioned window — never a global "
    "row_number, whose single-partition sort is the classic 100 TB "
    "anti-pattern. Same seed → same order on any engine, run, or "
    "cluster size (the md5-prefix hash is engine-portable, unlike "
    "xxhash64 which DuckDB lacks); a new epoch is just a new salt",
)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.expr(_SPARK_EPOCH_H).alias("hv")).withColumn(
        "shard", F.col("hv") % 8
    )
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


@register(
    "token_budget_selection",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, source,
             len({_DUCK_TOKS})::BIGINT AS n_tokens
      FROM documents WHERE trim(text) <> ''
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY n_tokens DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
      FROM n
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 800
    """,
    doc="corpus selection under a per-domain token budget: rank each "
    "source's documents (longest-first, id tiebreak — any deterministic "
    "quality order slots in), take the running-token prefix that fits "
    "800 tokens. The greedy knapsack every pretraining mixture runs when "
    "a domain over-delivers. One shuffle on source; the running sum is a "
    "source-partitioned window, so per-task state is one domain's docs — "
    "at 100 TB budgets bind per (source, date) partition keeping groups "
    "bounded. All-integer output: no float rounding to disagree on",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    n = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col("text")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        n.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= 800)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
    )


@register(
    "length_bucket_batches",
    oracle=f"""
    WITH n AS (
      SELECT doc_id,
             len({_DUCK_TOKS})::BIGINT AS n_tokens
      FROM documents WHERE trim(text) <> ''
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= 16 THEN 16
                  WHEN n_tokens <= 32 THEN 32
                  WHEN n_tokens <= 64 THEN 64
                  ELSE 128 END AS bucket,
             (row_number() OVER (PARTITION BY
                 CASE WHEN n_tokens <= 16 THEN 16
                      WHEN n_tokens <= 32 THEN 32
                      WHEN n_tokens <= 64 THEN 64
                      ELSE 128 END
                 ORDER BY doc_id) - 1) // 8 AS batch_idx
      FROM n
    )
    SELECT bucket::BIGINT AS bucket,
           batch_idx::BIGINT AS batch_idx,
           count(*)::BIGINT AS n_docs,
           max(n_tokens) AS max_len,
           sum(n_tokens)::BIGINT AS batch_tokens,
           (count(*) * max(n_tokens) - sum(n_tokens))::BIGINT AS pad_tokens
    FROM b GROUP BY bucket, batch_idx
    ORDER BY bucket, batch_idx
    """,
    doc="length-bucketed batching: bucket documents by token length "
    "(16/32/64/128 ceilings), number fixed-size batches of 8 within each "
    "bucket, and account padding waste exactly — pad_tokens = "
    "n_docs*max_len - sum(len), the tokens a padded-batch trainer burns. "
    "The op every packing-free finetune/inference pipeline runs to keep "
    "padding ~O(bucket width) instead of O(global max). Bucketing is a "
    "pure projection; batch numbering is a bucket-partitioned window "
    "(4 buckets × bounded rows per task at any corpus size when "
    "composed with a shard key, as in epoch_shuffle_shards). Integer "
    "outputs only — bit-identical on any engine",
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    n = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    bucket = (
        F.when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .otherwise(128)
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        n.withColumn("bucket", bucket)
        .withColumn("batch_idx", ((F.row_number().over(w) - F.lit(1)) / 8).cast("bigint"))
        .groupBy("bucket", "batch_idx")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("batch_tokens"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens")).alias("pad_tokens"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "batch_idx",
            "n_docs",
            "max_len",
            "batch_tokens",
            "pad_tokens",
        )
        .orderBy("bucket", "batch_idx")
    )


# --------------------------------------------------------------------------
# Quality filter funnel, priority sampling, unigram LM scoring, dataset card
# --------------------------------------------------------------------------


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH d AS (
      SELECT trim(text) <> '' AS c1,
             len({_DUCK_TOKS}) >= 5 AS c2,
             2 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) >= length(text)
               AS c3,
             10 * len(list_distinct({_DUCK_TOKS})) >= 3 * len({_DUCK_TOKS}) AS c4
      FROM documents
    ),
    s AS (
      SELECT count(*) AS s0,
             count(*) FILTER (c1) AS s1,
             count(*) FILTER (c1 AND c2) AS s2,
             count(*) FILTER (c1 AND c2 AND c3) AS s3,
             count(*) FILTER (c1 AND c2 AND c3 AND c4) AS s4
      FROM d
    )
    SELECT 'ingest' AS stage, s0 AS survivors FROM s
    UNION ALL SELECT 'nonempty', s1 FROM s
    UNION ALL SELECT 'min_tokens', s2 FROM s
    UNION ALL SELECT 'alpha_ratio', s3 FROM s
    UNION ALL SELECT 'type_token_ratio', s4 FROM s
    """,
    doc="staged quality-filter funnel with per-stage survivor accounting: "
    "nonempty → ≥5 tokens → ≥50% alphabetic chars → type-token ratio ≥0.3 "
    "(Gopher-style repetition gate). Every production corpus pipeline "
    "publishes this table — it is how you notice one filter silently "
    "eating the corpus. All thresholds compare in INTEGER arithmetic "
    "(2*alpha ≥ len, 10*distinct ≥ 3*tokens): no float ratio for engines "
    "to round differently. One scan, one 5-counter aggregate (conditional "
    "partial aggs, no shuffle of document text), then a 5-row unpivot.",
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    c1 = F.trim("text") != ""
    c2 = c1 & (F.size(toks) >= 5)
    c3 = c2 & (
        2 * F.length(F.regexp_replace("text", "[^A-Za-z]", "")) >= F.length("text")
    )
    c4 = c3 & (10 * F.size(F.array_distinct(toks)) >= 3 * F.size(toks))
    agg = docs.agg(
        F.count("*").alias("s0"),
        F.sum(c1.cast("long")).alias("s1"),
        F.sum(c2.cast("long")).alias("s2"),
        F.sum(c3.cast("long")).alias("s3"),
        F.sum(c4.cast("long")).alias("s4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 'ingest', s0, 'nonempty', s1, 'min_tokens', s2, "
            "'alpha_ratio', s3, 'type_token_ratio', s4) as (stage, survivors)"
        )
    )


_DUCK_WPS_H = "('0x' || substr(md5('wps:' || doc_id::VARCHAR), 1, 8))::BIGINT"
_SPARK_WPS_H = (
    "cast(conv(substr(md5(concat('wps:', cast(doc_id as string))), 1, 8), 16, 10)"
    " as bigint)"
)


@register(
    "weighted_priority_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             {_DUCK_WPS_H}::DOUBLE / n_chars AS k
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
               AS rank
      FROM keyed
    )
    SELECT source, rank::BIGINT AS rank, doc_id, n_chars
    FROM ranked WHERE rank <= 8
    """,
    doc="priority sampling (Duffield, Lund & Thorup, JACM'07): per-source "
    "weighted sample of 8 docs — key = uniform_hash/weight, keep the 8 "
    "smallest keys, so selection probability scales with weight (n_chars "
    "here; any quality score slots in). Unlike rand()-seeded sampling the "
    "sample is engine/partitioning/run-independent: the md5-prefix hash is "
    "portable, and the key arithmetic is one int→double conversion plus "
    "one IEEE-exact division — bit-identical on every engine, unlike "
    "ln/pow-based Efraimidis-Spirakis keys. Per-source top-k is a "
    "partitioned window (bounded state); no global sort.",
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.expr(_SPARK_WPS_H).cast("double") / F.col("n_chars")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 8)
        .select("source", "rank", "doc_id", "n_chars")
    )


@register(
    "unigram_lm_surprisal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_DUCK_TOKS}) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    lm AS (
      SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ),
    scored AS (
      SELECT t.doc_id, t.source,
             avg(-ln(lm.cnt::DOUBLE / (SELECT count(*) FROM toks)))
               AS doc_surprisal
      FROM toks t JOIN lm USING (tok)
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(doc_surprisal), 4) AS avg_surprisal
    FROM scored GROUP BY source
    """,
    doc="unigram language-model surprisal score: fit the corpus unigram LM "
    "(one token-count aggregate), score each document as its mean negative "
    "log-probability, report per-source averages. The classic cheap "
    "quality/outlier signal — boilerplate scores low, lorem-ipsum noise "
    "scores high — and the self-scoring degenerate case of the perplexity "
    "filters (CCNet-style) every corpus pipeline runs. Two shuffles "
    "(LM fit, per-doc score); the LM join broadcasts at any corpus size "
    "where the vocabulary ≪ corpus (Heaps' law). Rounded to 4 decimals "
    "after two averaging levels: summation-order float noise (~1e-13) "
    "cannot reach the rounded grid.",
)
def unigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select("doc_id", "source", F.explode(tokens_col("text")).alias("tok"))
    # corpus token total rides along as a 1-row broadcast (the repo-standard
    # pattern) — not a driver-side .count(), which would run an extra job
    # re-tokenizing the corpus just to fetch one scalar
    total = toks.agg(F.count("*").cast("double").alias("__total"))
    lm = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    scored = (
        toks.join(F.broadcast(lm), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(
            F.avg(-F.log(F.col("cnt").cast("double") / F.col("__total"))).alias("doc_surprisal")
        )
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("doc_surprisal"), 4).alias("avg_surprisal"),
    )


@register(
    "dataset_card",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             len({_DUCK_TOKS})::BIGINT AS n_tokens,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE trim(text) <> ''
    )
    SELECT source,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           round(sum(n_tokens)::DOUBLE / count(*), 2) AS avg_tokens,
           count(DISTINCT lang) AS n_langs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 4) AS dup_rate
    FROM d GROUP BY source
    """,
    doc="per-source dataset card: doc/token counts, token-length profile, "
    "language spread, and exact-duplicate rate (1 - distinct normalized "
    "fingerprints / docs). The summary table a dataset release publishes "
    "next to the data. One scan + one aggregate; the two COUNT DISTINCTs "
    "are per-source partial aggregates (lang is tiny, fingerprints "
    "map-side-dedup before the shuffle). Ratios divide exact integers — "
    "IEEE division is exactly rounded, so bits match across engines "
    "before the display rounding.",
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens_col("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fp"),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens").cast("double") / F.count("*"), 2).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(
            F.lit(1.0) - F.countDistinct("fp").cast("double") / F.count("*"), 4
        ).alias("dup_rate"),
    )


@register(
    "doc_chunking",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, len({_DUCK_TOKS})::BIGINT AS n_tokens
      FROM documents WHERE trim(text) <> ''
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= 64 THEN 1
                  ELSE 1 + ((n_tokens - 64 + 31) // 32) END AS n_chunks
      FROM n
    )
    SELECT doc_id,
           unnest(range(n_chunks))::BIGINT AS chunk_idx,
           (unnest(range(n_chunks)) * 32)::BIGINT AS chunk_start,
           least(64, n_tokens - unnest(range(n_chunks)) * 32)::BIGINT
             AS chunk_len
    FROM c
    """,
    doc="sliding-window document chunking (64-token windows, stride 32): "
    "the projection every RAG/embedding pipeline runs before encoding — "
    "each doc yields ceil-spaced overlapping chunks, the last one "
    "truncated. Chunk count/starts/lengths are pure integer arithmetic "
    "from the per-doc token count: a narrow (doc_id, n_tokens) projection "
    "explodes to chunk rows with NO shuffle at all — chunking is "
    "embarrassingly parallel and stays inside one whole-stage-codegen "
    "span per input partition.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    n = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    n_chunks = F.when(F.col("n_tokens") <= 64, F.lit(1)).otherwise(
        1 + F.floor((F.col("n_tokens") - 64 + 31) / 32)
    )
    return (
        n.withColumn("n_chunks", n_chunks)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * 32).cast("bigint").alias("chunk_start"),
            F.least(F.lit(64), F.col("n_tokens") - F.col("chunk_idx") * 32)
            .cast("bigint")
            .alias("chunk_len"),
        )
    )


@register(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    lm AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM lm
    ),
    tot AS (SELECT sum(cnt) AS total FROM lm)
    SELECT pct::BIGINT AS coverage_pct,
           (SELECT min(rank) FROM ranked, tot
            WHERE cum * 100 >= total * pct)::BIGINT AS vocab_size
    FROM (SELECT unnest([50, 90, 99]) AS pct)
    """,
    doc="tokenizer vocabulary coverage curve: the smallest top-frequency "
    "vocabulary covering 50/90/99% of token occurrences — the number every "
    "tokenizer-budget decision starts from (Zipf: a tiny head covers half "
    "the corpus, the 99% tail is huge). The ordered cumulative window runs "
    "over the VOCABULARY (Heaps' law: ~corpus^0.5 distinct tokens), never "
    "the corpus — the only global sort in the plan is over that bounded "
    "set, and the answer is 3 rows from one conditional-min aggregate.",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(F.explode(tokens_col("text")).alias("tok"))
    lm = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = (
        Window.orderBy(F.desc("cnt"), "tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = lm.select(
        "cnt",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.col("tok"))).alias("rank"),
        F.sum("cnt").over(w).alias("cum"),
    )
    # corpus token total folded into the plan as a broadcast scalar (the
    # pattern at corpus_mixture below) — no driver-side collect, one job
    total = lm.agg(F.sum("cnt").alias("total"))
    agg = ranked.crossJoin(F.broadcast(total)).agg(
        *[
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * pct, F.col("rank"))
            ).alias(f"v{pct}")
            for pct in (50, 90, 99)
        ]
    )
    return agg.select(
        F.expr(
            "stack(3, bigint(50), bigint(v50), bigint(90), bigint(v90), "
            "bigint(99), bigint(v99)) as (coverage_pct, vocab_size)"
        )
    )


@register(
    "source_vocab_jaccard",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT source, unnest({_DUCK_TOKS}) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    sizes AS (SELECT source, count(*) AS n FROM v GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS shared_tokens
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s.source_a, s.source_b, s.shared_tokens,
           ((10000 * s.shared_tokens)
            // (sa.n + sb.n - s.shared_tokens))::BIGINT AS jaccard_bp
    FROM shared s
    JOIN sizes sa ON sa.source = s.source_a
    JOIN sizes sb ON sb.source = s.source_b
    """,
    doc="pairwise source-vocabulary Jaccard similarity: which corpus "
    "sources speak the same language (vocabulary overlap), the diagnostic "
    "behind mixture weighting and source-level dedup decisions. Operates "
    "on the distinct (source, token) projection — map-side distinct "
    "before any shuffle — and the token self-join fans out at most "
    "|sources|^2 rows per token, bounded by the source count, not the "
    "corpus. Jaccard is reported in integer basis points (10000·|A∩B| "
    "div |A∪B|) — pure integer arithmetic, nothing for engines to round "
    "differently.",
)
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    v = docs.select("source", F.explode(tokens_col("text")).alias("tok")).distinct()
    sizes = v.groupBy("source").agg(F.count("*").alias("n"))
    a = v.alias("a")
    b = v.alias("b")
    shared = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("shared_tokens"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(F.broadcast(sa), F.col("source_a") == F.col("sa.source"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.source"))
        .select(
            "source_a",
            "source_b",
            "shared_tokens",
            F.expr(
                "(10000 * shared_tokens) div (sa.n + sb.n - shared_tokens)"
            ).alias("jaccard_bp"),
        )
    )


@register(
    "mixture_upsample",
    oracle="""
    WITH c AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source),
    tot AS (
      SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS s FROM c
    ),
    f AS (
      SELECT c.source, (tot.total * 1.0 / tot.s) / c.n AS factor
      FROM c, tot
    ),
    d AS (
      SELECT doc_id, d.source, factor,
             floor(factor)::INT AS nfull,
             factor - floor(factor) AS frac,
             (('0x' || substr(md5('mix:' || doc_id), 1, 8))::BIGINT & 2147483647)
               / 2147483648.0 AS u
      FROM documents d JOIN f ON f.source = d.source
    ),
    copies AS (
      SELECT doc_id, source, nfull + CASE WHEN u < frac THEN 1 ELSE 0 END AS n_copies
      FROM d
    )
    SELECT doc_id, source, unnest(generate_series(1, n_copies))::INT AS copy_id
    FROM copies WHERE n_copies >= 1
    """,
    doc="epoch-weighted mixture resampling toward uniform source shares, "
    "UP and down in one formula: repeat factor = target_share/actual "
    "(may exceed 1 — books-style upsampling), each doc gets "
    "floor(factor) full copies plus one more iff its portable-hash "
    "uniform falls under the fractional part — so a 0.4x source keeps a "
    "deterministic 40% and a 2.5x source emits 2 copies plus a "
    "deterministic extra 50%. Copy manifest is engine/run/partitioning "
    "independent (md5 hash, not RNG); the factor table is "
    "|sources|-sized → broadcast; explode fan-out equals the target "
    "epoch count. Completes domain_mixture (downsample-only) with the "
    "upsampling half every pretraining mixture needs",
)
def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.dedup import portable_base31

    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum("n").cast("bigint").alias("total"), F.count("*").cast("bigint").alias("s")
    )
    f = c.crossJoin(F.broadcast(tot)).select(
        "source", ((F.col("total") * 1.0 / F.col("s")) / F.col("n")).alias("factor")
    )
    d = (
        docs.select("doc_id", "source")
        .join(F.broadcast(f), "source")
        .withColumn("nfull", F.floor("factor").cast("int"))
        .withColumn("frac", F.col("factor") - F.floor("factor"))
        .withColumn(
            "u",
            portable_base31(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            / F.lit(float(1 << 31)),
        )
        .withColumn(
            "n_copies",
            F.col("nfull") + F.when(F.col("u") < F.col("frac"), 1).otherwise(0),
        )
    )
    return (
        d.where(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr("sequence(1, n_copies)")).alias("copy_id0"),
        )
        .select("doc_id", "source", F.col("copy_id0").cast("int").alias("copy_id"))
    )


@register(
    "contrastive_negatives",
    oracle="""
    WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    cand AS (
      SELECT d.doc_id AS anchor_id, j,
             (('0x' || substr(md5('neg:' || d.doc_id || ':' || j), 1, 8))::BIGINT
              & 2147483647) % n.n_docs AS neg_id
      FROM documents d, n, unnest(generate_series(1, 4)) AS t(j)
    )
    SELECT c.anchor_id, c.j::BIGINT AS j, c.neg_id AS negative_id,
           nd.source AS negative_source
    FROM cand c JOIN documents nd ON nd.doc_id = c.neg_id
    WHERE c.neg_id <> c.anchor_id
    """,
    doc="deterministic negative sampling for contrastive training "
    "(word2vec/CLIP-style): each anchor gets 4 pseudo-random negatives "
    "drawn by portable hash of (anchor, slot) modulo the corpus size — "
    "the manifest is reproducible across engines, runs, and "
    "partitionings (auditable training data, unlike RNG draws), "
    "self-pairs filtered, and the candidate ids resolve through an "
    "equi-join against the corpus (ids that do not exist drop out "
    "gracefully rather than assuming dense keys). Corpus size rides "
    "along as a 1-row broadcast; the fan-out is k× the anchor count, "
    "never quadratic",
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.dedup import portable_base31

    docs = t(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    cand = (
        docs.select(F.col("doc_id").alias("anchor_id"))
        .crossJoin(F.broadcast(n))
        .withColumn("j", F.explode(F.expr("sequence(1, 4)")))
        .withColumn(
            "neg_id",
            portable_base31(
                F.concat(
                    F.lit("neg:"),
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            )
            % F.col("n_docs"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    nd = docs.select(F.col("doc_id").alias("neg_id"), F.col("source").alias("negative_source"))
    return cand.join(nd, "neg_id").select(
        "anchor_id",
        F.col("j").cast("bigint").alias("j"),
        F.col("neg_id").alias("negative_id"),
        "negative_source",
    )


@register(
    "bigram_lm_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS tk
      FROM documents WHERE trim(text) <> ''
    ),
    pos AS (
      SELECT doc_id, source, tk, unnest(generate_series(2, len(tk))) AS i FROM toks
    ),
    pairs AS (
      SELECT doc_id, source, tk[i-1] AS w1, tk[i] AS w2 FROM pos
    ),
    big AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, count(*) AS cc FROM pairs GROUP BY w1),
    vocab AS (SELECT count(DISTINCT u.tok) AS v
              FROM (SELECT unnest(tk) AS tok FROM toks) u),
    scored AS (
      SELECT p.doc_id, p.source,
             avg(-ln((b.cb + 0.5) / (c.cc + 0.5 * vocab.v))) AS doc_nll
      FROM pairs p
      JOIN big b USING (w1, w2)
      JOIN ctx c USING (w1)
      CROSS JOIN vocab
      GROUP BY p.doc_id, p.source
    )
    SELECT source, count(*) AS n_docs, round(avg(doc_nll), 4) AS avg_nll
    FROM scored GROUP BY source
    """,
    doc="bigram language-model quality score (the KenLM-style upgrade of "
    "unigram_lm_surprisal, the CCNet/perplexity-filter shape): fit "
    "add-0.5-smoothed bigram conditionals P(w2|w1) = (C(w1w2)+a)/(C(w1)+aV) "
    "on the corpus itself, score each document as its mean bigram negative "
    "log-probability, report per-source averages. Bigram pairs come from a "
    "guarded transform(sequence(...)) over the token array inside one "
    "codegen projection — zero positional self-joins (the token_pmi "
    "discipline); the bigram/context/vocab tables are vocabulary-sized "
    "broadcasts (Heaps' law), so the corpus shuffles only for the two "
    "count aggregates. Docs with <2 tokens carry no bigrams and drop out "
    "identically in both engines (Spark's descending sequence(2,1) is "
    "guarded; DuckDB's generate_series(2,1) is empty).",
)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    tk = tokens_col("text")
    empty_pairs = F.array().cast("array<struct<w1:string,w2:string>>")
    bi = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(tk)),
            lambda i: F.struct(
                F.element_at(tk, i - 1).alias("w1"), F.element_at(tk, i).alias("w2")
            ),
        ),
    ).otherwise(empty_pairs)
    pairs = docs.select("doc_id", "source", F.explode(bi).alias("p")).select(
        "doc_id", "source", "p.w1", "p.w2"
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx = pairs.groupBy("w1").agg(F.count("*").alias("cc"))
    vocab = (
        docs.select(F.explode(tk).alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("v"))
    )
    scored = (
        pairs.join(F.broadcast(big), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.avg(
                -F.log((F.col("cb") + 0.5) / (F.col("cc") + 0.5 * F.col("v")))
            ).alias("doc_nll")
        )
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.round(F.avg("doc_nll"), 4).alias("avg_nll")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS sz
      FROM customer GROUP BY 1, 2
    )
    SELECT count(*) AS n_groups,
           sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END)::BIGINT AS groups_below_k,
           min(sz) AS min_group_size,
           sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT AS rows_at_risk,
           round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::DOUBLE / sum(sz), 4)
             AS at_risk_share
    FROM g
    """,
    doc="k-anonymity audit (k=5) over the (nation, market segment) "
    "quasi-identifier: group-size census reporting how many equivalence "
    "classes fall below k, the smallest class, and the share of rows "
    "re-identifiable through the quasi-identifier — the release gate a "
    "training corpus with joined user metadata runs before export. One "
    "hash aggregate over the quasi-identifier + one 5-counter rollup; "
    "constant-size answer at any corpus size",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("sz"))
    below = F.when(F.col("sz") < 5, 1).otherwise(0)
    risk = F.when(F.col("sz") < 5, F.col("sz")).otherwise(F.lit(0))
    return g.agg(
        F.count("*").alias("n_groups"),
        F.sum(below).cast("bigint").alias("groups_below_k"),
        F.min("sz").alias("min_group_size"),
        F.sum(risk).cast("bigint").alias("rows_at_risk"),
        F.round(F.sum(risk) / F.sum("sz"), 4).alias("at_risk_share"),
    )


@register(
    "psi_drift",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN o_totalprice < 50000 THEN 0
                  WHEN o_totalprice < 100000 THEN 1
                  WHEN o_totalprice < 150000 THEN 2
                  WHEN o_totalprice < 200000 THEN 3
                  WHEN o_totalprice < 250000 THEN 4
                  ELSE 5 END AS bucket,
             CASE WHEN month(o_orderdate::DATE) <= 6 THEN 'h1' ELSE 'h2' END AS half
      FROM orders
    ),
    c AS (
      SELECT bucket,
             sum(CASE WHEN half = 'h1' THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN half = 'h2' THEN 1 ELSE 0 END) AS n2
      FROM b GROUP BY 1
    ),
    tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM c),
    p AS (
      SELECT bucket, (n1 + 1)::DOUBLE / (t1 + 6) AS p1, (n2 + 1)::DOUBLE / (t2 + 6) AS p2
      FROM c, tot
    )
    SELECT count(*) AS n_buckets,
           round(sum((p1 - p2) * ln(p1 / p2)), 6) AS psi
    FROM p
    """,
    doc="population stability index between order-value distributions of "
    "the year's two halves: fixed price buckets, add-one smoothing "
    "(denominator +n_buckets) so empty cells can't produce log(0), "
    "PSI = sum((p1-p2)*ln(p1/p2)). The standard pre-deploy drift gate "
    "(<0.1 stable, >0.25 drifted) as two aggregates and a 6-row "
    "broadcast — constant-size answer at any scale. Wall-clock month split "
    "is computed on the DATE cast, so it is session-timezone independent",
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    bucket = (
        F.when(price < 50000, 0)
        .when(price < 100000, 1)
        .when(price < 150000, 2)
        .when(price < 200000, 3)
        .when(price < 250000, 4)
        .otherwise(5)
    )
    half = F.when(F.month(F.col("o_orderdate").cast("date")) <= 6, "h1").otherwise("h2")
    c = (
        orders.select(bucket.alias("bucket"), half.alias("half"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "h1", 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("half") == "h2", 1).otherwise(0)).alias("n2"),
        )
    )
    tot = c.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    p = c.crossJoin(F.broadcast(tot)).select(
        "bucket",
        ((F.col("n1") + 1) / (F.col("t1") + 6)).alias("p1"),
        ((F.col("n2") + 1) / (F.col("t2") + 6)).alias("p2"),
    )
    return p.agg(
        F.count("*").alias("n_buckets"),
        F.round(F.sum((F.col("p1") - F.col("p2")) * F.log(F.col("p1") / F.col("p2"))), 6).alias("psi"),
    )


@register(
    "pii_pseudonymize_join",
    oracle="""
    WITH c AS (
      SELECT md5('cust|' || c_custkey::VARCHAR) AS pseudo, c_mktsegment
      FROM customer
    ),
    o AS (
      SELECT md5('cust|' || o_custkey::VARCHAR) AS pseudo FROM orders
    ),
    j AS (
      SELECT c.c_mktsegment, count(*) AS n_orders
      FROM o JOIN c ON c.pseudo = o.pseudo
      GROUP BY 1
    ),
    inj AS (
      SELECT (count(DISTINCT pseudo) = count(*)) AS injective FROM c
    )
    SELECT j.c_mktsegment, j.n_orders, inj.injective
    FROM j, inj
    """,
    doc="consistent pseudonymization: the PII key (custkey) is replaced by "
    "a keyed-hash pseudonym IDENTICALLY on every table that carries it, so "
    "analytic joins still work on the pseudonymized corpus — per-segment "
    "order counts computed ENTIRELY through the pseudonym join equal the "
    "raw-key join's, and the output carries an injectivity check "
    "(distinct pseudonyms == distinct keys; a collision would merge "
    "customers and skew counts). The release-side complement to pii_scrub "
    "(which redacts free text) and k_anonymity_audit (which gates "
    "quasi-identifiers); deterministic, so re-ingested batches map "
    "consistently at any scale",
)
def pii_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    pseudo = lambda col: F.md5(F.concat(F.lit("cust|"), F.col(col).cast("string")))  # noqa: E731
    c = cust.select(pseudo("c_custkey").alias("pseudo"), "c_mktsegment")
    o = orders.select(pseudo("o_custkey").alias("pseudo"))
    j = o.join(c, "pseudo").groupBy("c_mktsegment").agg(F.count("*").alias("n_orders"))
    inj = c.agg(
        (F.countDistinct("pseudo") == F.count("*")).alias("injective")
    )
    return j.crossJoin(F.broadcast(inj))


@register(
    "dp_noisy_counts",
    oracle="""
    WITH g AS (
      SELECT lang, source, count(*) AS c,
             ('0x' || substr(md5('dp:' || lang || '|' || source), 1, 8))::BIGINT
               & 2147483647 AS h
      FROM documents GROUP BY 1, 2
    ),
    u AS (
      SELECT lang, source, c,
             (h::DOUBLE + 0.5) / 2147483648.0::DOUBLE - 0.5::DOUBLE AS u
      FROM g
    )
    SELECT lang, source,
           round(c::DOUBLE - sign(u) * ln(1.0 - 2.0 * abs(u)), 3) AS noisy_count,
           1.0::DOUBLE AS epsilon
    FROM u
    """,
    doc="differentially-private release counts (Laplace mechanism, eps=1, "
    "sensitivity 1) over the corpus (lang, source) census: noise drawn by "
    "inverse-CDF from the engine-portable md5 hash of the group key, so the "
    "release is deterministic, reproducible, and identical across engines "
    "— the publish-side companion to k_anonymity_audit. One hash aggregate; "
    "noise is a scalar expression per group, constant-size release",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.dedup import portable_base31

    docs = t(spark, sf_dir, "documents")
    eps = 1.0
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
    h = portable_base31(F.concat(F.lit("dp:"), F.col("lang"), F.lit("|"), F.col("source")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(2147483648.0) - F.lit(0.5)
    noise = -(1.0 / eps) * F.signum(u) * F.log(F.lit(1.0) - 2.0 * F.abs(u))
    return g.select(
        "lang",
        "source",
        F.round(F.col("c").cast("double") + noise, 3).alias("noisy_count"),
        F.lit(eps).alias("epsilon"),
    )


@register(
    "chi2_independence",
    oracle="""
    WITH o AS (
      SELECT lang, source, count(*) AS obs FROM documents GROUP BY lang, source
    ),
    rows_ AS (SELECT lang, sum(obs) AS rl FROM o GROUP BY lang),
    cols_ AS (SELECT source, sum(obs) AS cs FROM o GROUP BY source),
    tot AS (SELECT sum(obs) AS n FROM o),
    cells AS (
      SELECT o.lang, o.source, o.obs,
             rl::DOUBLE * cs::DOUBLE / n::DOUBLE AS exp
      FROM o JOIN rows_ USING (lang) JOIN cols_ USING (source) CROSS JOIN tot
    )
    SELECT count(*)::BIGINT AS n_cells,
           sum(CAST(round(1000000.0 * (obs::DOUBLE - exp) * (obs::DOUBLE - exp) / exp)
               AS BIGINT))::BIGINT AS chi2_micro,
           ((SELECT count(*) FROM rows_) - 1) * ((SELECT count(*) FROM cols_) - 1)
             AS dof
    FROM cells
    """,
    doc="chi-square independence test for the (lang × source) contingency "
    "table: observed/expected from one hash aggregate plus broadcast "
    "marginals; each cell's contribution is rounded to integer "
    "MICRO-units before summing, so the statistic is an exact BIGINT sum "
    "(cross-engine float sums differ at the ulp; integer sums cannot). "
    "Constant-size answer; the corpus-composition drift test alongside "
    "psi_drift",
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count("*").alias("obs"))
    rows_ = o.groupBy("lang").agg(F.sum("obs").alias("rl"))
    cols_ = o.groupBy("source").agg(F.sum("obs").alias("cs"))
    tot = o.agg(F.sum("obs").alias("n"))
    cells = (
        o.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "obs",
            (F.col("rl").cast("double") * F.col("cs").cast("double") / F.col("n").cast("double")).alias("exp"),
        )
    )
    contrib = F.round(
        F.lit(1000000.0)
        * (F.col("obs").cast("double") - F.col("exp"))
        * (F.col("obs").cast("double") - F.col("exp"))
        / F.col("exp")
    ).cast("bigint")
    dof_r = rows_.agg((F.count("*") - 1).alias("dr"))
    dof_c = cols_.agg((F.count("*") - 1).alias("dc"))
    return (
        cells.agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(contrib).alias("chi2_micro"),
        )
        .crossJoin(F.broadcast(dof_r))
        .crossJoin(F.broadcast(dof_c))
        .select("n_cells", "chi2_micro", (F.col("dr") * F.col("dc")).alias("dof"))
    )


@register(
    "spearman_rank_corr",
    oracle="""
    WITH e AS (
      SELECT event_type, extract(hour FROM ts)::BIGINT AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    r AS (
      SELECT event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY x)
               + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
             2 * rank() OVER (PARTITION BY event_type ORDER BY y)
               + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
      FROM e
    ),
    m AS (
      SELECT event_type, count(*) AS n,
             sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
             AS spearman_rho
    FROM m
    """,
    doc="Spearman rank correlation (value vs hour-of-day per event type): "
    "tie-averaged ranks are kept EXACT by doubling them "
    "(2*rank + ties - 1 is always an integer), then Pearson's closed "
    "form runs on BIGINT sufficient statistics — one window pass + one "
    "hash aggregate, deterministic across engines. The robust "
    "(monotonic, outlier-insensitive) companion to correlation_matrix's "
    "Pearson",
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    wx = Window.partitionBy("event_type").orderBy("x")
    wy = Window.partitionBy("event_type").orderBy("y")
    r = e.select(
        "event_type",
        (2 * F.rank().over(wx) + F.count("*").over(Window.partitionBy("event_type", "x")) - 1)
        .cast("bigint")
        .alias("rx"),
        (2 * F.rank().over(wy) + F.count("*").over(Window.partitionBy("event_type", "y")) - 1)
        .cast("bigint")
        .alias("ry"),
    )
    m = r.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select("event_type", "n", F.round(rho, 6).alias("spearman_rho"))


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(round(o_totalprice * 100) AS BIGINT)::VARCHAR, 1, 1)::BIGINT
               AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    o AS (SELECT digit, count(*) AS observed FROM d GROUP BY digit),
    n AS (SELECT sum(observed)::BIGINT AS total FROM o)
    SELECT o.digit, o.observed,
           CAST(1000000 * o.observed // n.total AS BIGINT) AS observed_ppm,
           CAST(round(1000000.0 * ln(1.0 + 1.0 / o.digit) / ln(10.0)) AS BIGINT)
             AS benford_ppm,
           CAST(1000000 * o.observed // n.total
             - CAST(round(1000000.0 * ln(1.0 + 1.0 / o.digit) / ln(10.0)) AS BIGINT)
             AS BIGINT) AS deviation_ppm
    FROM o CROSS JOIN n
    """,
    doc="Benford's-law first-digit audit over order totals: observed "
    "first-significant-digit shares vs the log10(1+1/d) expectation, in "
    "integer parts-per-million (the fraud/synthetic-data smell test an "
    "ingest pipeline runs on money columns). Digit extraction is string "
    "arithmetic on exact cents — no logs on data, only on the 9 "
    "constants — one hash aggregate plus a broadcast total",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = orders.select(
        F.substring(F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    o = d.groupBy("digit").agg(F.count("*").alias("observed"))
    n = o.agg(F.sum("observed").alias("total"))
    benford_ppm = F.round(
        F.lit(1000000.0) * F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    ).cast("bigint")
    return (
        o.crossJoin(F.broadcast(n))
        .select(
            "digit",
            "observed",
            F.expr("1000000 * observed div total").alias("observed_ppm"),
            benford_ppm.alias("benford_ppm"),
            (F.expr("1000000 * observed div total") - benford_ppm).alias("deviation_ppm"),
        )
    )


@register(
    "geometric_mean_prices",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(1000000.0 * ln(CAST(round(o_totalprice * 100) AS BIGINT)))
                  AS BIGINT) AS ln_micro
      FROM orders WHERE o_totalprice > 0
    )
    SELECT o_orderpriority, count(*) AS n,
           sum(ln_micro)::BIGINT AS sum_ln_micro,
           round(exp(sum(ln_micro)::DOUBLE / count(*)::DOUBLE / 1000000.0) / 100.0, 2)
             AS geometric_mean
    FROM c GROUP BY o_orderpriority
    """,
    doc="geometric mean order value per priority class: per-row ln(cents) "
    "rounded to integer MICRO-units (the zipf_law_fit recipe), summed as "
    "exact BIGINTs, exponentiated once per group — so the only "
    "transcendental on the aggregate path is one exp() of an identical "
    "operand, safe at round-2 on price magnitudes. The right average for "
    "multiplicative quantities (price levels, growth rates); one hash "
    "aggregate",
)
def geometric_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    c = orders.select(
        "o_orderpriority",
        F.round(
            F.lit(1000000.0)
            * F.log(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        )
        .cast("bigint")
        .alias("ln_micro"),
    )
    return c.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("ln_micro").alias("sum_ln_micro"),
        F.round(
            F.exp(
                F.sum("ln_micro").cast("double") / F.count("*").cast("double") / F.lit(1000000.0)
            )
            / F.lit(100.0),
            2,
        ).alias("geometric_mean"),
    )


# --------------------------------------------------------------------------
# Temperature-scaled multilingual sampling weights
# --------------------------------------------------------------------------


@register(
    "temperature_mixture_weights",
    oracle="""
    WITH per_lang AS (
      SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_docs)::BIGINT AS total_docs FROM per_lang),
    p AS (
      SELECT lang, n_docs, total_docs,
             CAST(round(1000000000.0 *
                  pow(n_docs::DOUBLE / total_docs::DOUBLE, 0.3)) AS BIGINT)
               AS pw_nano
      FROM per_lang, tot
    ),
    z AS (SELECT sum(pw_nano)::BIGINT AS z_nano FROM p)
    SELECT lang, n_docs,
           10000 * n_docs // total_docs AS share_bp,
           10000 * pw_nano // z_nano AS weight_bp
    FROM p, z
    """,
    doc="temperature-scaled multilingual sampling weights (the mT5/XLM-R "
    "recipe, alpha = 0.3): per-language sampling weight proportional to "
    "share^alpha, flattening the head languages so low-resource ones are "
    "seen more often than their raw share. The one transcendental "
    "(pow) is applied per LANGUAGE (bounded rows) and immediately frozen "
    "to integer nano-units, so the normalizing sum and the output basis "
    "points are exact integer arithmetic on both engines. Plan: one "
    "corpus shuffle on lang, then two 1-row broadcasts.",
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = per_lang.agg(F.sum("n_docs").alias("total_docs"))
    p = per_lang.crossJoin(F.broadcast(tot)).withColumn(
        "pw_nano",
        F.round(
            F.lit(1000000000.0)
            * F.pow(F.col("n_docs").cast("double") / F.col("total_docs").cast("double"), F.lit(0.3))
        ).cast("bigint"),
    )
    z = p.agg(F.sum("pw_nano").alias("z_nano"))
    return p.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.expr("10000 * n_docs div total_docs").alias("share_bp"),
        F.expr("10000 * pw_nano div z_nano").alias("weight_bp"),
    )


# --------------------------------------------------------------------------
# Cluster-safe train/val/test split (leakage guard)
# --------------------------------------------------------------------------


@register(
    "split_leakage_guard",
    oracle="""
    WITH fp AS (SELECT doc_id, sha256(text) AS fp FROM documents),
    cl AS (SELECT fp, min(doc_id) AS canon FROM fp GROUP BY fp),
    asg AS (
      SELECT f.doc_id, f.fp,
             CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT f.doc_id, f.fp,
               ('0x' || substr(md5(c.canon::VARCHAR), 1, 8))::BIGINT % 100 AS h
        FROM fp f JOIN cl c ON c.fp = f.fp
      ) f
    ),
    leaks AS (
      SELECT count(*)::BIGINT AS n_leaks FROM (
        SELECT fp FROM asg GROUP BY fp HAVING count(DISTINCT split) > 1
      )
    )
    SELECT split, count(*)::BIGINT AS n_docs,
           count(DISTINCT fp)::BIGINT AS n_clusters, n_leaks
    FROM asg, leaks GROUP BY split, n_leaks
    """,
    doc="train/val/test assignment at the exact-duplicate-CLUSTER level: "
    "every document hashes to its content fingerprint, each fingerprint "
    "cluster elects its min-id canonical document, and the whole cluster "
    "inherits the split drawn from the portable md5 hash of that canonical "
    "id — so a duplicated document can never sit in train AND test (the "
    "eval-contamination leak that doc-id-modulo splits like corpus_split "
    "permit). The n_leaks column AUDITS the invariant (fingerprints "
    "spanning >1 split; 0 by construction) rather than assuming it. "
    "Plan: one shuffle on the fingerprint, an equi-join back, and a 1-row "
    "leak-count broadcast.",
)
def split_leakage_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("fp"))
    cl = fp.groupBy("fp").agg(F.min("doc_id").alias("canon"))
    h = F.conv(F.substring(F.md5(F.col("canon").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    asg = (
        fp.join(cl, "fp")
        .withColumn("h", h)
        .select(
            "doc_id",
            "fp",
            F.when(F.col("h") < 80, "train")
            .when(F.col("h") < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    leaks = (
        asg.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count("*").alias("n_leaks"))
    )
    return (
        asg.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaks))
        .select("split", "n_docs", "n_clusters", "n_leaks")
    )


# --------------------------------------------------------------------------
# Per-domain token-budget corpus selection
# --------------------------------------------------------------------------


@register(
    "token_budget_select",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len({_DUCK_TOKS})::BIGINT AS n_tok,
             len(list_distinct({_DUCK_TOKS}))::BIGINT AS n_uniq
      FROM documents WHERE trim(text) <> ''
    ),
    scored AS (
      SELECT doc_id, lang, n_tok,
             10000 * n_uniq // n_tok AS uniq_bp
      FROM toks
    ),
    ranked AS (
      SELECT lang, n_tok, uniq_bp,
             CAST(sum(n_tok) OVER (PARTITION BY lang
                                   ORDER BY uniq_bp DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tok
      FROM scored
    )
    SELECT lang,
           count(*) FILTER (WHERE cum_tok <= 5000)::BIGINT AS n_kept,
           coalesce(sum(n_tok) FILTER (WHERE cum_tok <= 5000), 0)::BIGINT
             AS kept_tokens,
           count(*) FILTER (WHERE cum_tok > 5000)::BIGINT AS n_dropped
    FROM ranked GROUP BY lang
    """,
    doc="per-domain token-budget corpus selection: within each language, "
    "documents are ranked by lexical-diversity score (distinct-token "
    "ratio in integer basis points — the cheap quality proxy) and kept "
    "greedily until the domain's token budget (5000) is exhausted — the "
    "knapsack every data-constrained pretraining mix runs, with integer-"
    "exact cumulative sums so the cut line is engine-independent. The "
    "running-sum window partitions by lang (the pack_sequences posture: "
    "state bounded per domain partition, never a global corpus sort).",
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(tokens_col("text")).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(tokens_col("text"))).cast("bigint").alias("n_uniq"),
    )
    scored = toks.select(
        "doc_id", "lang", "n_tok", F.expr("10000 * n_uniq div n_tok").alias("uniq_bp")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("uniq_bp").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.withColumn("cum_tok", F.sum("n_tok").over(w))
    kept = F.col("cum_tok") <= 5000
    return ranked.groupBy("lang").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0)).alias("kept_tokens"),
        F.count(F.when(~kept, 1)).alias("n_dropped"),
    )


# --------------------------------------------------------------------------
# Token-distribution JS divergence between corpus splits
# --------------------------------------------------------------------------


@register(
    "token_js_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % 100 < 80 AS is_train, tok FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS tok
        FROM documents WHERE trim(text) <> ''
      ) WHERE tok <> ''
    ),
    c AS (
      SELECT tok,
             sum(CASE WHEN is_train THEN 1 ELSE 0 END)::BIGINT AS c_tr,
             sum(CASE WHEN is_train THEN 0 ELSE 1 END)::BIGINT AS c_ev
      FROM toks GROUP BY tok
    ),
    n AS (SELECT sum(c_tr)::BIGINT AS n_tr, sum(c_ev)::BIGINT AS n_ev FROM c),
    terms AS (
      SELECT c.tok, c.c_tr, c.c_ev,
             CAST(round(1000000000.0 * (
               CASE WHEN c.c_tr > 0 THEN
                 0.5 * (c.c_tr::DOUBLE / n.n_tr)
                     * ln((c.c_tr::DOUBLE / n.n_tr)
                          / (0.5 * (c.c_tr::DOUBLE / n.n_tr)
                             + 0.5 * (c.c_ev::DOUBLE / n.n_ev)))
               ELSE 0.0 END
               +
               CASE WHEN c.c_ev > 0 THEN
                 0.5 * (c.c_ev::DOUBLE / n.n_ev)
                     * ln((c.c_ev::DOUBLE / n.n_ev)
                          / (0.5 * (c.c_tr::DOUBLE / n.n_tr)
                             + 0.5 * (c.c_ev::DOUBLE / n.n_ev)))
               ELSE 0.0 END)) AS BIGINT) AS term_nano
      FROM c, n
    )
    SELECT (SELECT n_tr FROM n) AS n_train_tokens,
           (SELECT n_ev FROM n) AS n_eval_tokens,
           sum(CASE WHEN c_tr > 0 AND c_ev > 0 THEN 1 ELSE 0 END)::BIGINT
             AS vocab_shared,
           sum(CASE WHEN c_ev = 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_train_only,
           sum(CASE WHEN c_tr = 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_eval_only,
           sum(term_nano)::BIGINT AS js_nano
    FROM terms
    """,
    doc="Jensen-Shannon divergence between the train and eval splits' "
    "token distributions (split = doc_id modulus, the corpus_split "
    "convention): the symmetric, bounded [0, ln 2] drift measure a "
    "pipeline tracks to catch a skewed holdout before training. Zero-"
    "count tokens contribute exactly 0 (JS is defined there, unlike KL). "
    "Each token's term is computed from exact integer counts and frozen "
    "to integer nano-nats, so the vocabulary-sized sum is exact BIGINT "
    "arithmetic — engines cannot disagree. One (token)-keyed aggregate + "
    "a 1-row totals broadcast.",
)
def token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        (F.col("doc_id") % 100 < 80).alias("is_train"),
        F.explode(tokens_col("text")).alias("tok"),
    ).where(F.col("tok") != "")
    c = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("c_tr"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(1)).alias("c_ev"),
    )
    n = c.agg(F.sum("c_tr").alias("n_tr"), F.sum("c_ev").alias("n_ev"))
    p = F.col("c_tr").cast("double") / F.col("n_tr")
    q = F.col("c_ev").cast("double") / F.col("n_ev")
    m = F.lit(0.5) * p + F.lit(0.5) * q
    term = F.when(F.col("c_tr") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("c_ev") > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    terms = c.crossJoin(F.broadcast(n)).select(
        "c_tr",
        "c_ev",
        "n_tr",
        "n_ev",
        F.round(F.lit(1000000000.0) * term).cast("bigint").alias("term_nano"),
    )
    return terms.groupBy("n_tr", "n_ev").agg(
        F.sum(F.when((F.col("c_tr") > 0) & (F.col("c_ev") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_shared"),
        F.sum(F.when(F.col("c_ev") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_train_only"),
        F.sum(F.when(F.col("c_tr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_eval_only"),
        F.sum("term_nano").cast("bigint").alias("js_nano"),
    ).select(
        F.col("n_tr").alias("n_train_tokens"),
        F.col("n_ev").alias("n_eval_tokens"),
        "vocab_shared",
        "vocab_train_only",
        "vocab_eval_only",
        "js_nano",
    )


@register(
    "anova_value_by_type",
    oracle="""
    WITH y AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
    ),
    g AS (
      SELECT event_type,
             count(*)::BIGINT AS n,
             sum(v)::BIGINT   AS s,
             sum(v * v)::BIGINT AS q
      FROM y GROUP BY event_type
    ),
    gg AS (  -- floor(s^2/n) via the (m, r) decomposition: s = m*n + r keeps
             -- every intermediate under 2^63 at any fixture scale
      SELECT event_type, n, s, q,
             (s // n) AS m, (s - (s // n) * n) AS r
      FROM g
    ),
    terms AS (
      SELECT event_type, n, s, q,
             m * m * n + 2 * m * r + (r * r) // n AS s2_over_n
      FROM gg
    ),
    tot AS (
      SELECT count(*)::BIGINT AS k,
             sum(n)::BIGINT AS big_n, sum(s)::BIGINT AS big_s,
             sum(q)::BIGINT AS big_q, sum(s2_over_n)::BIGINT AS sum_s2n
      FROM terms
    ),
    stats AS (
      SELECT k, big_n,
             sum_s2n - (
               (big_s // big_n) * (big_s // big_n) * big_n
               + 2 * (big_s // big_n) * (big_s - (big_s // big_n) * big_n)
               + ((big_s - (big_s // big_n) * big_n)
                  * (big_s - (big_s // big_n) * big_n)) // big_n
             ) AS ssb,
             big_q - sum_s2n AS ssw
      FROM tot
    )
    SELECT k, big_n AS n_rows, ssb::BIGINT AS ssb_cents2, ssw::BIGINT AS ssw_cents2,
           round((CAST(ssb AS DOUBLE) / (k - 1))
                 / (CAST(ssw AS DOUBLE) / (big_n - k)), 6) AS f_stat,
           round(CAST(ssb AS DOUBLE) / (ssb + ssw), 6) AS eta_squared
    FROM stats
    """,
    doc="one-way ANOVA of event value across event types: between/within "
    "sums of squares from per-group sufficient statistics (n, sum, "
    "sum-of-squares — three BIGINTs per group, mergeable map-side like "
    "any sketch partial), F statistic and effect size eta-squared. "
    "Extends ab_welch_test (2 groups) to k groups. All sums are exact "
    "integer cents-squared; floor(s^2/n) uses the (m, r) decomposition "
    "so every intermediate stays under 2^63 in BOTH engines (identical "
    "truncation, engine-independent), and the final F is one scalar "
    "double expression over identical integers. One shuffle to |types| "
    "rows, then a 1-row reduce — corpus size only affects the scan.",
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    y = ev.select("event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"))
    g = y.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    terms = g.select(
        "n",
        "s",
        "q",
        F.expr(
            "(s div n) * (s div n) * n + 2 * (s div n) * (s - (s div n) * n)"
            " + ((s - (s div n) * n) * (s - (s div n) * n)) div n"
        ).alias("s2_over_n"),
    )
    tot = terms.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("big_n"),
        F.sum("s").alias("big_s"),
        F.sum("q").alias("big_q"),
        F.sum("s2_over_n").alias("sum_s2n"),
    )
    stats = tot.select(
        "k",
        "big_n",
        F.expr(
            "sum_s2n - ((big_s div big_n) * (big_s div big_n) * big_n"
            " + 2 * (big_s div big_n) * (big_s - (big_s div big_n) * big_n)"
            " + ((big_s - (big_s div big_n) * big_n)"
            "    * (big_s - (big_s div big_n) * big_n)) div big_n)"
        ).alias("ssb"),
        F.expr("big_q - sum_s2n").alias("ssw"),
    )
    return stats.select(
        "k",
        F.col("big_n").alias("n_rows"),
        F.col("ssb").cast("bigint").alias("ssb_cents2"),
        F.col("ssw").cast("bigint").alias("ssw_cents2"),
        F.round(
            (F.col("ssb").cast("double") / (F.col("k") - 1))
            / (F.col("ssw").cast("double") / (F.col("big_n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb").cast("double") / (F.col("ssb") + F.col("ssw")), 6).alias(
            "eta_squared"
        ),
    )


def _kmeans1d_cte_parts(rounds: int = 5) -> list[str]:
    """Generate the unrolled fixed-round 1-D k-means oracle (k=3).

    Every round is two CTEs — assignment (nearest centroid, ties to the
    lowest id) and centroid update (integer mean via floor division; an
    empty cluster keeps its previous centroid).  Update CTEs are
    MATERIALIZED: each is referenced by the next round AND by the
    empty-cluster fallback, and DuckDB's default inlining would otherwise
    expand the chain exponentially (the bpe_train_merges lesson).
    """
    assign = (
        "SELECT b.cents, CASE"
        " WHEN abs(b.cents - c.c1) <= abs(b.cents - c.c2)"
        "  AND abs(b.cents - c.c1) <= abs(b.cents - c.c3) THEN 1"
        " WHEN abs(b.cents - c.c2) <= abs(b.cents - c.c3) THEN 2"
        " ELSE 3 END AS a FROM base b, {prev} c"
    )
    update = (
        "SELECT "
        + ", ".join(
            "COALESCE((sum(CASE WHEN a = {k} THEN cents END)::BIGINT)"
            " // NULLIF(count(CASE WHEN a = {k} THEN 1 END), 0),"
            " (SELECT c{k} FROM {prev})) AS c{k}".format(k=k, prev="{prev}")
            for k in (1, 2, 3)
        )
        + " FROM {a}"
    )
    parts = [
        "WITH base AS MATERIALIZED (SELECT CAST(round(o_totalprice * 100)"
        " AS BIGINT) AS cents FROM orders)",
        "n AS (SELECT count(*)::BIGINT AS n FROM base)",
        "ranked AS MATERIALIZED (SELECT cents,"
        " row_number() OVER (ORDER BY cents) AS rk FROM base)",
        "c0 AS MATERIALIZED (SELECT"
        " (SELECT cents FROM ranked, n WHERE rk = (n - 1) // 4 + 1) AS c1,"
        " (SELECT cents FROM ranked, n WHERE rk = (n - 1) // 2 + 1) AS c2,"
        " (SELECT cents FROM ranked, n WHERE rk = (3 * (n - 1)) // 4 + 1) AS c3)",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"a{r} AS ({assign.format(prev=f'c{r - 1}')})")
        parts.append(
            f"c{r} AS MATERIALIZED ({update.format(prev=f'c{r - 1}', a=f'a{r}')})"
        )
    parts.append(f"afin AS MATERIALIZED ({assign.format(prev=f'c{rounds}')})")
    return parts


def _kmeans1d_oracle(rounds: int = 5) -> str:
    parts = _kmeans1d_cte_parts(rounds)
    final = f"""
    SELECT a::BIGINT AS cluster_id,
           CASE a WHEN 1 THEN (SELECT c1 FROM c{rounds})
                  WHEN 2 THEN (SELECT c2 FROM c{rounds})
                  ELSE (SELECT c3 FROM c{rounds}) END AS centroid_cents,
           count(*)::BIGINT AS n_orders,
           (sum(cents)::BIGINT) // count(*) AS mean_cents,
           min(cents) AS min_cents, max(cents) AS max_cents
    FROM afin GROUP BY a
    """
    return ",\n".join(parts) + final


def _kmeans1d_assign_col(c):
    """Nearest-centroid assignment column for 3 literal integer centroids
    (ties to the lowest cluster id — matches the oracle CASE)."""
    d = [F.abs(F.col("cents") - F.lit(int(ck))) for ck in c]
    return (
        F.when((d[0] <= d[1]) & (d[0] <= d[2]), F.lit(1))
        .when(d[1] <= d[2], F.lit(2))
        .otherwise(F.lit(3))
        .alias("a")
    )


def _kmeans1d_fit(spark: SparkSession, sf_dir: str, rounds: int = 5):
    """Run the integer 1-D k-means loop; returns (base_df, final_centroids).

    base is the localCheckpoint-ed cents column; centroids are the k
    driver-held integers after ``rounds`` Lloyd's updates (quartile init).
    Shared by kmeans_1d_value_segments and silhouette_1d_kmeans so both
    queries (and both oracles, via _kmeans1d_oracle's shared CTE chain)
    score the identical model.
    """
    base = (
        t(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
        .localCheckpoint(eager=True)
    )
    n = base.count()
    # discrete-quartile init by value-grid rank-select
    # (operators/rankselect.py) — identical integers to a raw-row rank pick
    from map_reduce_engine_spark.operators.rankselect import (
        rank_pick,
        value_grid_cum,
    )

    picks = [(n - 1) // 4 + 1, (n - 1) // 2 + 1, (3 * (n - 1)) // 4 + 1]
    cumv = value_grid_cum(base, "cents")
    row = cumv.agg(
        *[rank_pick("cents", "cum", str(k)).alias(f"q{i}") for i, k in enumerate(picks)]
    ).collect()[0]
    cents_c = [row[f"q{i}"] for i in range(3)]
    for _ in range(rounds):
        row = (
            base.select("cents", _kmeans1d_assign_col(cents_c))
            .groupBy()
            .agg(
                *[
                    F.expr(
                        f"sum(CASE WHEN a = {k} THEN cents END)"
                        f" div count(CASE WHEN a = {k} THEN 1 END)"
                    ).alias(f"c{k}")
                    for k in (1, 2, 3)
                ]
            )
            .collect()[0]
        )
        cents_c = [
            row[f"c{k}"] if row[f"c{k}"] is not None else cents_c[k - 1]
            for k in (1, 2, 3)
        ]
    return base, cents_c


@register(
    "kmeans_1d_value_segments",
    oracle=_kmeans1d_oracle(),
    doc="in-engine 1-D k-means (k=3, 5 fixed rounds) over order totals in "
    "integer cents — the cheap/mid/premium order segmentation a pricing "
    "or stratified-sampling pipeline derives from data instead of "
    "hand-picked thresholds. Lloyd's algorithm made engine-exact: "
    "centroids init at the discrete quartiles (row_number pick, pure "
    "integers), assignment is integer |cents - c| argmin with ties to "
    "the lowest cluster id, and the update is an exact BIGINT floor-"
    "division mean — no floats anywhere, so 5 rounds land on identical "
    "integers in any engine. Scale shape: the cents column is localCheck"
    "pointed once and each round is one 3-column conditional aggregate "
    "(k driver-held integers, the PQ-codebook pattern); the quartile "
    "init rank-selects over the distinct-cents value grid, so no window "
    "ever sorts raw fact rows.",
)
def kmeans_1d_value_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, cents_c = _kmeans1d_fit(spark, sf_dir)
    centroid_case = "CASE a WHEN 1 THEN {} WHEN 2 THEN {} ELSE {} END".format(
        *[int(c) for c in cents_c]
    )
    return (
        base.select("cents", _kmeans1d_assign_col(cents_c))
        .groupBy("a")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr("sum(cents) div count(*)").alias("mean_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            F.col("a").cast("bigint").alias("cluster_id"),
            F.expr(centroid_case).cast("bigint").alias("centroid_cents"),
            "n_orders",
            "mean_cents",
            "min_cents",
            "max_cents",
        )
    )


@register(
    "quantile_normalize_sources",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    pooled AS (
      SELECT n_chars AS pooled_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS p
      FROM d
    ),
    nn AS (SELECT count(*)::BIGINT AS n FROM d),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
               AS r,
             count(*) OVER (PARTITION BY source) AS m
      FROM d
    ),
    mapped AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN m > 1 THEN ((r - 1) * (nn.n - 1)) // (m - 1) + 1
                  ELSE (nn.n + 1) // 2 END AS p
      FROM ranked, nn
    )
    SELECT m.doc_id, m.source, m.n_chars, pl.pooled_chars AS norm_chars
    FROM mapped m JOIN pooled pl USING (p)
    """,
    doc="rank-based quantile normalization of document length across "
    "sources: each source's n_chars distribution is mapped onto the "
    "pooled corpus distribution (rank r of m within the source lands on "
    "pooled position ((r-1)(N-1)) div (m-1) + 1) — the cross-source "
    "feature-scaling step (microarray-style quantile normalization) a "
    "mixing pipeline applies before comparing per-source quality "
    "thresholds. All-integer position arithmetic with a deterministic "
    "(value, doc_id) tiebreak, so the mapping is engine-exact. Scale "
    "shape: one per-source window (keyed, bounded state) + a SHARDED "
    "two-pass global rank (value-range shards ranked in parallel, "
    "per-shard offsets from the shard-count grid — never a single-task "
    "sort) + an equi-join on position.",
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # pooled global rank as a distributed two-pass prefix
    # (operators/rankselect.py::sharded_running): value-range shards are
    # monotone in the sort key, so shard order + within-shard
    # (n_chars, doc_id) order = the global order — bit-identical to a
    # global row_number with no single-task sort of the corpus.
    from map_reduce_engine_spark.operators.rankselect import sharded_running

    sh = d.select(F.col("n_chars").alias("pooled_chars"), "doc_id")
    pooled = sharded_running(
        sh, "pooled_chars div 256", ["pooled_chars", "doc_id"], rn="p"
    ).select("pooled_chars", "p")
    nn = d.agg(F.count("*").alias("n"))
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("m"),
    )
    mapped = ranked.crossJoin(F.broadcast(nn)).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("m") > 1,
            F.expr("((r - 1) * (n - 1)) div (m - 1) + 1"),
        )
        .otherwise(F.expr("(n + 1) div 2"))
        .alias("p"),
    )
    return mapped.join(pooled, "p").select(
        "doc_id", "source", "n_chars", F.col("pooled_chars").alias("norm_chars")
    )


def _silhouette1d_oracle(rounds: int = 5) -> str:
    """Silhouette oracle: the shared k-means CTE chain, then the 1-D
    prefix-sum silhouette. Key identity: within a sorted cluster,
    sum|x - y| = (r*x - pref) + ((S - pref) - (k - r)*x) with INCLUSIVE
    prefix sums — invariant under tie permutation (r and pref co-vary), so
    arbitrary tie order across engines cannot change the result. Distances
    to OTHER clusters need only (k_m, S_m): nearest-centroid clusters are
    intervals in 1-D, so every foreign cluster lies entirely on one side
    of x and sum|x - y| = |k_m*x - S_m| exactly."""
    parts = _kmeans1d_cte_parts(rounds) + [
        "cstats AS MATERIALIZED (SELECT a, count(*)::BIGINT AS k,"
        " sum(cents)::BIGINT AS s FROM afin GROUP BY a)",
        "pref AS MATERIALIZED (SELECT a, cents,"
        " row_number() OVER (PARTITION BY a ORDER BY cents) AS r,"
        " (sum(cents) OVER (PARTITION BY a ORDER BY cents"
        " ROWS UNBOUNDED PRECEDING))::BIGINT AS pr FROM afin)",
        "own AS (SELECT p.a, p.r, p.cents, cs.k,"
        " ((p.r * p.cents - p.pr) + ((cs.s - p.pr) - (cs.k - p.r) * p.cents))"
        " AS sum_own FROM pref p JOIN cstats cs ON cs.a = p.a)",
        "bmin AS (SELECT p.a, p.r,"
        " min(CAST(abs(m.k * p.cents - m.s) AS DOUBLE) / CAST(m.k AS DOUBLE))"
        " AS b_d FROM pref p JOIN cstats m ON m.a <> p.a GROUP BY p.a, p.r)",
        "sil AS (SELECT o.a, CASE WHEN o.k = 1 THEN CAST(0 AS BIGINT)"
        " ELSE CAST(round(1e6 * (CASE WHEN greatest(CAST(o.sum_own AS DOUBLE)"
        " / CAST(o.k - 1 AS DOUBLE), b.b_d) = 0.0 THEN 0.0"
        " ELSE (b.b_d - CAST(o.sum_own AS DOUBLE) / CAST(o.k - 1 AS DOUBLE))"
        " / greatest(CAST(o.sum_own AS DOUBLE) / CAST(o.k - 1 AS DOUBLE),"
        " b.b_d) END)) AS BIGINT) END AS s_micro"
        " FROM own o JOIN bmin b ON b.a = o.a AND b.r = o.r)",
    ]
    final = """
    SELECT a::BIGINT AS cluster_id, count(*)::BIGINT AS n_points,
           (sum(s_micro)::BIGINT) // count(*) AS mean_sil_micro,
           min(s_micro) AS min_sil_micro, max(s_micro) AS max_sil_micro
    FROM sil GROUP BY a
    """
    return ",\n".join(parts) + final


@register(
    "silhouette_1d_kmeans",
    oracle=_silhouette1d_oracle(),
    doc="EXACT silhouette evaluation of the kmeans_1d_value_segments "
    "clustering — mean/min/max silhouette per cluster in integer "
    "micro-units, with NO sampling and NO pairwise materialization. The "
    "1-D structure collapses the quadratic definition: within-cluster "
    "mean distance comes from one sorted prefix-sum window per cluster "
    "(sum|x-y| = (r*x - pref) + ((S - pref) - (k-r)*x), pure BIGINT), and "
    "distance to each foreign cluster needs only its (count, sum) because "
    "nearest-centroid clusters are intervals — so b(x) = min|k_m*x - "
    "S_m|/k_m over a 3-row broadcast. Per-point silhouettes freeze to "
    "micro-units (identical double formula on exact integers), and "
    "cluster means are integer division — engine-exact end-to-end. Scale "
    "shape: the k-means fit plus ONE keyed window and two 3-row "
    "broadcast joins; nothing quadratic, nothing driver-side but the k "
    "centroids.",
)
def silhouette_1d_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, cents_c = _kmeans1d_fit(spark, sf_dir)
    pts = base.select("cents", _kmeans1d_assign_col(cents_c))
    cstats = pts.groupBy("a").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    wp = Window.partitionBy("a").orderBy("cents")
    pref = pts.select(
        "a",
        "cents",
        F.row_number().over(wp).alias("r"),
        F.sum("cents")
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("pr"),
    )
    own = pref.join(F.broadcast(cstats), "a").select(
        "a",
        "r",
        "cents",
        "k",
        F.expr("((r * cents - pr) + ((s - pr) - (k - r) * cents))").alias("sum_own"),
    )
    m = cstats.select(
        F.col("a").alias("ma"), F.col("k").alias("mk"), F.col("s").alias("ms")
    )
    bmin = (
        pref.join(F.broadcast(m), F.col("ma") != F.col("a"))
        .groupBy("a", "r")
        .agg(
            F.min(
                F.expr(
                    "CAST(abs(mk * cents - ms) AS DOUBLE) / CAST(mk AS DOUBLE)"
                )
            ).alias("b_d")
        )
    )
    sil = own.join(bmin, ["a", "r"]).select(
        "a",
        F.expr(
            "CASE WHEN k = 1 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1e6 * (CASE WHEN greatest(CAST(sum_own AS DOUBLE)"
            " / CAST(k - 1 AS DOUBLE), b_d) = 0.0 THEN 0.0"
            " ELSE (b_d - CAST(sum_own AS DOUBLE) / CAST(k - 1 AS DOUBLE))"
            " / greatest(CAST(sum_own AS DOUBLE) / CAST(k - 1 AS DOUBLE),"
            " b_d) END)) AS BIGINT) END"
        ).alias("s_micro"),
    )
    return sil.groupBy("a").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.expr("sum(s_micro) div count(*)").alias("mean_sil_micro"),
        F.min("s_micro").alias("min_sil_micro"),
        F.max("s_micro").alias("max_sil_micro"),
    ).select(
        F.col("a").cast("bigint").alias("cluster_id"),
        "n_points",
        "mean_sil_micro",
        "min_sil_micro",
        "max_sil_micro",
    )


def _davies_bouldin_oracle(rounds: int = 5) -> str:
    """Davies-Bouldin oracle off the shared k-means chain: per-cluster
    scatter = sum|x - c| (exact BIGINT vs the round-5 centroid), pairwise
    similarity R_ij = (s_i + s_j)/d(c_i, c_j) frozen to micro-units per
    cluster (3 bounded rows), DB = mean of per-cluster maxima via integer
    division."""
    parts = _kmeans1d_cte_parts(rounds) + [
        f"cent AS (SELECT a, CASE a WHEN 1 THEN (SELECT c1 FROM c{rounds})"
        f" WHEN 2 THEN (SELECT c2 FROM c{rounds})"
        f" ELSE (SELECT c3 FROM c{rounds}) END AS c FROM (VALUES (1), (2), (3)) v(a))",
        "cstats AS MATERIALIZED (SELECT f.a, count(*)::BIGINT AS k,"
        " sum(abs(f.cents - ct.c))::BIGINT AS scatter, max(ct.c) AS c"
        " FROM afin f JOIN cent ct ON ct.a = f.a GROUP BY f.a)",
        "pairs AS (SELECT i.a,"
        " CAST(round(1e6 * ((i.scatter::DOUBLE / i.k::DOUBLE"
        " + j.scatter::DOUBLE / j.k::DOUBLE)"
        " / abs(i.c - j.c)::DOUBLE)) AS BIGINT) AS r_micro"
        " FROM cstats i JOIN cstats j ON j.a <> i.a)",
        "rmax AS (SELECT a, max(r_micro) AS r_max_micro FROM pairs GROUP BY a)",
    ]
    final = """
    SELECT count(*)::BIGINT AS n_clusters,
           (sum(r_max_micro)::BIGINT) // count(*) AS db_index_micro
    FROM rmax
    """
    return ",\n".join(parts) + final


@register(
    "davies_bouldin_1d_kmeans",
    oracle=_davies_bouldin_oracle(),
    doc="Davies-Bouldin index of the kmeans_1d_value_segments clustering — "
    "the cheap cluster-separation score (lower = better) computed next to "
    "the exact silhouette: per-cluster scatter sum|x - centroid| is one "
    "exact BIGINT conditional aggregate over the corpus, and everything "
    "after (pairwise similarity ratios, per-cluster maxima, the mean) "
    "lives on k=3 bounded rows with ratios frozen to micro-units — "
    "engine-exact end-to-end, one corpus pass beyond the fit.",
)
def davies_bouldin_1d_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, cents_c = _kmeans1d_fit(spark, sf_dir)
    pts = base.select("cents", _kmeans1d_assign_col(cents_c))
    cent_case = "CASE a WHEN 1 THEN {} WHEN 2 THEN {} ELSE {} END".format(
        *[int(c) for c in cents_c]
    )
    cstats = pts.groupBy("a").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.expr(f"abs(cents - ({cent_case}))")).cast("bigint").alias("scatter"),
        F.max(F.expr(cent_case)).alias("c"),
    )
    i = cstats.select(
        F.col("a"), F.col("k").alias("ik"), F.col("scatter").alias("iscat"),
        F.col("c").alias("ic"),
    )
    j = cstats.select(
        F.col("a").alias("ja"), F.col("k").alias("jk"),
        F.col("scatter").alias("jscat"), F.col("c").alias("jc"),
    )
    pairs = i.join(F.broadcast(j), F.col("ja") != F.col("a")).select(
        "a",
        F.expr(
            "CAST(round(1e6 * ((CAST(iscat AS DOUBLE) / CAST(ik AS DOUBLE)"
            " + CAST(jscat AS DOUBLE) / CAST(jk AS DOUBLE))"
            " / CAST(abs(ic - jc) AS DOUBLE))) AS BIGINT)"
        ).alias("r_micro"),
    )
    rmax = pairs.groupBy("a").agg(F.max("r_micro").alias("r_max_micro"))
    return rmax.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.expr("sum(r_max_micro) div count(*)").alias("db_index_micro"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling (data selection for LM pretraining)
# --------------------------------------------------------------------------


@register(
    "dsir_importance_weights",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang, token FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> ''
    ),
    b AS MATERIALIZED (
      SELECT doc_id, lang,
             (('0x' || substr(md5(token), 1, 8))::BIGINT & 2147483647) % 1024
               AS bucket
      FROM tok
    ),
    ct AS (SELECT bucket, count(*)::BIGINT AS c FROM b WHERE lang = 'en'
           GROUP BY bucket),
    cr AS (SELECT bucket, count(*)::BIGINT AS c FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM b WHERE lang = 'en')::BIGINT AS nt,
                   count(*)::BIGINT AS nr
            FROM b),
    spine AS (SELECT j AS bucket FROM generate_series(0, 1023) AS t(j)),
    w AS MATERIALIZED (
      SELECT s.bucket,
             CAST(floor((ln((coalesce(ct.c, 0) + 1)
                            / CAST(tot.nt + 1024 AS DOUBLE))
                       - ln((coalesce(cr.c, 0) + 1)
                            / CAST(tot.nr + 1024 AS DOUBLE)))
                        * 1000000000 + 0.5) AS BIGINT) AS lr_nano
      FROM spine s LEFT JOIN ct ON ct.bucket = s.bucket
                   LEFT JOIN cr ON cr.bucket = s.bucket
                   CROSS JOIN tot
    ),
    feat AS (SELECT doc_id, lang, bucket, count(*)::BIGINT AS x
             FROM b GROUP BY 1, 2, 3),
    score AS (
      SELECT f.doc_id, f.lang, CAST(sum(f.x * w.lr_nano) AS BIGINT) AS score_nano
      FROM feat f JOIN w USING (bucket) GROUP BY 1, 2
    )
    SELECT doc_id, lang, score_nano,
           row_number() OVER (ORDER BY score_nano DESC, doc_id)::BIGINT
             AS sel_rank
    FROM score ORDER BY score_nano DESC, doc_id LIMIT 50
    """,
    doc="DSIR-style data selection (Xie et al. 2023, Data Selection via "
    "Importance Resampling): per-document importance weight = sum over "
    "token instances of the log-ratio between a TARGET unigram model "
    "(lang='en' docs) and the RAW-corpus model, both over 1024 hashed "
    "n-gram buckets (portable md5-prefix hash, add-one smoothing) — the "
    "principled 'select raw data that looks like the target distribution' "
    "step a pretraining pipeline runs before mixing. Per-bucket log "
    "ratios are identical-double shared formulas frozen to BIGINT nano, "
    "so every document score is an exact integer sum; output = top-50 "
    "selected docs with rank. Scale: token explode -> 1024-bounded "
    "bucket aggregates, weight table BROADCAST back (hashing-trick "
    "deployment, no model artifact), one per-doc aggregate, "
    "TakeOrderedAndProject for the selection — no global sort, linear "
    "at 100 TB.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.dedup import portable_base31

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens_col("text")).alias("token")
    )
    b = tok.select(
        "doc_id", "lang", (portable_base31(F.col("token")) % 1024).alias("bucket")
    )
    ct = b.where(F.col("lang") == "en").groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("tc")
    )
    cr = b.groupBy("bucket").agg(F.count("*").cast("bigint").alias("rc"))
    tot = b.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.count("*").cast("bigint").alias("nr"),
    )
    spine = spark.range(1024).select(F.col("id").alias("bucket"))
    w = (
        spine.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                "CAST(floor((ln((coalesce(tc, 0) + 1)"
                " / CAST(nt + 1024 AS DOUBLE))"
                " - ln((coalesce(rc, 0) + 1)"
                " / CAST(nr + 1024 AS DOUBLE)))"
                " * 1000000000 + 0.5) AS BIGINT)"
            ).alias("lr_nano"),
        )
    )
    feat = b.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("bigint").alias("x")
    )
    score = (
        feat.join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.expr("x * lr_nano")).cast("bigint").alias("score_nano"))
    )
    top = score.orderBy(F.desc("score_nano"), "doc_id").limit(50)
    wr = Window.orderBy(F.desc("score_nano"), "doc_id")
    return top.select(
        "doc_id",
        "lang",
        "score_nano",
        F.row_number().over(wr).cast("bigint").alias("sel_rank"),
    )
