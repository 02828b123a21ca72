"""Text conformance queries: reference parity (WordCount/WordLength) +
LLM-pipeline text analysis (SURVEY.md §2 Part C).

``wordcount``/``wordlength`` are the reference's two shipped jobs
(``WordCount.java:13-35``, ``WordLength.java:13-40``) over the ``documents``
fixture; ``wordcount_mapreduce`` runs the same job through the map/reduce
UDF compat surface (mapreduce.py) to prove the compat path computes
identically to the declarative path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark import mapreduce
from map_reduce_engine_spark.operators import text as text_ops
from map_reduce_engine_spark.queries.base import register, t

# DuckDB-side tokenizer mirroring operators/text.py::tokens_col
_DUCK_TOKENS = r"string_split_regex(trim(text), '\s+')"

_WORDCOUNT_SQL = f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest({_DUCK_TOKENS}) AS word FROM documents WHERE trim(text) <> '')
    WHERE word <> ''
    GROUP BY word
"""


@register(
    "wordcount",
    oracle=_WORDCOUNT_SQL,
    doc="reference flagship: WordCount.java:13-35 as scan→explode→hash agg",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.wordcount(t(spark, sf_dir, "documents"), "text")


@register(
    "wordlength",
    oracle=f"""
    SELECT length(word)::BIGINT AS length, count(*) AS cnt
    FROM (SELECT unnest({_DUCK_TOKENS}) AS word FROM documents WHERE trim(text) <> '')
    WHERE word <> ''
    GROUP BY 1
    """,
    doc="reference job 2: WordLength.java:13-40 token-length histogram",
)
def wordlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = text_ops.wordlength(t(spark, sf_dir, "documents"), "text")
    return df.select(F.col("length").cast("bigint").alias("length"), "cnt")


@register(
    "wordcount_mapreduce",
    oracle=_WORDCOUNT_SQL,
    doc="same job through the map/reduce UDF compat surface (MapRunner/ReduceRunner analogue)",
)
def wordcount_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    out = mapreduce.wordcount_job(docs)
    return out.select(F.col("key").alias("word"), F.col("value").alias("cnt"))


@register(
    "wordlength_mapreduce",
    oracle=f"""
    SELECT length(word)::BIGINT AS length, count(*) AS cnt
    FROM (SELECT unnest({_DUCK_TOKENS}) AS word FROM documents WHERE trim(text) <> '')
    WHERE word <> ''
    GROUP BY 1
    """,
    doc="reference job 2 through the map/reduce UDF compat surface — proves "
    "the typed-key path (long keys, WordLength.java:13-40) matches the "
    "declarative operator",
)
def wordlength_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    out = mapreduce.wordlength_job(docs)
    return out.select(F.col("key").cast("bigint").alias("length"), F.col("value").alias("cnt"))


def _cms_oracle(depth: int = 4, width: int = 1024, topk: int = 20) -> str:
    """DuckDB twin of the count-min-sketch heavy-hitter query.

    Same affine family constants (``minhash_family``), same md5-prefix base
    hash, same counter grid — all integer arithmetic, so the sketch and the
    min-over-depth estimates match Spark bit-for-bit.
    """
    from map_reduce_engine_spark.operators.dedup import minhash_family

    av, bv = minhash_family(depth)
    fam = ", ".join(f"({d}, {av[d]}, {bv[d]})" for d in range(depth))
    shift = 31 - (width.bit_length() - 1)
    return f"""
    WITH toks AS (
      SELECT w AS token FROM (
        SELECT unnest({_DUCK_TOKENS}) AS w FROM documents WHERE trim(text) <> ''
      ) WHERE w <> ''
    ),
    h AS (
      SELECT token, ('0x' || substr(md5(token), 1, 8))::BIGINT & 2147483647 AS h
      FROM toks
    ),
    fam(d, a, b) AS (VALUES {fam}),
    sk AS (
      SELECT d, ((a * h + b) & 2147483647) >> {shift} AS bucket, count(*) AS c
      FROM h CROSS JOIN fam GROUP BY 1, 2
    ),
    exact AS (SELECT token, min(h) AS h, count(*) AS n FROM h GROUP BY token),
    top AS (
      SELECT token, h, n FROM (
        SELECT token, h, n, row_number() OVER (ORDER BY n DESC, token) AS rk
        FROM exact
      ) WHERE rk <= {topk}
    ),
    est AS (
      SELECT t.token, min(s.c) AS cms_estimate
      FROM top t
      CROSS JOIN fam
      JOIN sk s ON s.d = fam.d
              AND s.bucket = ((fam.a * t.h + fam.b) & 2147483647) >> {shift}
      GROUP BY t.token
    )
    SELECT t.token, t.n AS exact_n, e.cms_estimate
    FROM top t JOIN est e USING (token)
    """


@register(
    "cms_heavy_hitters",
    oracle=_cms_oracle(),
    doc="count-min-sketch heavy hitters (operators/sketch.py): token "
    "frequencies sketched into a 4x1024 additive counter grid — bounded at "
    "depth*width rows regardless of corpus size, mergeable across shards "
    "with plain sum (the AddInterface contract, ReduceRunner.java:154-172, "
    "as a sketch) — then the top-20 exact heavy hitters probed back for "
    "their min-over-depth estimates (always >= exact; error <= N/width). "
    "FULLY oracle-checked: the portable hash family makes the entire grid "
    "bit-identical in DuckDB, unlike engine-specific sketch binaries",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import sketch as sk

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(F.explode(text_ops.tokens_col("text")).alias("token")).where(
        F.col("token") != ""
    )
    sketch = sk.cms_table(toks, "token", depth=4, width=1024)
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_n"))
    # global top-k as orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps, no single-partition global window)
    top = exact.orderBy(F.desc("exact_n"), F.asc("token")).limit(20)
    est = sk.cms_point_estimates(sketch, top.select("token"), "token", depth=4, width=1024)
    return top.join(est, top.token == est.item).select("token", "exact_n", "cms_estimate")


@register(
    "token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars,
           round(length(regexp_replace(text, '\\s', '', 'g'))
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS avg_token_len,
           ceil(length(text) / 4)::BIGINT AS est_bpe_tokens
    FROM documents
    WHERE trim(text) <> ''
    """,
    doc="per-document token statistics (token counting for pipeline budgeting)",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    df = text_ops.token_stats(docs, "doc_id", "text")
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "avg_token_len",
        F.col("est_bpe_tokens").cast("bigint").alias("est_bpe_tokens"),
    )


@register(
    "quality_score",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) AS alpha_ratio,
           round(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) / length(text), 4) AS punct_ratio,
           round(
             (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 5 AND 100000 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
           + (CASE WHEN length(regexp_replace(text, '\\s', '', 'g'))
                        / len(string_split_regex(trim(text), '\\s+')) BETWEEN 2 AND 12 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
           + (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) >= 0.6 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
           + (CASE WHEN length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) / length(text) <= 0.2 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
           , 2) AS quality
    FROM documents
    WHERE trim(text) <> ''
    """,
    doc="document quality scoring (pretraining-data filter features)",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    df = text_ops.quality_score(docs, "doc_id", "text")
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "alpha_ratio",
        "punct_ratio",
        "quality",
    )


@register(
    "langid",
    oracle="""
    SELECT doc_id,
      CASE
        WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
        WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
        WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
        WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_es = greatest(s_en, s_fr, s_de, s_es) THEN 'es'
        ELSE 'und'
      END AS predicted_lang,
      greatest(s_en, s_fr, s_de, s_es)::BIGINT AS score
    FROM (
      SELECT doc_id,
        len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b'))    AS s_en,
        len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b'))   AS s_fr,
        len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein)\\b')) AS s_de,
        len(regexp_extract_all(lower(text), '\\b(el|los|que|y|en)\\b'))    AS s_es
      FROM documents
    )
    """,
    doc="marker-word language ID (deterministic n-gram heuristic)",
)
def langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.langid(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "lang_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
    doc="per-language corpus stats over document metadata",
)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    doc="md5 content fingerprint of whitespace-normalized text",
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.fingerprint(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "pii_scrub",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '[REDACTED]', 'g'),
             '\d{6,}', '[REDACTED]', 'g') AS scrubbed_text,
           regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS had_email,
           regexp_matches(text, '\d{6,}') AS had_long_digits
    FROM documents
    """,
    doc="PII scrubbing (pretraining-corpus redaction): chained regexp_replace "
    "for email/digit-run shapes in one projection pass, with rlike hit "
    "flags for redaction-rate auditing — no second scan, no Python",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return text_ops.pii_scrub(docs, "doc_id", "text")


@register(
    "token_doc_freq",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
    toks AS (
      SELECT DISTINCT doc_id, unnest({_DUCK_TOKENS}) AS token FROM d
    ),
    n AS (SELECT count(*) AS n_docs FROM d)
    SELECT token, count(*) AS df,
           round(ln(n_docs / count(*)), 4) AS idf
    FROM toks, n
    GROUP BY token, n_docs
    """,
    doc="document frequency + IDF per token (the inverted-index statistics "
    "for search/tf-idf). The corpus size joins in as a 1-row broadcast "
    "(cross join of an aggregate), so no driver-side count() action sits "
    "in the operator path",
)
def token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens_col("text")).alias("token")
    ).distinct()
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            "df",
            F.round(F.log(F.col("n_docs") / F.col("df")), 4).alias("idf"),
        )
    )


@register(
    "corpus_split",
    oracle="""
    SELECT split, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
    FROM (
      SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
                  WHEN doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents
    )
    GROUP BY split
    """,
    doc="reproducible train/val/test corpus split by key modulus — "
    "deterministic under any partitioning and re-run (unlike random "
    "sampling), the way dataset splits stay stable across pipeline runs",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    split = (
        F.when(F.col("doc_id") % 100 < 80, "train")
        .when(F.col("doc_id") % 100 < 90, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_sampled,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    WHERE ('0x' || substr(md5(lang || ':' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000 < 250
    GROUP BY lang
    """,
    doc="deterministic per-stratum 25% sampling: the keep/drop decision is a "
    "portable md5 hash of (lang, doc_id) — salting by the stratum gives "
    "each language an independent hash stream, so every stratum lands near "
    "its target fraction regardless of how doc_ids correlate with lang. "
    "Unlike seeded Bernoulli (sampleBy), membership is engine-, run- and "
    "partitioning-independent, and no driver-side stratum discovery is "
    "needed (the former distinct().collect() is gone): the filter is one "
    "row-local expression, embarrassingly parallel at 100 TB",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.where(h % 1000 < 250)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    doc="multimodal binary-column convention: payload bytes + typed metadata (decode stubbed)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.multimodal import attach_media_meta

    docs = t(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    df = attach_media_meta(docs, "payload", kind="text", mime="text/plain")
    return df.select(
        "doc_id",
        F.col("media.n_bytes").alias("n_bytes"),
        F.col("media.sha256").alias("payload_sha256"),
    )


@register(
    "inverted_index_mapreduce",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT unnest({_DUCK_TOKENS}) AS word, doc_id
      FROM documents WHERE trim(text) <> ''
    )
    SELECT word AS key, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS value
    FROM pairs GROUP BY word
    """,
    doc="inverted index through the map/reduce UDF compat surface — the "
    "classic third MapReduce job (map: (word, doc_id) with provenance "
    "encoded in the record, reduce: ascending-unique posting list). "
    "Proves the compat path handles text-valued reduce output (the "
    "reference's Text Writable, Text.java:28-32)",
)
def inverted_index_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return mapreduce.inverted_index_job(docs)


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM d)
      WHERE token <> ''
      GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id, token FROM tf)
      GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM d),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(n.n_docs / df.df) DESC, tf.token)
               AS rk
      FROM tf JOIN df USING (token), n
    )
    SELECT doc_id, token, tfidf, rk::BIGINT AS rk
    FROM scored WHERE rk <= 2
    """,
    doc="per-document top-2 TF-IDF terms: term frequency joined to the "
    "corpus document-frequency table (built once — the token_doc_freq "
    "statistics), scored, then a per-doc ranked window with a token "
    "tiebreak. The df side is |vocabulary|-sized (broadcastable); the "
    "window partitions by doc_id — the keyword-extraction step of a "
    "search/labeling pipeline",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select("doc_id", F.explode(text_ops.tokens_col("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.select("doc_id", "token").groupBy("token").agg(
        F.count("*").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 2)
        .select("doc_id", "token", F.round("score", 6).alias("tfidf"), "rk")
    )


@register(
    "bpe_pretoken_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))::BIGINT
             AS n_pretokens,
           length(text)::BIGINT AS n_chars,
           round(length(text) * 1.0 /
                 greatest(len(regexp_extract_all(text,
                   ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')), 1), 4)
             AS chars_per_pretoken
    FROM documents
    """,
    doc="BPE-style pre-tokenization count: the GPT-2 pre-tokenizer regex "
    "family (letter runs / digit runs / punctuation runs, each with an "
    "optional leading space), lookahead-free so it runs identically on "
    "Java regex and RE2. Pre-token count upper-bounds the BPE token count "
    "(merges only fuse within a pre-token), so this is the cheap, "
    "vocabulary-independent token budgeter — one regexp_extract_all per "
    "row inside codegen, no UDF, no tokenizer model shipped to executors",
)
def bpe_pretoken_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = F.size(F.expr(r"regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0)"))
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_pretokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.round(
            F.length("text") * 1.0 / F.greatest(n, F.lit(1)), 4
        ).alias("chars_per_pretoken"),
    )


@register(
    "tfidf_doc_similarity",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE trim(text) <> '' AND doc_id < 300),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM d)
      WHERE token <> ''
      GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM d),
    w AS (
      SELECT tf.doc_id, tf.token, tf.tf * ln(n.n_docs::DOUBLE / df.df) AS w
      FROM tf JOIN df USING (token), n
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2, round(dot / (n1.nrm * n2.nrm), 4) AS cosine
    FROM dots
    JOIN nrm n1 ON n1.doc_id = id1
    JOIN nrm n2 ON n2.doc_id = id2
    WHERE n1.nrm > 0 AND n2.nrm > 0
      AND dot / (n1.nrm * n2.nrm) >= 0.5
    """,
    doc="sparse TF-IDF document-similarity join on a bounded slice: the "
    "lexical complement to dense-embedding cosine. Weights tf*ln(N/df); "
    "pair dot products via the inverted index (docs pair only on SHARED "
    "tokens — shuffle-co-located on the token key, never a cross join), "
    "norms from one per-doc aggregate, threshold 0.5. Same "
    "high-document-frequency caveat as ngram_jaccard_pairs: a token in f "
    "docs yields f^2 join rows, so the unbounded-scale variant prunes "
    "stopword-grade tokens by df cap first (idf weighting already damps "
    "their contribution). Rounded at 1e-4: float-sum order differs across "
    "engines",
)
def tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .where((F.trim("text") != "") & (F.col("doc_id") < 300))
    )
    toks = docs.select("doc_id", F.explode(text_ops.tokens_col("text")).alias("token")).where(
        F.col("token") != ""
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    # doc total as a 1-row broadcast, not a driver .count() (extra scan job)
    n_docs = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    w = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, "token")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    n1 = nrm.select(F.col("doc_id").alias("id1"), F.col("nrm").alias("nrm1"))
    n2 = nrm.select(F.col("doc_id").alias("id2"), F.col("nrm").alias("nrm2"))
    cos = F.col("dot") / (F.col("nrm1") * F.col("nrm2"))
    return (
        dots.join(F.broadcast(n1), "id1")
        .join(F.broadcast(n2), "id2")
        # nrm > 0 on BOTH engines before the threshold: a doc whose every
        # token appears in all docs has norm 0, and 0/0 is NULL in Spark
        # (row dropped) but NaN in DuckDB (NaN > 0.5 there) — filter the
        # degenerate rows identically so the twins can't diverge
        .where((F.col("nrm1") > 0) & (F.col("nrm2") > 0) & (cos >= 0.5))
        .select("id1", "id2", F.round(cos, 4).alias("cosine"))
    )


@register(
    "source_kl_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, token FROM (
        SELECT source, unnest({_DUCK_TOKENS}) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> ''
    ),
    sc AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
    stot AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
    corpus AS (SELECT token, sum(c) AS cc FROM sc GROUP BY 1),
    ctot AS (SELECT sum(cc) AS nn FROM corpus)
    SELECT sc.source,
           stot.n::BIGINT AS n_tokens,
           count(*) AS vocab,
           round(sum((sc.c::DOUBLE / stot.n)
                     * ln((sc.c::DOUBLE / stot.n) / (corpus.cc::DOUBLE / ctot.nn))), 4)
             AS kl_from_corpus
    FROM sc
    JOIN stot USING (source)
    JOIN corpus USING (token), ctot
    GROUP BY sc.source, stot.n
    """,
    doc="per-source KL divergence from the corpus token distribution — the "
    "domain-shift measure a mixture-weighting pipeline monitors (a source "
    "drifting from the corpus mix shows up as rising KL before any "
    "downstream metric moves). Q(token) can never be zero because every "
    "source token is in the corpus by construction, so the sum is total. "
    "Two hash aggregates on (source, token) + a broadcast of the "
    "|vocabulary|-sized corpus table; rounded at 1e-4 (float-sum order "
    "differs across engines)",
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "source", F.explode(text_ops.tokens_col("text")).alias("token")
    ).where(F.col("token") != "")
    sc = toks.groupBy("source", "token").agg(F.count("*").alias("c"))
    stot = sc.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = sc.groupBy("token").agg(F.sum("c").alias("cc"))
    nn = corpus.agg(F.sum("cc").alias("nn"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("cc").cast("double") / F.col("nn")
    return (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(corpus), "token")
        .crossJoin(F.broadcast(nn))
        .groupBy("source", "n")
        .agg(
            F.count("*").alias("vocab"),
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_from_corpus"),
        )
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            "vocab",
            "kl_from_corpus",
        )
    )


@register(
    "source_length_deciles",
    oracle="""
    WITH b AS (
      SELECT list_transform(
               quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
               x -> round(x, 4)) AS bs
      FROM documents
    ),
    bucketed AS (
      SELECT source,
             1 + len(list_filter(b.bs, x -> x < n_chars)) AS decile
      FROM documents, b
    )
    SELECT source, decile::BIGINT AS decile, count(*) AS n_docs
    FROM bucketed GROUP BY source, decile
    """,
    doc="per-source equi-depth length profile: bucket every document "
    "against the GLOBAL n_chars decile boundaries, then count per "
    "(source, decile) — the cross-distribution comparison that shows "
    "which sources skew long/short relative to the corpus (a flat profile "
    "~= corpus-like; mass piled in deciles 1-2 = a short-doc source). "
    "Boundaries are ONE tiny percentile aggregate broadcast to the scan — "
    "no per-row window, unlike ntile, so it scales to any corpus. "
    "Boundaries rounded at 1e-4 on both engines, making bucket membership "
    "of integer lengths decided by identical constants",
)
def source_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.array(
            *[F.round(F.expr(f"percentile(n_chars, {i / 10.0})"), 4) for i in range(1, 10)]
        ).alias("bs")
    )
    bucketed = docs.crossJoin(F.broadcast(bounds)).select(
        "source",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda x: x < F.col("n_chars")))
        ).cast("bigint").alias("decile"),
    )
    return bucketed.groupBy("source", "decile").agg(F.count("*").alias("n_docs"))


@register(
    "token_dropout_augment",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ts
      FROM documents WHERE trim(text) <> ''
    ),
    marked AS (
      SELECT doc_id, text, len(ts) AS n_tokens,
             list_filter(
               list_transform(range(1, len(ts) + 1),
                              i -> {'t': ts[i],
                                    'h': ('0x' || substr(md5(doc_id::VARCHAR || '|' || (i - 1)::VARCHAR || '|1'), 1, 8))::BIGINT & 2147483647}),
               s -> s.h >= 214748364) AS keep
      FROM toks
    )
    SELECT doc_id AS id, text,
           array_to_string(list_transform(keep, s -> s.t), ' ') AS aug_text,
           n_tokens::BIGINT AS n_tokens,
           (n_tokens - len(keep))::BIGINT AS n_dropped
    FROM marked
    """,
    doc="deterministic ~10% token dropout (operators/text.py::"
    "token_dropout): each token drops iff the portable hash of "
    "(doc_id, position, seed) lands below the rate cutoff — augmentation "
    "as a pure column expression, bit-identically regenerable on any "
    "engine/partitioning/rerun (the auditability RNG masking can't give "
    "a 100 TB corpus) with independent views per seed for contrastive "
    "positives. Zero shuffles; the oracle replays the identical "
    "per-position hashes",
)
def token_dropout_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.text import token_dropout

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return token_dropout(docs, "doc_id", "text", drop_permille=100, seed=1)


@register(
    "flesch_readability",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS n_words,
             len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syllables,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences
      FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           round(206.835::DOUBLE
                 - 1.015::DOUBLE * (n_words::DOUBLE / n_sentences::DOUBLE)
                 - 84.6::DOUBLE * (n_syllables::DOUBLE / n_words::DOUBLE), 3)
             AS flesch
    FROM m WHERE n_words > 0
    """,
    doc="Flesch reading-ease score per document: word / sentence / "
    "syllable-proxy (vowel-group) counts from three regexp passes — pure "
    "JVM column math, one projection, no shuffle at all; the readability "
    "feature a corpus quality-filter stack computes alongside "
    "quality_score. Counts are exact integers so the score formula is "
    "bit-identical across engines",
)
def flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    m = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
        .cast("bigint")
        .alias("n_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiou]+"), 0))
        .cast("bigint")
        .alias("n_syllables"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)).cast("bigint"),
        ).alias("n_sentences"),
    ).where(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return m.select(
        "doc_id", "n_words", "n_syllables", "n_sentences", F.round(flesch, 3).alias("flesch")
    )


@register(
    "zipf_law_fit",
    oracle=r"""
    WITH tf AS (
      SELECT token, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
      FROM tf
    ),
    pts AS (
      SELECT CAST(round(1000000.0 * ln(rank::DOUBLE)) AS BIGINT) AS x,
             CAST(round(1000000.0 * ln(freq::DOUBLE)) AS BIGINT) AS y
      FROM ranked WHERE rank <= 1000
    ),
    m AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts
    )
    SELECT n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
             AS zipf_exponent,
           round((sy::DOUBLE - (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * sx::DOUBLE)
                 / n::DOUBLE / 1000000.0, 6) AS log_intercept
    FROM m
    """,
    doc="Zipf's-law fit over the token frequency spectrum: OLS of "
    "ln(freq) on ln(rank) for the top-1000 tokens (the healthy-corpus "
    "exponent is ≈ -1; a flat slope flags templated/spammy text). Log "
    "coordinates are rounded to integer MICRO-units before the moment "
    "sums, so the regression is an exact-BIGINT computation both engines "
    "replay (ln differs at the ulp; micro-rounding absorbs it). The "
    "corpus-health fingerprint a pretraining pipeline tracks per "
    "snapshot; vocabulary-sized work after one token aggregate",
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    tf = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    pts = (
        tf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 1000)
        .select(
            F.round(F.lit(1000000.0) * F.log(F.col("rank").cast("double")))
            .cast("bigint")
            .alias("x"),
            F.round(F.lit(1000000.0) * F.log(F.col("freq").cast("double")))
            .cast("bigint")
            .alias("y"),
        )
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "n",
        F.round(slope, 6).alias("zipf_exponent"),
        F.round((sy - slope * sx) / n / F.lit(1000000.0), 6).alias("log_intercept"),
    )


@register(
    "distributed_grep",
    oracle=r"""
    SELECT doc_id, source,
           len(regexp_extract_all(text, 'quer[a-z]*'))::BIGINT AS n_matches,
           regexp_extract(text, 'quer[a-z]*') AS first_match
    FROM documents
    WHERE regexp_matches(text, 'quer[a-z]*')
    """,
    doc="distributed grep with provenance — the first example job of the "
    "original MapReduce paper (Dean & Ghemawat §2.1), the reference's "
    "framework genre (framework-src MapRunner line model): every document "
    "matching a regex, with its source, match count, and first match. "
    "Pure JVM regexp projection over the scan — the predicate pushes "
    "into the reader, no shuffle at all",
)
def distributed_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pat = "quer[a-z]*"
    return (
        docs.where(F.col("text").rlike(pat))
        .select(
            "doc_id",
            "source",
            F.regexp_count("text", F.lit(pat)).cast("bigint").alias("n_matches"),
            F.regexp_extract("text", pat, 0).alias("first_match"),
        )
    )


@register(
    "langid_confusion_matrix",
    oracle=r"""
    WITH pred AS (
      SELECT doc_id,
        CASE
          WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
          WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
          WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
          WHEN greatest(s_en, s_fr, s_de, s_es) > 0 AND s_es = greatest(s_en, s_fr, s_de, s_es) THEN 'es'
          ELSE 'und'
        END AS predicted_lang
      FROM (
        SELECT doc_id,
          len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b'))    AS s_en,
          len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b'))   AS s_fr,
          len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein)\b')) AS s_de,
          len(regexp_extract_all(lower(text), '\b(el|los|que|y|en)\b'))    AS s_es
        FROM documents
      )
    ),
    cell AS (
      SELECT d.lang AS true_lang, p.predicted_lang, count(*) AS n
      FROM documents d JOIN pred p USING (doc_id)
      GROUP BY d.lang, p.predicted_lang
    ),
    row_t AS (SELECT true_lang, sum(n) AS row_n FROM cell GROUP BY true_lang)
    SELECT c.true_lang, c.predicted_lang, c.n,
           CAST(10000 * c.n // CAST(r.row_n AS BIGINT) AS BIGINT) AS row_share_bp,
           (c.true_lang = c.predicted_lang) AS is_correct
    FROM cell c JOIN row_t r USING (true_lang)
    """,
    doc="language-ID confusion matrix: the marker-word classifier's "
    "predictions cross-tabulated against the labeled lang column, with "
    "per-true-language recall shares in integer basis points — the "
    "classifier-evaluation report card a corpus pipeline publishes "
    "before trusting langid for routing. One classification pass + two "
    "hash aggregates; matrix is (languages)² at any corpus size",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pred = text_ops.langid(docs, "doc_id", "text").select("doc_id", "predicted_lang")
    cell = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    row_t = cell.groupBy("true_lang").agg(F.sum("n").alias("row_n"))
    return cell.join(F.broadcast(row_t), "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n",
        F.expr("10000 * n div row_n").alias("row_share_bp"),
        (F.col("true_lang") == F.col("predicted_lang")).alias("is_correct"),
    )


@register(
    "heaps_law_fit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token
      FROM documents WHERE trim(text) <> ''
    ),
    per_doc AS (
      SELECT doc_id, count(*)::BIGINT AS n_tok FROM toks
      WHERE token <> '' GROUP BY doc_id
    ),
    first_seen AS (
      SELECT token, min(doc_id) AS first_doc FROM toks
      WHERE token <> '' GROUP BY token
    ),
    new_per_doc AS (
      SELECT first_doc AS doc_id, count(*)::BIGINT AS n_new
      FROM first_seen GROUP BY first_doc
    ),
    cum AS (
      SELECT p.doc_id,
             CAST(sum(p.n_tok) OVER (ORDER BY p.doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tok,
             CAST(sum(coalesce(np.n_new, 0)) OVER (ORDER BY p.doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_vocab
      FROM per_doc p LEFT JOIN new_per_doc np ON np.doc_id = p.doc_id
    ),
    pts AS (
      SELECT CAST(round(1000000.0 * ln(cum_tok::DOUBLE)) AS BIGINT) AS x,
             CAST(round(1000000.0 * ln(cum_vocab::DOUBLE)) AS BIGINT) AS y
      FROM cum
    ),
    m AS (
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
      FROM pts
    )
    SELECT n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
             AS heaps_beta,
           round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                 / n::DOUBLE / 1000000.0, 6) AS log_k
    FROM m
    """,
    doc="Heaps'-law vocabulary-growth fit — V(n) ~ K * n^beta over the "
    "corpus in doc_id ingest order: cumulative distinct-token count "
    "(each token attributed to its first-seen document, so the running "
    "vocabulary is two window sums, never a running distinct) against "
    "cumulative token count, log-log OLS in the zipf_law_fit recipe "
    "(micro-ln BIGINT points, closed-form slope). beta well below 1 is "
    "healthy natural text; beta near 1 screams synthetic/ID-like tokens. "
    "The companion corpus-health fingerprint to the Zipf exponent.",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens_col("text")).alias("token")
    ).where(F.col("token") != "")
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(w).cast("bigint").alias("cum_tok"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).cast("bigint").alias("cum_vocab"),
        )
    )
    pts = cum.select(
        F.round(F.lit(1000000.0) * F.log(F.col("cum_tok").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.round(F.lit(1000000.0) * F.log(F.col("cum_vocab").cast("double")))
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "sxy")
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((sy - slope * sx) / n / F.lit(1000000.0), 6).alias("log_k"),
    )


@register(
    "phrase_search_positional",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS l FROM documents WHERE trim(text) <> ''
    ),
    pos AS (
      SELECT doc_id, i AS p, l[i] AS tok
      FROM toks, unnest(range(1, len(l) + 1)) AS t(i)
    ),
    big AS (
      SELECT t1, t2, count(*) AS c FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l)), i -> l[i])) AS t1,
               unnest(list_transform(range(1, len(l)), i -> l[i + 1])) AS t2
        FROM toks WHERE len(l) >= 2
      ) GROUP BY t1, t2
    ),
    top1 AS (
      SELECT t1, t2 FROM (
        SELECT t1, t2, row_number() OVER (ORDER BY c DESC, t1, t2) AS rn FROM big
      ) WHERE rn = 1
    ),
    p1 AS (
      SELECT p.doc_id, p.p, q.t1, q.t2 FROM pos p JOIN top1 q ON p.tok = q.t1
    ),
    p2 AS (
      SELECT p.doc_id, p.p FROM pos p JOIN top1 q ON p.tok = q.t2
    ),
    m AS (
      SELECT a.doc_id, a.t1, a.t2
      FROM p1 a JOIN p2 b ON b.doc_id = a.doc_id AND b.p = a.p + 1
    )
    SELECT t1 || ' ' || t2 AS phrase,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_occurrences
    FROM m GROUP BY t1, t2
    """,
    doc="positional phrase search: build a positional posting list "
    "(doc, position, token), pick the corpus's most frequent bigram as "
    "the probe phrase (deterministic tiebreak), and count exact adjacent "
    "occurrences by joining the two tokens' postings on (doc, pos+1) — "
    "the inverted-index-with-positions retrieval primitive that bag-of-"
    "words indexes (token_doc_freq, bm25_doc_scores) cannot answer. The "
    "postings are FILTERED to the probe tokens before the positional "
    "join, so the join input is two term posting lists, never the corpus "
    "(the scale rule for phrase queries); probe selection itself uses "
    "in-row adjacent-pair transforms, no positional self-join.",
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select("doc_id", text_ops.tokens_col("text").alias("l"))
    pos = toks.select("doc_id", F.posexplode("l").alias("p0", "tok")).select(
        "doc_id", (F.col("p0") + 1).alias("p"), "tok"
    )
    big = (
        toks.where(F.size("l") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1),"
                    " i -> struct(l[i-1] AS t1, l[i] AS t2))"
                )
            ).alias("b")
        )
        .select("b.*")
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("t1"), F.asc("t2"))
    top1 = big.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select("t1", "t2")
    p1 = pos.join(F.broadcast(top1), pos.tok == top1.t1).select("doc_id", "p", "t1", "t2")
    p2 = pos.join(F.broadcast(top1.select("t2")), pos.tok == F.col("t2")).select(
        F.col("doc_id").alias("doc_id2"), F.col("p").alias("p2")
    )
    m = p1.join(
        p2, (F.col("doc_id2") == F.col("doc_id")) & (F.col("p2") == F.col("p") + 1)
    )
    return m.groupBy("t1", "t2").agg(
        F.concat_ws(" ", "t1", "t2").alias("phrase"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_occurrences"),
    ).select("phrase", "n_docs", "n_occurrences")


@register(
    "naive_bayes_langid",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, substring(txt, i, 3) AS tok
      FROM (SELECT doc_id, lang, trim(lower(text)) AS txt FROM documents
            WHERE len(trim(text)) >= 3),
           (SELECT unnest(range(1, 100000)) AS i) g
      WHERE i <= len(txt) - 2
    ),
    train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
    test AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
    counts AS (
      SELECT lang, tok, count(*)::BIGINT AS cnt FROM train GROUP BY lang, tok
    ),
    lt AS (SELECT lang, sum(cnt)::BIGINT AS total FROM counts GROUP BY lang),
    v AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM counts),
    pr AS (
      SELECT lang, count(*)::BIGINT AS ndocs FROM documents
      WHERE trim(text) <> '' AND doc_id % 2 = 0 GROUP BY lang
    ),
    dt AS (
      SELECT count(*)::BIGINT AS dtot FROM documents
      WHERE trim(text) <> '' AND doc_id % 2 = 0
    ),
    langt AS MATERIALIZED (
      SELECT lt.lang, lt.total, v.v,
             CAST(round(1e6 * ln(1.0 / (lt.total + v.v)::DOUBLE)) AS BIGINT)
               AS dflt,
             CAST(round(1e6 * ln(pr.ndocs::DOUBLE / dt.dtot::DOUBLE)) AS BIGINT)
               AS prior
      FROM lt JOIN pr USING (lang), v, dt
    ),
    w AS MATERIALIZED (
      SELECT c.lang, c.tok,
             CAST(round(1e6 * ln((c.cnt + 1)::DOUBLE
                                 / (l.total + l.v)::DOUBLE)) AS BIGINT) AS llw
      FROM counts c JOIN langt l USING (lang)
    ),
    scored AS (
      SELECT te.doc_id, te.lang AS true_lang, l.lang AS cand,
             max(l.prior) + sum(COALESCE(w.llw, l.dflt)) AS total_micro
      FROM test te CROSS JOIN langt l
      LEFT JOIN w ON w.lang = l.lang AND w.tok = te.tok
      GROUP BY te.doc_id, te.lang, l.lang
    ),
    pred AS (
      SELECT true_lang, cand,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY total_micro DESC, cand) AS rk
      FROM scored
    )
    SELECT true_lang, cand AS pred_lang, count(*)::BIGINT AS n_docs
    FROM pred WHERE rk = 1 GROUP BY true_lang, cand
    """,
    doc="in-engine multinomial naive Bayes language classifier over CHARACTER TRIGRAM features (the classic langid representation - whitespace tokens fail on unsegmented scripts like zh): train on "
    "even doc_ids (Laplace-smoothed trigram likelihoods + doc-count priors), "
    "predict on odd doc_ids, emit the confusion matrix against the "
    "ground-truth lang column. The supervised counterpart of the heuristic "
    "langid: the whole train/predict/eval loop runs as DataFrame ops, no "
    "model export. Scale shape: two corpus token passes (count fit, test "
    "scoring); the model is the vocabulary-x-langs weight table (Heaps-"
    "bounded, equi-joined on token) plus a |langs|-row broadcast for "
    "priors/defaults; per-doc scores are exact BIGINT micro-nat sums "
    "(every ln frozen per bounded (lang,token) group), so argmax and the "
    "confusion matrix are integer-deterministic across engines.",
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.length(F.trim("text")) >= 3)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(trim(lower(text))) - 2),"
                " i -> substring(trim(lower(text)), i, 3))"
            )
        ).alias("tok"),
    )
    train = toks.where(F.col("doc_id") % 2 == 0)
    test = toks.where(F.col("doc_id") % 2 == 1)
    counts = train.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    counts = counts.localCheckpoint(eager=True)  # model reused by 3 consumers
    lt = counts.groupBy("lang").agg(F.sum("cnt").alias("total"))
    v = counts.select("tok").distinct().agg(F.count("*").alias("v"))
    train_docs = docs.where(F.col("doc_id") % 2 == 0)
    pr = train_docs.groupBy("lang").agg(F.count("*").alias("ndocs"))
    dt = train_docs.agg(F.count("*").alias("dtot"))
    langt = (
        lt.join(pr, "lang")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(dt))
        .select(
            "lang",
            "total",
            "v",
            F.round(
                F.lit(1e6)
                * F.log(F.lit(1.0) / (F.col("total") + F.col("v")).cast("double"))
            )
            .cast("bigint")
            .alias("dflt"),
            F.round(
                F.lit(1e6)
                * F.log(F.col("ndocs").cast("double") / F.col("dtot").cast("double"))
            )
            .cast("bigint")
            .alias("prior"),
        )
    )
    w = counts.join(F.broadcast(langt), "lang").select(
        "lang",
        "tok",
        F.round(
            F.lit(1e6)
            * F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("total") + F.col("v")).cast("double")
            )
        )
        .cast("bigint")
        .alias("llw"),
    )
    cand = langt.select(
        F.col("lang").alias("cand"), F.col("dflt"), F.col("prior")
    )
    scored = (
        test.select("doc_id", F.col("lang").alias("true_lang"), "tok")
        .crossJoin(F.broadcast(cand))
        .join(
            w.select(F.col("lang").alias("cand"), "tok", "llw"),
            ["cand", "tok"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            (
                F.max("prior") + F.sum(F.coalesce(F.col("llw"), F.col("dflt")))
            ).alias("total_micro")
        )
    )
    wpred = Window.partitionBy("doc_id").orderBy(
        F.col("total_micro").desc(), F.col("cand")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wpred))
        .where(F.col("rk") == 1)
        .groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
    )


_TAG_KEYWORDS = ("data", "model", "user", "system", "market")


@register(
    "keyword_tagging",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, source,
             list_filter({list(_TAG_KEYWORDS)!r}::VARCHAR[],
                         k -> list_contains(
                           string_split_regex(trim(lower(text)), '\\s+'), k))
               AS tags
      FROM documents WHERE trim(text) <> ''
    )
    SELECT source, tag, count(*)::BIGINT AS n_docs
    FROM (SELECT source, unnest(tags) AS tag FROM tagged)
    GROUP BY source, tag
    """,
    doc="multi-keyword content tagging: each document gets the ordered "
    "subset of a fixed keyword list whose members appear as whole tokens "
    "(array_contains over the tokenized text — K membership probes per "
    "row, no join, no regex backtracking), then a per-(source, tag) "
    "rollup. The routing/labeling primitive behind topic quotas in a "
    "corpus mix. The keyword list is a broadcast-free literal array; at "
    "K in the thousands the same shape becomes the inverted-index join "
    "(token equi-join against a keyword table) — documented pivot, same "
    "semantics. Tag order is the keyword-list order on both engines "
    "(filter preserves order), so the per-doc arrays are deterministic.",
)
def keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    kw = ", ".join(f"'{k}'" for k in _TAG_KEYWORDS)
    tagged = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"filter(array({kw}), k -> array_contains("
            "filter(split(trim(lower(text)), '\\\\s+'), t -> t != ''), k))"
        ).alias("tags"),
    )
    return (
        tagged.select("source", F.explode("tags").alias("tag"))
        .groupBy("source", "tag")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "distinct_n_diversity",
    oracle=r"""
    WITH d AS (
      SELECT source,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')
               AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    uni AS (
      SELECT source, unnest(toks) AS g FROM d
    ),
    bi AS (
      SELECT source,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS g
      FROM d WHERE len(toks) >= 2
    ),
    u AS (SELECT source, count(*)::BIGINT AS total1,
                 count(DISTINCT g)::BIGINT AS uniq1
          FROM uni GROUP BY source),
    b2 AS (SELECT source, count(*)::BIGINT AS total2,
                  count(DISTINCT g)::BIGINT AS uniq2
           FROM bi GROUP BY source)
    SELECT u.source, u.total1, u.uniq1,
           CAST((1000000 * u.uniq1) // u.total1 AS BIGINT) AS distinct1_ppm,
           b2.total2, b2.uniq2,
           CAST((1000000 * b2.uniq2) // b2.total2 AS BIGINT) AS distinct2_ppm
    FROM u JOIN b2 USING (source)
    """,
    doc="distinct-n lexical diversity per source (Li et al. 2016, 'A "
    "Diversity-Promoting Objective Function for Neural Conversation "
    "Models'): distinct unigrams / total unigrams and distinct bigrams / "
    "total bigrams in exact ppm — the standard degenerate-repetition "
    "check run on generated corpora and on ingest feeds (a source whose "
    "distinct-2 collapses is boilerplate or model slop). Bigrams come "
    "from an in-array transform (no positional self-join); two hash "
    "aggregates to the |sources| grid. Linear at 100 TB.",
)
def distinct_n_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    d = docs.select("source", text_ops.tokens_col("text").alias("toks"))
    uni = d.select("source", F.explode("toks").alias("g"))
    bi = d.where(F.size("toks") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.col("toks")[i], F.col("toks")[i + 1]),
            )
        ).alias("g"),
    )
    u = uni.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total1"),
        F.countDistinct("g").cast("bigint").alias("uniq1"),
    )
    b2 = bi.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total2"),
        F.countDistinct("g").cast("bigint").alias("uniq2"),
    )
    return u.join(b2, "source").select(
        "source",
        "total1",
        "uniq1",
        F.expr("(1000000 * uniq1) div total1").cast("bigint").alias("distinct1_ppm"),
        "total2",
        "uniq2",
        F.expr("(1000000 * uniq2) div total2").cast("bigint").alias("distinct2_ppm"),
    )


def _eval_pairs(spark: SparkSession, sf_dir: str):
    """(pairs, toks) for the reference↔candidate generation-eval family:
    each document is scored as a CANDIDATE against the previous document
    of the same source (lag over (source, doc_id)) as its REFERENCE — a
    deterministic pairing with non-trivial n-gram overlap on the fixture's
    bounded vocabulary. pairs = (source, cid, rid); toks = (doc_id, ts)."""
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select("doc_id", "source", text_ops.tokens_col("text").alias("ts"))
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        toks.select(
            "source",
            F.col("doc_id").alias("cid"),
            F.lag("doc_id").over(w).alias("rid"),
        )
        .where(F.col("rid").isNotNull())
    )
    return pairs, toks


def _pair_clip_totals(pairs: DataFrame, gr: DataFrame) -> DataFrame:
    """Per-source micro totals of the clipped n-gram overlap: anchor =
    every source with >= 1 pair; m = Σ min(cand_count, ref_count), c/r =
    Σ candidate / reference gram counts over the pairs. All equi-joins on
    (doc, gram) — per-pair work ∝ the two documents' gram multisets, never
    all-pairs; linear at 100 TB."""
    candb = pairs.join(gr, pairs.cid == gr.doc_id).select(
        "source", "cid", "g", F.col("c").alias("cc")
    )
    refb = pairs.join(gr, pairs.rid == gr.doc_id).select(
        F.col("cid").alias("rcid"), F.col("g").alias("rg"), F.col("c").alias("rc")
    )
    m = (
        candb.join(refb, (candb.cid == refb.rcid) & (candb.g == refb.rg))
        .groupBy("source")
        .agg(F.sum(F.least("cc", "rc")).cast("bigint").alias("m"))
    )
    c = candb.groupBy("source").agg(F.sum("cc").cast("bigint").alias("c_tot"))
    r = (
        pairs.join(gr, pairs.rid == gr.doc_id)
        .groupBy("source")
        .agg(F.sum("c").cast("bigint").alias("r_tot"))
    )
    anchor = pairs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    return (
        anchor.join(c, "source", "left")
        .join(r, "source", "left")
        .join(m, "source", "left")
        .select(
            "source",
            "n_pairs",
            F.coalesce("m", F.lit(0)).cast("bigint").alias("m"),
            F.coalesce("c_tot", F.lit(0)).cast("bigint").alias("c_tot"),
            F.coalesce("r_tot", F.lit(0)).cast("bigint").alias("r_tot"),
        )
    )


def _bigram_counts(toks: DataFrame) -> DataFrame:
    return (
        toks.where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 2),
                    lambda i: F.concat_ws(
                        " ", F.col("ts")[i], F.col("ts")[i + 1]
                    ),
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


# shared oracle CTE prefix: tokenized docs, lag pairs, per-doc gram counts
_EVAL_PAIR_SQL = r"""
    d AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')
               AS ts
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT source, cid, rid FROM (
        SELECT source, doc_id AS cid,
               lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS rid
        FROM d
      ) WHERE rid IS NOT NULL
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS g
      FROM d WHERE len(ts) >= 2
    ),
    gr2 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM bg GROUP BY doc_id, g)
"""

_CLIP_SQL = """
    candb{n} AS (
      SELECT p.source, p.cid, g.g, g.c AS cc
      FROM pairs p JOIN gr{n} g ON p.cid = g.doc_id
    ),
    refb{n} AS (
      SELECT p.cid AS rcid, g.g AS rg, g.c AS rc
      FROM pairs p JOIN gr{n} g ON p.rid = g.doc_id
    ),
    m{n} AS (
      SELECT source, CAST(sum(least(cc, rc)) AS BIGINT) AS m
      FROM candb{n} JOIN refb{n} ON cid = rcid AND g = rg
      GROUP BY source
    ),
    c{n} AS (SELECT source, CAST(sum(cc) AS BIGINT) AS c_tot
             FROM candb{n} GROUP BY source),
    r{n} AS (
      SELECT p.source, CAST(sum(g.c) AS BIGINT) AS r_tot
      FROM pairs p JOIN gr{n} g ON p.rid = g.doc_id GROUP BY p.source
    )
"""

_ANCHOR_SQL = """
    anchor AS (SELECT source, count(*)::BIGINT AS n_pairs
               FROM pairs GROUP BY source)
"""


@register(
    "rouge2_corpus_eval",
    oracle=f"""
    WITH {_EVAL_PAIR_SQL},
    {_CLIP_SQL.format(n=2)},
    {_ANCHOR_SQL}
    SELECT a.source, a.n_pairs,
           coalesce(m2.m, 0)::BIGINT AS matched,
           coalesce(c2.c_tot, 0)::BIGINT AS cand_bigrams,
           coalesce(r2.r_tot, 0)::BIGINT AS ref_bigrams,
           CASE WHEN coalesce(c2.c_tot, 0) > 0
                THEN CAST((1000000 * coalesce(m2.m, 0)) // c2.c_tot AS BIGINT)
           END AS precision_ppm,
           CASE WHEN coalesce(r2.r_tot, 0) > 0
                THEN CAST((1000000 * coalesce(m2.m, 0)) // r2.r_tot AS BIGINT)
           END AS recall_ppm,
           CASE WHEN coalesce(c2.c_tot, 0) + coalesce(r2.r_tot, 0) > 0
                THEN CAST((2000000 * coalesce(m2.m, 0))
                          // (c2.c_tot + r2.r_tot) AS BIGINT)
           END AS f1_ppm
    FROM anchor a
    LEFT JOIN c2 ON c2.source = a.source
    LEFT JOIN r2 ON r2.source = a.source
    LEFT JOIN m2 ON m2.source = a.source
    """,
    doc="micro-averaged corpus ROUGE-2 per source (Lin 2004, 'ROUGE: A "
    "Package for Automatic Evaluation of Summaries'): each document scores "
    "as candidate against the previous same-source document as reference "
    "(deterministic lag pairing); matched = clipped bigram-multiset "
    "intersection per pair; precision/recall/F1 from the per-source "
    "INTEGER totals in exact ppm (F1 = 2M/(C+R) — one integer division, "
    "no float summation anywhere). The generation-eval staple for "
    "summarization corpora, here doubling as a near-boilerplate detector "
    "on ingest feeds (consecutive docs sharing most bigrams). Per-pair "
    "work is two (doc, gram) equi-joins — never all-pairs; three hash "
    "aggregates to the |sources| grid. Linear at 100 TB.",
)
def rouge2_corpus_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, toks = _eval_pairs(spark, sf_dir)
    tot = _pair_clip_totals(pairs, _bigram_counts(toks))
    return tot.select(
        "source",
        "n_pairs",
        F.col("m").alias("matched"),
        F.col("c_tot").alias("cand_bigrams"),
        F.col("r_tot").alias("ref_bigrams"),
        F.expr(
            "CASE WHEN c_tot > 0 THEN CAST((1000000 * m) div c_tot AS BIGINT) END"
        ).alias("precision_ppm"),
        F.expr(
            "CASE WHEN r_tot > 0 THEN CAST((1000000 * m) div r_tot AS BIGINT) END"
        ).alias("recall_ppm"),
        F.expr(
            "CASE WHEN c_tot + r_tot > 0 "
            "THEN CAST((2000000 * m) div (c_tot + r_tot) AS BIGINT) END"
        ).alias("f1_ppm"),
    )


@register(
    "bleu2_corpus_eval",
    oracle=f"""
    WITH {_EVAL_PAIR_SQL},
    ug AS (SELECT doc_id, unnest(ts) AS g FROM d),
    gr1 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM ug GROUP BY doc_id, g),
    {_CLIP_SQL.format(n=1)},
    {_CLIP_SQL.format(n=2)},
    {_ANCHOR_SQL}
    SELECT a.source, a.n_pairs,
           coalesce(m1.m, 0)::BIGINT AS m1,
           coalesce(c1.c_tot, 0)::BIGINT AS cand_len,
           coalesce(r1.r_tot, 0)::BIGINT AS ref_len,
           coalesce(m2.m, 0)::BIGINT AS m2,
           coalesce(c2.c_tot, 0)::BIGINT AS c2,
           round(CASE WHEN coalesce(m1.m, 0) = 0 OR coalesce(m2.m, 0) = 0
                      THEN CAST(0 AS DOUBLE)
                      ELSE (CASE WHEN c1.c_tot >= r1.r_tot THEN CAST(1 AS DOUBLE)
                                 ELSE exp(CAST(1 AS DOUBLE)
                                          - CAST(r1.r_tot AS DOUBLE) / c1.c_tot)
                            END)
                           * sqrt((CAST(m1.m AS DOUBLE) / c1.c_tot)
                                  * (CAST(m2.m AS DOUBLE) / c2.c_tot))
                 END, 6) AS bleu2
    FROM anchor a
    LEFT JOIN c1 ON c1.source = a.source
    LEFT JOIN r1 ON r1.source = a.source
    LEFT JOIN m1 ON m1.source = a.source
    LEFT JOIN c2 ON c2.source = a.source
    LEFT JOIN m2 ON m2.source = a.source
    """,
    doc="corpus BLEU-2 per source (Papineni et al. 2002): modified "
    "(clipped) unigram and bigram precisions from per-source INTEGER "
    "numerators/denominators over the lag-paired candidate↔reference "
    "docs, brevity penalty exp(1 - r/c) when the candidate side is "
    "shorter, score = BP * sqrt(p1 * p2). All counting is exact BIGINT; "
    "the only float math is the final fixed-order expression (two "
    "divisions, one sqrt — IEEE-correctly-rounded — and at most one exp, "
    "written identically on both engines per the shared-formula rule), "
    "rounded to 6 dp. Same two-equi-join clip shape as rouge2 at both "
    "gram orders; linear at 100 TB.",
)
def bleu2_corpus_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, toks = _eval_pairs(spark, sf_dir)
    gr1 = (
        toks.select("doc_id", F.explode("ts").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    t1 = _pair_clip_totals(pairs, gr1).select(
        "source",
        "n_pairs",
        F.col("m").alias("m1"),
        F.col("c_tot").alias("cand_len"),
        F.col("r_tot").alias("ref_len"),
    )
    t2 = _pair_clip_totals(pairs, _bigram_counts(toks)).select(
        "source", F.col("m").alias("m2"), F.col("c_tot").alias("c2")
    )
    return t1.join(t2, "source").select(
        "source",
        "n_pairs",
        "m1",
        "cand_len",
        "ref_len",
        "m2",
        "c2",
        F.round(
            F.expr(
                "CASE WHEN m1 = 0 OR m2 = 0 THEN CAST(0 AS DOUBLE) "
                "ELSE (CASE WHEN cand_len >= ref_len THEN CAST(1 AS DOUBLE) "
                "           ELSE exp(CAST(1 AS DOUBLE) "
                "                    - CAST(ref_len AS DOUBLE) / cand_len) END) "
                "     * sqrt((CAST(m1 AS DOUBLE) / cand_len) "
                "            * (CAST(m2 AS DOUBLE) / c2)) END"
            ),
            6,
        ).alias("bleu2"),
    )


@register(
    "chrf3_corpus_eval",
    oracle=f"""
    WITH {_EVAL_PAIR_SQL},
    ch AS (
      SELECT doc_id, regexp_replace(trim(text), '\\s+', '', 'g') AS s
      FROM documents WHERE trim(text) <> ''
    ),
    cg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(s) - 2),
                    i -> substr(s, i, 3))) AS g
      FROM ch WHERE length(s) >= 3
    ),
    gr3 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM cg GROUP BY doc_id, g),
    {_CLIP_SQL.format(n=3)},
    {_ANCHOR_SQL}
    SELECT a.source, a.n_pairs,
           coalesce(m3.m, 0)::BIGINT AS matched,
           coalesce(c3.c_tot, 0)::BIGINT AS cand_grams,
           coalesce(r3.r_tot, 0)::BIGINT AS ref_grams,
           CASE WHEN 4 * coalesce(r3.r_tot, 0) + coalesce(c3.c_tot, 0) > 0
                THEN CAST((5000000 * coalesce(m3.m, 0))
                          // (4 * r3.r_tot + c3.c_tot) AS BIGINT)
           END AS chrf3_f2_ppm
    FROM anchor a
    LEFT JOIN c3 ON c3.source = a.source
    LEFT JOIN r3 ON r3.source = a.source
    LEFT JOIN m3 ON m3.source = a.source
    """,
    doc="character-3-gram F2 per source (Popović 2015, 'chrF: character "
    "n-gram F-score for automatic MT evaluation', single-order n=3 "
    "variant): whitespace-stripped character 3-grams, clipped multiset "
    "intersection over the lag pairs, and the recall-weighted F2 from "
    "integer micro totals — F2 = (1+β²)PR/(β²P+R) with β=2 reduces to "
    "5M/(4R+C), ONE integer division in exact ppm, no float anywhere. "
    "The tokenization-free companion to rouge2/bleu2 (robust to "
    "morphology and tokenizer drift). Character explode is ~|chars| rows "
    "per doc — the same linear shape as the shingle dedup family.",
)
def chrf3_corpus_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _ = _eval_pairs(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    ch = docs.select(
        "doc_id",
        F.regexp_replace(F.trim("text"), r"\s+", "").alias("s"),
    )
    gr3 = (
        ch.where(F.length("s") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(s) - 2),"
                    " i -> substring(s, i, 3))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = _pair_clip_totals(pairs, gr3)
    return tot.select(
        "source",
        "n_pairs",
        F.col("m").alias("matched"),
        F.col("c_tot").alias("cand_grams"),
        F.col("r_tot").alias("ref_grams"),
        F.expr(
            "CASE WHEN 4 * r_tot + c_tot > 0 "
            "THEN CAST((5000000 * m) div (4 * r_tot + c_tot) AS BIGINT) END"
        ).alias("chrf3_f2_ppm"),
    )


