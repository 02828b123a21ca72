"""Retrieval scoring, model inference, and distributional-statistics queries.

The pipeline steps between "corpus is clean" and "corpus is training data":
keyword retrieval (BM25 — audit/evaluation probes into the corpus), quality
filtering by a trained linear classifier (the fastText/CCNet deployment
shape: hashing-trick features × a broadcast weight table), and skip-gram
PMI (the word2vec-style association statistics that feed tokenizer and
phrase-mining decisions). All pure `pyspark.sql.functions` column math over
the engine-portable md5-prefix hash family — each oracle recomputes the
identical numbers in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators import retrieval as ret_ops
from map_reduce_engine_spark.operators import text as text_ops
from map_reduce_engine_spark.queries.base import register, t

# DuckDB-side tokenizer mirroring operators/text.py::tokens_col — unnest the
# whitespace split, drop empties (same filter the Spark side applies).
_DUCK_TOK_STREAM = r"""
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents WHERE trim(text) <> ''
  ) WHERE token <> ''
"""

_BM25_TERMS = ["spark", "join", "window", "vector"]
_BM25_TERMS_SQL = ", ".join(f"'{x}'" for x in _BM25_TERMS)


@register(
    "bm25_doc_scores",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK_STREAM}),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
    corpus AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok
      WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token
    ),
    dft AS (SELECT token, count(*)::BIGINT AS dft FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (corpus.n_docs - dft.dft + 0.5) / (dft.dft + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl))
             ), 6) AS bm25,
             count(*)::BIGINT AS n_terms_matched
      FROM tf JOIN dft USING (token) JOIN dl USING (doc_id), corpus
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, n_terms_matched
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    doc="Okapi BM25 top-20 against a fixed query-term set: corpus-side "
    "work is two hash aggregates (doc lengths; per-(doc, term) tf with the "
    "term filter pushed BEFORE the aggregate — an inverted-index probe), "
    "df/corpus-stat sides are broadcast, ranking is TakeOrderedAndProject. "
    "The retrieval/audit probe a corpus pipeline runs against 100 TB "
    "without a global sort",
)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return ret_ops.bm25_scores(docs, "doc_id", "text", _BM25_TERMS)


@register(
    "quality_linear_score",
    oracle=f"""
    WITH w AS (
      SELECT j AS bucket,
             ((({ret_ops.WEIGHT_A} * j + {ret_ops.WEIGHT_B}) % 2147483648)
              / 2147483648.0 - 0.5) * 0.2 AS w
      FROM generate_series(0, 1023) AS t(j)
    ),
    tok AS ({_DUCK_TOK_STREAM}),
    feats AS (
      SELECT doc_id,
             (('0x' || substr(md5(token), 1, 8))::BIGINT & 2147483647) % 1024
               AS bucket,
             count(*)::BIGINT AS x
      FROM tok GROUP BY 1, 2
    ),
    logits AS (
      SELECT doc_id, sum(x * w.w) + (-3.0) AS logit
      FROM feats JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, round(logit, 6) AS logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
           logit >= 0 AS keep
    FROM logits
    """,
    doc="linear quality-classifier inference via the hashing trick: tokens "
    "hash into 1024 buckets (portable md5-prefix base), per-(doc, bucket) "
    "counts aggregate map-side, and the weight vector joins in as a "
    "1024-row BROADCAST table — model deployment as a dimension-table "
    "join, no Python, no model artifact on executors. Weights are "
    "affine-derived so the oracle regenerates them from generate_series",
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return ret_ops.hashed_linear_score(docs, "doc_id", "text")


@register(
    "token_pmi",
    oracle=r"""
    WITH d AS (
      SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')
               AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT p.w1, p.w2 FROM (
        SELECT unnest(list_concat(
          list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                         i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])),
          list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                         i -> struct_pack(w1 := toks[i], w2 := toks[i + 2]))
        )) AS p FROM d
      )
    ),
    pc AS (SELECT w1, w2, count(*)::BIGINT AS pair_cnt FROM pairs GROUP BY w1, w2),
    uni AS (
      SELECT w, count(*)::BIGINT AS cnt FROM (SELECT unnest(toks) AS w FROM d)
      GROUP BY w
    ),
    tot AS (
      SELECT (SELECT sum(pair_cnt) FROM pc) AS t_pairs,
             (SELECT sum(cnt) FROM uni) AS u_tokens
    )
    SELECT pc.w1, pc.w2, pc.pair_cnt,
           round(ln((pc.pair_cnt / tot.t_pairs)
                    / ((u1.cnt / tot.u_tokens) * (u2.cnt / tot.u_tokens))), 6)
             AS pmi
    FROM pc
    JOIN uni u1 ON u1.w = pc.w1
    JOIN uni u2 ON u2.w = pc.w2, tot
    WHERE pc.pair_cnt >= 5
    """,
    doc="skip-gram PMI co-occurrence (window=2) with ZERO corpus-side "
    "joins: pair generation is transform(sequence(...)) over the token "
    "array inside one codegen projection (the naive plan posexplodes and "
    "self-joins on (doc, pos+d) — a corpus-sized shuffle join per offset). "
    "Only shuffles are the two hash aggregates; unigram/total tables are "
    "vocabulary-sized broadcasts. The word2vec/phrase-mining statistics "
    "pass over a 100 TB corpus",
)
def token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return text_ops.skipgram_pairs(docs, "doc_id", "text", window=2, min_count=5)
