"""Retrieval scoring, model inference, and distributional-statistics queries.

The pipeline steps between "corpus is clean" and "corpus is training data":
keyword retrieval (BM25 — audit/evaluation probes into the corpus), quality
filtering by a trained linear classifier (the fastText/CCNet deployment
shape: hashing-trick features × a broadcast weight table), skip-gram
PMI (the word2vec-style association statistics that feed tokenizer and
phrase-mining decisions), and BPE tokenizer training (iterative merge
learning over the word-frequency dictionary). All pure
`pyspark.sql.functions` column math — each oracle recomputes the identical
numbers in DuckDB (iterative rounds unroll into materialized CTEs).
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


def _bpe_oracle(n_merges: int, final_select: str | None = None) -> str:
    """Unrolled-CTE DuckDB twin of ``operators/bpe.py::bpe_train``.

    Same discipline as the pagerank oracle (queries/advanced.py): the
    iterative loop is a FIXED number of rounds, so each round unrolls into
    the identical relational steps — pair window, weighted argmax with the
    (count desc, lhs, rhs) tiebreak, greedy leftmost-run merge, renumber.

    Every per-round CTE is ``AS MATERIALIZED``: several are referenced more
    than once, and DuckDB's default inlining would expand the round chain
    exponentially (~3^rounds copies of the whole tree — observed as a
    minutes-long hang at 6 rounds).
    """
    parts = [f"tok AS ({_DUCK_TOK_STREAM})"]
    parts.append(
        "words AS (SELECT token AS word, count(*)::BIGINT AS wcnt FROM tok GROUP BY token)"
    )
    parts.append(
        """s0 AS (
      SELECT word, wcnt, p.pos, p.sym FROM (
        SELECT word, wcnt,
               unnest(list_transform(generate_series(1, length(word) + 1),
                 i -> struct_pack(pos := i,
                                  sym := CASE WHEN i <= length(word)
                                              THEN substr(word, i, 1)
                                              ELSE '</w>' END))) AS p
        FROM words)
    )"""
    )
    selects = []
    prev = "s0"
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS (
      SELECT word, wcnt, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM {prev}
    ),
    b{r} AS MATERIALIZED (
      SELECT sym AS l, nxt AS rc, sum(wcnt)::BIGINT AS pair_cnt
      FROM p{r} WHERE nxt IS NOT NULL
      GROUP BY sym, nxt
      ORDER BY pair_cnt DESC, sym, nxt
      LIMIT 1
    ),
    m{r} AS MATERIALIZED (
      SELECT p.word, p.wcnt, p.pos, p.sym, p.nxt,
             (p.sym = b.l AND p.nxt = b.rc) AS cand
      FROM p{r} p, b{r} b
    ),
    k{r} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos,
               row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
        FROM (
          SELECT word, pos,
                 pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM m{r} WHERE cand
        )
      ) WHERE rn % 2 = 1
    ),
    s{r} AS MATERIALIZED (
      SELECT word, wcnt,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN is_merge THEN sym || nxt ELSE sym END AS sym
      FROM (
        SELECT m.word, m.wcnt, m.pos, m.sym, m.nxt,
               k.pos IS NOT NULL AS is_merge,
               ka.pos IS NOT NULL AS absorbed
        FROM m{r} m
        LEFT JOIN k{r} k ON k.word = m.word AND k.pos = m.pos
        LEFT JOIN k{r} ka ON ka.word = m.word AND ka.pos = m.pos - 1
      ) WHERE NOT absorbed
    )"""
        )
        selects.append(
            f"SELECT {r}::BIGINT AS round, l AS lhs, rc AS rhs, l || rc AS merged, pair_cnt FROM b{r}"
        )
        prev = f"s{r}"
    body = final_select.format(final=prev) if final_select else "\nUNION ALL\n".join(selects)
    return "WITH " + ",\n    ".join(parts) + "\n" + body


@register(
    "bpe_train_merges",
    oracle=_bpe_oracle(6),
    doc="BPE tokenizer training (Sennrich et al., ACL'16) as an iterative "
    "DataFrame loop: 6 merge rounds over the word-frequency dictionary. "
    "The corpus is aggregated ONCE into (word, count); every round then "
    "runs on the exploded symbol table — vocabulary-sized by Heaps' law, "
    "corpus-size-independent (how real BPE trainers scale). Per round: "
    "per-word lead() window (bounded state), weighted pair aggregate, "
    "deterministic argmax (TakeOrderedAndProject + 1-row broadcast), and "
    "the greedy leftmost non-overlapping merge encoded with run-grouping "
    "windows — the sequential scan, made relational and engine-portable. "
    "Oracle = the same 6 rounds unrolled into CTEs, like the pagerank "
    "oracle. Lineage is localCheckpoint-truncated per round "
    "(operators/graph.py discipline)",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import bpe

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    words = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )
    return bpe.bpe_train(words, n_merges=6)


@register(
    "bpe_subword_vocab",
    oracle=_bpe_oracle(
        6,
        final_select="""SELECT sym, sum(wcnt)::BIGINT AS occurrences,
       count(DISTINCT word)::BIGINT AS n_word_types
    FROM {final} GROUP BY sym""",
    ),
    doc="the ENCODE side of BPE: the subword vocabulary after 6 learned "
    "merges — each symbol's weighted corpus occurrences and the number of "
    "word types containing it. Tokenization is per WORD TYPE, so encoding "
    "a 100 TB corpus segments the vocabulary-sized dictionary once "
    "(operators/bpe.py::bpe_segment) and joins back to the token stream; "
    "the corpus never re-enters the merge loop. Shares the training "
    "rounds (and the unrolled-CTE oracle) with bpe_train_merges",
)
def bpe_subword_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import bpe

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    words = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )
    syms = bpe.bpe_segment(words, n_merges=6)
    return syms.groupBy("sym").agg(
        F.sum("wcnt").cast("bigint").alias("occurrences"),
        F.countDistinct("word").cast("bigint").alias("n_word_types"),
    )


@register(
    "bpe_fertility",
    oracle=_bpe_oracle(
        6,
        final_select=r"""SELECT st.source,
       sum(st.c * sw.n_sub)::BIGINT AS total_subwords,
       sum(st.c)::BIGINT AS total_words,
       round(sum(st.c * sw.n_sub) * 1.0 / sum(st.c), 4) AS fertility
    FROM (
      SELECT source, token AS word, count(*)::BIGINT AS c FROM (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> '' GROUP BY source, token
    ) st
    JOIN (SELECT word, count(*)::BIGINT AS n_sub FROM {final} GROUP BY word) sw
      ON sw.word = st.word
    GROUP BY st.source""",
    ),
    doc="per-source tokenizer fertility (subwords emitted per word) after "
    "the 6 learned BPE merges — the number that decides whether a "
    "tokenizer is fair to a domain/language (high fertility = more "
    "compute per word). Segmentation runs once on the vocabulary-sized "
    "dictionary; the per-word subword count joins the per-(source, word) "
    "counts as a vocabulary-sized BROADCAST, and the ratio divides exact "
    "integer sums (IEEE-exact). Shares the training rounds and "
    "unrolled-CTE oracle with bpe_train_merges",
)
def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import bpe

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    words = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )
    n_sub = (
        bpe.bpe_segment(words, n_merges=6)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_sub"))
    )
    st = (
        docs.select("source", F.explode(text_ops.tokens_col("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return (
        st.join(F.broadcast(n_sub), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("n_sub")).cast("bigint").alias("total_subwords"),
            F.sum("c").cast("bigint").alias("total_words"),
            F.round(
                F.sum(F.col("c") * F.col("n_sub")) * 1.0 / F.sum("c"), 4
            ).alias("fertility"),
        )
    )


_RRF_COS = (
    "list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) * "
    "sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))"
)


@register(
    "rrf_fusion_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    cscored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, round({_RRF_COS}, 6) AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    cr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cscored
    ),
    ctop AS (SELECT query_id, neighbor_id, 1000000000 // (60 + rank) AS ca FROM cr WHERE rank <= 50),
    codes AS (
      SELECT vec_id,
        list_sum(list_transform(range(1, 33),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT AS lo,
        list_sum(list_transform(range(33, 65),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END))::BIGINT AS hi
      FROM embeddings
    ),
    hq AS (SELECT vec_id AS query_id, lo, hi FROM codes WHERE vec_id < 5),
    hscored AS (
      SELECT hq.query_id, c.vec_id AS neighbor_id,
             (bit_count(xor(c.lo, hq.lo)::BIT) + bit_count(xor(c.hi, hq.hi)::BIT)) AS hamming
      FROM hq JOIN codes c ON c.vec_id <> hq.query_id
    ),
    hr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
      FROM hscored
    ),
    htop AS (SELECT query_id, neighbor_id, 1000000000 // (60 + rank) AS cb FROM hr WHERE rank <= 50),
    fused AS (
      SELECT query_id, neighbor_id, (coalesce(ca, 0) + coalesce(cb, 0))::BIGINT AS rrf_nano
      FROM ctop FULL OUTER JOIN htop USING (query_id, neighbor_id)
    ),
    out AS (
      SELECT query_id, neighbor_id, rrf_nano,
             row_number() OVER (PARTITION BY query_id ORDER BY rrf_nano DESC, neighbor_id) AS fused_rank
      FROM fused
    )
    SELECT query_id, neighbor_id, rrf_nano, fused_rank::BIGINT AS fused_rank
    FROM out WHERE fused_rank <= 10
    """,
    doc="reciprocal-rank fusion (operators/retrieval.py::rrf_fuse): the "
    "exact-cosine and binary-Hamming rankers' top-50 lists fuse per query "
    "by sum of 1/(60+rank), computed in integer nano-units (BIGINT div) so "
    "both engines agree bit-for-bit. The hybrid-retrieval primitive "
    "(dense + sparse/binary) — fusion work is candidate-list-sized "
    "(n_queries x 50), never corpus-sized, one outer join + window",
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import similarity as sim

    emb = t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 5)
    cos50 = sim.cosine_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=50)
    ham50 = sim.hamming_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=50)
    return ret_ops.rrf_fuse(
        [
            cos50.select("query_id", "neighbor_id", "rank"),
            ham50.select("query_id", "neighbor_id", "rank"),
        ],
        k=10,
    )


@register(
    "query_likelihood_dirichlet",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK_STREAM}),
    per_doc AS (
      SELECT doc_id, count(*)::BIGINT AS dl,
             CAST(sum(CASE WHEN token = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
             CAST(sum(CASE WHEN token = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
             CAST(sum(CASE WHEN token = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf2,
             CAST(sum(CASE WHEN token = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf3
      FROM tok GROUP BY doc_id
    ),
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS tot,
             CAST(sum(CASE WHEN token = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS cf0,
             CAST(sum(CASE WHEN token = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS cf1,
             CAST(sum(CASE WHEN token = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS cf2,
             CAST(sum(CASE WHEN token = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS cf3
      FROM tok
    ),
    scored AS (
      SELECT d.doc_id, d.dl,
             round(
               ln((d.tf0 + CAST(100 AS DOUBLE) * c.cf0 / c.tot) / (d.dl + CAST(100 AS DOUBLE)))
             + ln((d.tf1 + CAST(100 AS DOUBLE) * c.cf1 / c.tot) / (d.dl + CAST(100 AS DOUBLE)))
             + ln((d.tf2 + CAST(100 AS DOUBLE) * c.cf2 / c.tot) / (d.dl + CAST(100 AS DOUBLE)))
             + ln((d.tf3 + CAST(100 AS DOUBLE) * c.cf3 / c.tot) / (d.dl + CAST(100 AS DOUBLE))), 6)
               AS loglik,
             CAST(((d.tf0 > 0)::INT + (d.tf1 > 0)::INT + (d.tf2 > 0)::INT
                   + (d.tf3 > 0)::INT) AS BIGINT) AS n_terms_present
      FROM per_doc d CROSS JOIN corpus c
    )
    SELECT doc_id, dl, loglik, n_terms_present
    FROM scored ORDER BY loglik DESC, doc_id LIMIT 20
    """,
    doc="query-likelihood retrieval with Dirichlet smoothing (Ponte & "
    "Croft 1998; Zhai & Lafferty 2001), mu=100, over the same fixed "
    "4-term query as bm25_doc_scores — the language-modeling retrieval "
    "twin beside BM25's probabilistic one. score(d) = sum_i ln((tf_i + "
    "mu*cf_i/|C|) / (|d| + mu)); smoothing scores EVERY document (absent "
    "terms contribute the corpus prior), so per-doc term frequencies come "
    "from ONE conditional hash aggregate over the token stream (no "
    "per-term join), corpus stats are a 1-row broadcast, and the four "
    "ln terms sum in a FIXED-ORDER expression — unlike an aggregate "
    "float sum, bit-stable on both engines. Top-20 is "
    "TakeOrderedAndProject; one corpus pass total. Linear at 100 TB.",
)
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    tok = docs.select(
        "doc_id", F.explode(text_ops.tokens_col("text")).alias("token")
    )
    terms = _BM25_TERMS
    tf_aggs = [
        F.sum((F.col("token") == w).cast("int")).cast("bigint").alias(f"tf{i}")
        for i, w in enumerate(terms)
    ]
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl"), *tf_aggs
    )
    cf_aggs = [
        F.sum((F.col("token") == w).cast("int")).cast("bigint").alias(f"cf{i}")
        for i, w in enumerate(terms)
    ]
    corpus = tok.agg(F.count("*").cast("bigint").alias("tot"), *cf_aggs)
    mu = "CAST(100 AS DOUBLE)"
    score = " + ".join(
        f"ln((tf{i} + {mu} * cf{i} / tot) / (dl + {mu}))" for i in range(4)
    )
    present = " + ".join(f"CAST(tf{i} > 0 AS INT)" for i in range(4))
    return (
        per_doc.crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "dl",
            F.round(F.expr(score), 6).alias("loglik"),
            F.expr(f"CAST({present} AS BIGINT)").alias("n_terms_present"),
        )
        .orderBy(F.desc("loglik"), "doc_id")
        .limit(20)
    )


def _unigram_vcost(src: str, out: str) -> str:
    return f"""{out} AS MATERIALIZED (
      SELECT piece, cnt,
             (-round(ln((2 * cnt + 1)::DOUBLE / (2 * t.total + t.nv)::DOUBLE) * 1e6))::BIGINT
               AS cost
      FROM {src}, (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS nv FROM {src}) t
    )"""


# Prune-schedule constants — must mirror operators/unigram_lm.py exactly
# (seed cap 70 at count floor 2, target 40 multi-char pieces, 2 prune
# rounds under the 0.75 keep fraction: 70 → 53 → 40, then one final
# EM round on the target vocabulary). The cap at 70 (not larger) keeps the
# schedule at 2 prune rounds so the 3-word-pass training chain stays under
# the sweep's 10 s per-entry budget at sf0.01.
_UNI_SEED_MULTI = 70
_UNI_FLOOR = 2
_UNI_TARGET = 40
_UNI_PRUNE_ROUNDS = 2
_UNI_VFINAL = f"e{_UNI_PRUNE_ROUNDS + 1}"  # final-EM vocabulary CTE (e3)
_UNI_BFINAL = f"b{_UNI_PRUNE_ROUNDS + 2}"  # encode-pass best-path CTE (b4)


def _uni_word_pass(parts: list, r: int, vcte: str) -> None:
    """Append one Viterbi word pass under vocabulary CTE ``vcte``: the
    4-squaring min-plus chain a{r}_0..a{r}_4 plus the best-path pick b{r}."""
    parts.append(
        f"""a{r}_0 AS MATERIALIZED (
      SELECT e.word, e.j, e.i, v.cost, e.piece AS path
      FROM edges e JOIN {vcte} v ON v.piece = e.piece
    )"""
    )
    for s in range(1, 5):
        parts.append(
            f"""a{r}_{s} AS MATERIALIZED (
      SELECT word, j, i, cost, path FROM (
        SELECT word, j, i, cost, path,
               row_number() OVER (PARTITION BY word, j, i ORDER BY cost, path) AS rn
        FROM (
          SELECT word, j, i, cost, path FROM a{r}_{s - 1}
          UNION ALL
          SELECT x.word, x.j, y.i, x.cost + y.cost, x.path || ' ' || y.path
          FROM a{r}_{s - 1} x JOIN a{r}_{s - 1} y ON y.word = x.word AND y.j = x.i
        )
      ) WHERE rn = 1
    )"""
        )
    parts.append(
        f"""b{r} AS MATERIALIZED (
      SELECT w.word, w.wcnt, a.cost, a.path
      FROM words w JOIN a{r}_4 a
        ON a.word = w.word AND a.j = 0 AND a.i = length(w.word)
    )"""
    )


def _uni_recount(parts: list, r: int, vprev: str) -> None:
    """Append the M-step: weighted piece recount c{r} along b{r}'s paths,
    then the re-estimated full vocabulary e{r}c (counts) / e{r} (costs)."""
    parts.append(
        f"""c{r} AS (SELECT piece, sum(wcnt)::BIGINT AS cnt FROM (
          SELECT wcnt, unnest(string_split(path, ' ')) AS piece FROM b{r}) GROUP BY piece)"""
    )
    parts.append(
        f"""e{r}c AS MATERIALIZED (
          SELECT v.piece, coalesce(c.cnt, 0)::BIGINT AS cnt
          FROM {vprev} v LEFT JOIN c{r} c USING (piece))"""
    )
    parts.append(_unigram_vcost(f"e{r}c", f"e{r}"))


def _uni_prune(parts: list, r: int) -> None:
    """Append the Kudo prune: alt-segmentation DP over the PIECE strings
    (full-span self edge excluded; 2 squarings cover ≤4-char pieces, MIN
    aggregate — no path needed), removal loss = cnt·(alt−cost), keep the
    top max(target, ceil(0.75·n)) multi-char pieces, re-smooth → v{r}."""
    parts.append(
        f"""pw{r} AS (SELECT piece AS pword, length(piece) AS plen
          FROM e{r} WHERE length(piece) > 1)"""
    )
    parts.append(
        f"""p{r}_0 AS MATERIALIZED (
      SELECT s.pword, s.plen, s.j, s.i, v.cost
      FROM (
        SELECT pword, plen, e.j AS j, e.i AS i,
               substr(pword, e.j + 1, e.i - e.j) AS sub
        FROM (
          SELECT pword, plen,
                 unnest(flatten(list_transform(generate_series(0, length(pword) - 1),
                   j -> list_transform(generate_series(j + 1, least(j + 4, length(pword))),
                     i -> struct_pack(j := j, i := i))))) AS e
          FROM pw{r})
      ) s JOIN e{r} v ON v.piece = s.sub
      WHERE NOT (s.j = 0 AND s.i = s.plen)
    )"""
    )
    for s in (1, 2):
        parts.append(
            f"""p{r}_{s} AS MATERIALIZED (
      SELECT pword, plen, j, i, min(cost) AS cost FROM (
        SELECT pword, plen, j, i, cost FROM p{r}_{s - 1}
        UNION ALL
        SELECT x.pword, x.plen, x.j, y.i, x.cost + y.cost
        FROM p{r}_{s - 1} x JOIN p{r}_{s - 1} y ON y.pword = x.pword AND y.j = x.i
      ) GROUP BY pword, plen, j, i
    )"""
        )
    parts.append(
        f"""l{r} AS MATERIALIZED (
      SELECT v.piece, v.cnt, v.cnt * (p.cost - v.cost) AS loss
      FROM e{r} v JOIN (SELECT pword, cost FROM p{r}_2 WHERE j = 0 AND i = plen) p
        ON p.pword = v.piece
    )"""
    )
    parts.append(
        f"""v{r}c AS MATERIALIZED (
      SELECT piece, cnt FROM e{r}c WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY loss DESC, piece) AS rn,
               count(*) OVER () AS nm
        FROM l{r}
      ) WHERE rn <= greatest({_UNI_TARGET}, (3 * nm + 3) // 4)
    )"""
    )
    parts.append(_unigram_vcost(f"v{r}c", f"v{r}"))


def _uni_nbest_pass(parts: list, vcte: str, k: int = 2) -> None:
    """Append the k-best encode chain n_0..n_4 under vocabulary ``vcte``:
    per squaring, union the midpoint self-composition, collapse duplicate
    paths (same path via several midpoints — identical BIGINT cost), keep
    the k best per (word, j, i) by (cost, path)."""
    parts.append(
        f"""n_0 AS MATERIALIZED (
      SELECT e.word, e.j, e.i, v.cost, e.piece AS path
      FROM edges e JOIN {vcte} v ON v.piece = e.piece
    )"""
    )
    for s in range(1, 5):
        parts.append(
            f"""n_{s} AS MATERIALIZED (
      SELECT word, j, i, cost, path FROM (
        SELECT word, j, i, cost, path,
               row_number() OVER (PARTITION BY word, j, i ORDER BY cost, path) AS rn
        FROM (
          SELECT DISTINCT word, j, i, cost, path FROM (
            SELECT word, j, i, cost, path FROM n_{s - 1}
            UNION ALL
            SELECT x.word, x.j, y.i, x.cost + y.cost, x.path || ' ' || y.path
            FROM n_{s - 1} x JOIN n_{s - 1} y ON y.word = x.word AND y.j = x.i
          )
        )
      ) WHERE rn <= {k}
    )"""
    )
    parts.append(
        """nb AS MATERIALIZED (
      SELECT w.word, w.wcnt,
             row_number() OVER (PARTITION BY w.word ORDER BY s.cost, s.path)
               AS rank,
             s.cost, s.path
      FROM words w JOIN n_4 s
        ON s.word = w.word AND s.j = 0 AND s.i = length(w.word)
    )"""
    )


def _unigram_oracle(extra_pass: bool, final_select: str) -> str:
    """Unrolled-CTE DuckDB twin of ``operators/unigram_lm.py``'s
    prune-to-target Viterbi-EM (Kudo ACL'18 §3.2).

    Same discipline as ``_bpe_oracle``: the fixed-round loop unrolls into
    identical relational steps — large floored seed, add-half-smoothed
    micro-nat costs, and per prune round a min-plus path-doubling chain
    (4 squarings cover the 16-char word cap), the best-path pick, the
    weighted recount, the piece-string alt-cost DP (2 squarings, full-span
    self edge excluded), the loss ranking with the integer-exact keep
    count greatest(target, (3n+3)//4), and the survivor re-smooth; then a
    final EM round on the target vocabulary. Every multiply-referenced CTE
    is MATERIALIZED (DuckDB's default inlining would expand the chain
    exponentially, the _bpe_oracle lesson). ``extra_pass=True`` adds one
    more Viterbi pass under the FINAL vocabulary — the encode side (b4);
    ``extra_pass="nbest"`` adds the 2-best encode chain instead (nb).
    """
    parts = [f"tok AS ({_DUCK_TOK_STREAM})"]
    parts.append(
        "words AS MATERIALIZED (SELECT token AS word, count(*)::BIGINT AS wcnt "
        "FROM tok WHERE length(token) BETWEEN 1 AND 16 GROUP BY token)"
    )
    parts.append(
        """edges AS MATERIALIZED (
      SELECT word, wcnt, e.j AS j, e.i AS i, substr(word, e.j + 1, e.i - e.j) AS piece FROM (
        SELECT word, wcnt,
               unnest(flatten(list_transform(generate_series(0, length(word) - 1),
                 j -> list_transform(generate_series(j + 1, least(j + 4, length(word))),
                   i -> struct_pack(j := j, i := i))))) AS e
        FROM words)
    )"""
    )
    parts.append("seed AS (SELECT piece, sum(wcnt)::BIGINT AS cnt FROM edges GROUP BY piece)")
    parts.append(
        f"""v0c AS MATERIALIZED (
      SELECT piece, cnt FROM seed WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
        FROM seed WHERE length(piece) > 1 AND cnt >= {_UNI_FLOOR})
      WHERE rn <= {_UNI_SEED_MULTI}
    )"""
    )
    parts.append(_unigram_vcost("v0c", "v0"))
    for r in range(1, _UNI_PRUNE_ROUNDS + 1):
        _uni_word_pass(parts, r, f"v{r - 1}")
        _uni_recount(parts, r, f"v{r - 1}")
        _uni_prune(parts, r)
    rf = _UNI_PRUNE_ROUNDS + 1
    _uni_word_pass(parts, rf, f"v{_UNI_PRUNE_ROUNDS}")
    _uni_recount(parts, rf, f"v{_UNI_PRUNE_ROUNDS}")
    if extra_pass == "nbest":
        _uni_nbest_pass(parts, _UNI_VFINAL)
    elif extra_pass:
        _uni_word_pass(parts, rf + 1, _UNI_VFINAL)
    return "WITH " + ",\n    ".join(parts) + "\n" + final_select


def _word_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )


@register(
    "unigram_lm_vocab",
    oracle=_unigram_oracle(
        False, f"SELECT piece, cnt AS em_cnt, cost AS cost_micro FROM {_UNI_VFINAL}"
    ),
    doc="unigram-LM (SentencePiece-family, Kudo ACL'18) tokenizer training "
    "as relational Viterbi-EM with the ACTUAL §3.2 prune-to-target "
    "schedule — the OTHER major trained-subword family beside "
    "bpe_train_merges: seed LARGE (all <=4-char substrings at weighted "
    "count >= 2, capped at the top 70 so the schedule is static), then 2 "
    "rounds of [EM re-estimate -> rank every multi-char piece by the "
    "likelihood LOSS its removal would cause -> keep "
    "max(40, ceil(0.75*n)) pieces (SentencePiece's shrinking_factor) -> "
    "re-smooth], then one final EM round on the 40-multi-piece target "
    "vocabulary. The removal loss re-routes a piece's occurrences through "
    "the best segmentation of its OWN string that excludes the piece — a "
    "second tiny min-plus DP over piece strings (2 squarings, MIN "
    "aggregate). The word-level Viterbi DP is 4 path-doubling rounds "
    "(repeated squaring over the 16-char cap); costs freeze to BIGINT "
    "micro-nats with add-half smoothing (-ln((2c+1)/(2*total+|V|))) so "
    "path sums, argmins, the (cost, path) tiebreak, losses, and the "
    "integer-exact keep count greatest(40, (3n+3)//4) are all exact-"
    "integer decisions on both engines. Single chars are never pruned "
    "(coverage). Corpus touched ONCE (the word-count aggregate); "
    "everything after is vocabulary-sized by Heaps' law. Oracle = the "
    "identical rounds unrolled into MATERIALIZED CTEs (the _bpe_oracle "
    "discipline)",
)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    return unigram_lm.unigram_train(_word_dictionary(spark, sf_dir)).select(
        "piece", F.col("cnt").alias("em_cnt"), F.col("cost").alias("cost_micro")
    )


@register(
    "unigram_segment_words",
    oracle=_unigram_oracle(
        True, f"SELECT word, wcnt, cost AS cost_micro, path FROM {_UNI_BFINAL}"
    ),
    doc="the ENCODE side of the unigram-LM tokenizer: every word type's "
    "best (lowest-cost) segmentation under the pruned-to-target trained "
    "vocabulary — one more min-plus Viterbi pass with the final costs. "
    "Tokenization is per WORD TYPE, so encoding a 100 TB corpus segments "
    "the vocabulary-sized dictionary once and joins back to the token "
    "stream (the bpe_segment posture). Deterministic: ties break on "
    "(cost, path string). Shares the prune-EM training rounds and "
    "unrolled-CTE oracle with unigram_lm_vocab",
)
def unigram_segment_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    return unigram_lm.unigram_segment(_word_dictionary(spark, sf_dir)).select(
        "word", "wcnt", F.col("cost").alias("cost_micro"), "path"
    )


@register(
    "unigram_nbest_segmentations",
    oracle=_unigram_oracle(
        "nbest",
        "SELECT word, wcnt, rank::BIGINT AS rank, cost AS cost_micro, path FROM nb",
    ),
    doc="SUBWORD REGULARIZATION's enumeration base (Kudo ACL'18 §3 — the "
    "paper's titular technique trains on segmentations SAMPLED from each "
    "word's l-best list; Viterbi is l=1): the top-2 distinct "
    "segmentations per word type under the pruned-to-target vocabulary, "
    "via k-best min-plus repeated squaring — the state keeps the 2 best "
    "distinct (cost, path) per (word, span); each squaring unions the "
    "midpoint self-composition, collapses duplicate paths (same path via "
    "several midpoints, identical BIGINT cost), and re-ranks. Exact by "
    "the k-shortest-path induction (halves of a top-k path are top-k for "
    "their spans under the compositional (cost, path) order). rank-1 "
    "rows equal unigram_segment_words exactly (pinned in tests); a "
    "sampler then draws among ranks with the usual alpha-smoothed "
    "probabilities driver-side or via a seeded hash — the expensive "
    "distributed part is THIS list. Shares the prune-EM training rounds "
    "and unrolled-CTE oracle with unigram_lm_vocab",
)
def unigram_nbest_segmentations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    words = _word_dictionary(spark, sf_dir)
    vocab = unigram_lm.unigram_train(words)
    with unigram_lm.sized_loop(words) as w:
        nb = unigram_lm.nbest_paths(w, vocab, k=2)
    return nb.select(
        "word",
        "wcnt",
        F.col("rank").cast("bigint").alias("rank"),
        F.col("cost").alias("cost_micro"),
        "path",
    )


def sampled_segmentation_oracle(salt: int = 0) -> str:
    """The `unigram_sampled_segmentation` DuckDB oracle, parameterized by
    the same ``salt`` knob as the operator: salt 0 hashes the bare word
    (the registry's pinned default); salt n hashes ``'n:' || word`` — the
    per-epoch resample. Tests run both engines at a nonzero salt through
    this same builder, so the salted path is oracle-checked too."""
    draw_key = "word" if salt == 0 else f"'{int(salt)}:' || word"
    return _unigram_oracle(
        "nbest",
        f""", piv AS (
      SELECT word, wcnt,
             min(CASE WHEN rank = 1 THEN cost END) AS c1,
             min(CASE WHEN rank = 1 THEN path END) AS path1,
             min(CASE WHEN rank = 2 THEN cost END) AS c2,
             min(CASE WHEN rank = 2 THEN path END) AS path2
      FROM nb GROUP BY word, wcnt
    ),
    drawn AS (
      SELECT word, wcnt, c1, path1, c2, path2,
             CASE WHEN c2 IS NULL THEN 1000000
                  ELSE CAST(round(1000000 / (1 + exp(-0.5 * (c2 - c1) / 1000000.0))) AS BIGINT)
             END AS p1_micro,
             ((1000000 * (('0x' || substr(md5({draw_key}), 1, 8))::BIGINT & 2147483647))
               // 2147483648)::BIGINT AS draw_micro
      FROM piv
    )
    SELECT word, wcnt, p1_micro, draw_micro,
           (CASE WHEN c2 IS NOT NULL AND draw_micro >= p1_micro THEN 2 ELSE 1 END)::BIGINT
             AS sampled_rank,
           CASE WHEN c2 IS NOT NULL AND draw_micro >= p1_micro THEN c2 ELSE c1 END
             AS cost_micro,
           CASE WHEN c2 IS NOT NULL AND draw_micro >= p1_micro THEN path2 ELSE path1 END
             AS path
    FROM drawn""",
    )


@register(
    "unigram_sampled_segmentation",
    oracle=sampled_segmentation_oracle(salt=0),
    doc="the subword-regularization DRAW itself (Kudo ACL'18 §3: train on "
    "a segmentation SAMPLED with P(x) proportional to p(x)^alpha): one "
    "deterministic sample per word type from its 2-best list — P(rank 1) "
    "is the two-candidate softmax on micro-nat costs (alpha = 0.5), "
    "frozen to micro-units by one fixed-order expression; the uniform "
    "draw is the portable md5-prefix hash of the word scaled by integer "
    "division, so the 'randomness' is a pure function of (salt, word) — "
    "an augmentation epoch passes its epoch number as the operator's "
    "salt knob (default 0 = bare word, this entry's pin) — and both "
    "engines replay the identical choice. The pivot off the n-best list "
    "is one conditional-MIN hash aggregate (at most one row per (word, "
    "rank) — MIN is exact selection), no join; everything downstream of "
    "the n-best enumeration is vocabulary-sized. Completes the "
    "regularization pipeline: unigram_nbest_segmentations enumerates, "
    "this samples",
)
def unigram_sampled_segmentation(
    spark: SparkSession, sf_dir: str, salt: int = 0
) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    nb = unigram_nbest_segmentations(spark, sf_dir).select(
        "word", "wcnt", "rank", F.col("cost_micro").alias("cost"), "path"
    )
    return unigram_lm.sampled_segmentations(nb, salt=salt).select(
        "word",
        "wcnt",
        "p1_micro",
        "draw_micro",
        "sampled_rank",
        F.col("cost").alias("cost_micro"),
        "path",
    )


@register(
    "unigram_fertility",
    oracle=_unigram_oracle(
        True,
        r""", st AS (
      SELECT source, token AS word, count(*)::BIGINT AS c FROM (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> '' AND length(token) <= 16 GROUP BY source, token
    )
    SELECT st.source,
           sum(st.c * len(string_split(b.path, ' ')))::BIGINT AS total_pieces,
           sum(st.c)::BIGINT AS total_words,
           round(sum(st.c * len(string_split(b.path, ' '))) * 1.0 / sum(st.c), 4)
             AS fertility
    FROM st JOIN b4 b ON b.word = st.word
    GROUP BY st.source""",
    ),
    doc="per-source tokenizer fertility (pieces emitted per word) under "
    "the pruned-to-target unigram-LM vocabulary — the BPE-vs-unigram comparison "
    "number a tokenizer bake-off reports per domain (bpe_fertility's twin "
    "on the other tokenizer family). Segmentation runs once on the "
    "vocabulary-sized dictionary; the per-word piece count joins the "
    "per-(source, word) counts as a vocabulary-sized BROADCAST, and the "
    "ratio divides exact integer sums (IEEE-exact). Shares the rounds and "
    "unrolled-CTE oracle with unigram_lm_vocab",
)
def unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    seg = unigram_lm.unigram_segment(_word_dictionary(spark, sf_dir))
    n_pieces = seg.select(
        "word", F.size(F.split("path", " ")).cast("bigint").alias("n_pieces")
    )
    st = (
        docs.select("source", F.explode(text_ops.tokens_col("text")).alias("word"))
        .where(F.length("word") <= 16)
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return (
        st.join(F.broadcast(n_pieces), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("n_pieces")).cast("bigint").alias("total_pieces"),
            F.sum("c").cast("bigint").alias("total_words"),
            F.round(F.sum(F.col("c") * F.col("n_pieces")) * 1.0 / F.sum("c"), 4).alias(
                "fertility"
            ),
        )
    )


@register(
    "unigram_codelength",
    oracle=_unigram_oracle(
        True,
        r""", st AS (
      SELECT source, token AS word, count(*)::BIGINT AS c FROM (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
      ) WHERE token <> '' AND length(token) <= 16 GROUP BY source, token
    )
    SELECT st.source,
           sum(st.c * b.cost)::BIGINT AS total_micronats,
           sum(st.c * length(b.word))::BIGINT AS total_chars,
           (sum(st.c * b.cost) // sum(st.c * length(b.word)))::BIGINT
             AS micronats_per_char
    FROM st JOIN b4 b ON b.word = st.word
    GROUP BY st.source""",
    ),
    doc="per-source corpus CODELENGTH under the pruned-to-target trained unigram LM — the "
    "compression number tokenizer papers actually report (bits/nats per "
    "character): each word type's best-path cost is its exact negative "
    "log-likelihood in frozen micro-nats, so the per-source total is an "
    "exact BIGINT sum of count x path-cost and nats-per-char is one "
    "integer division — NO float summation anywhere (the metric where "
    "fertility ties break: two tokenizers emitting the same piece count "
    "can still differ in how probable their pieces are). Completes the "
    "tokenizer-eval trio: fertility (compute cost), vocabulary "
    "utilization (embedding cost), codelength (modeling fit). Scale: the "
    "per-(source, word) aggregate is the only corpus pass beyond "
    "training; the segmented dictionary joins in as a vocabulary-sized "
    "broadcast",
)
def unigram_codelength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators import unigram_lm

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    seg = unigram_lm.unigram_segment(_word_dictionary(spark, sf_dir))
    st = (
        docs.select("source", F.explode(text_ops.tokens_col("text")).alias("word"))
        .where(F.length("word") <= 16)
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return (
        st.join(F.broadcast(seg.select("word", "cost")), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("cost")).cast("bigint").alias("total_micronats"),
            F.sum(F.col("c") * F.length("word")).cast("bigint").alias("total_chars"),
            F.expr("sum(c * cost) div sum(c * length(word))")
            .cast("bigint")
            .alias("micronats_per_char"),
        )
    )
