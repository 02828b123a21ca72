"""Deduplication conformance queries (north-star extensions, SURVEY.md §2 Part C).

Exact dedup, exact Jaccard, SimHash, the full MinHash-LSH pipeline, AND the
end-to-end clustering composition are oracle-checked: the hash family is
engine-portable (md5-prefix base + 31-bit affine re-hashes,
``operators.dedup.minhash_family``), so the DuckDB oracle recomputes
identical signatures → bands → candidates → verified pairs, and a
recursive-CTE transitive closure reproduces the connected-components
fixpoint for the cluster rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators import dedup as dd
from map_reduce_engine_spark.queries.base import register, t


@register(
    "dedup_exact_clusters",
    oracle="""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
    doc="exact duplicate groups over document text (hash-groupBy dedup)",
)
def dedup_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dd.duplicate_clusters(t(spark, sf_dir, "documents"), ["text"], "doc_id")
    return df.select(F.col("min_id").alias("canonical_id"), F.col("n_dups").alias("n_copies"))


@register(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    doc="exact dedup keeping the deterministic survivor (min doc_id) per text",
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dd.dedup_exact(t(spark, sf_dir, "documents"), subset=["text"], order_by=["doc_id"])
    return df.select("doc_id", "lang", "source")


@register(
    "dedup_fingerprint",
    oracle="""
    SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS canonical_id
    FROM (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    GROUP BY fp
    """,
    doc="dedup on normalized-content fingerprint (formatting-insensitive exact dedup)",
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents WHERE doc_id < 300 AND trim(text) <> ''
    ), sizes AS (
      SELECT id, count(*) AS n FROM toks GROUP BY id
    ), inter AS (
      SELECT a.id AS id1, b.id AS id2, count(*) AS i
      FROM toks a JOIN toks b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id1, id2,
           round(i / (s1.n + s2.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE i / (s1.n + s2.n - i) >= 0.5
    """,
    doc="exact token-set Jaccard similarity join (inverted index, no cross join)",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.5, max_id=300)


_DUCK_L = r"string_split_regex(trim(text), '\s+')"
_DUCK_SHINGLE3 = (
    "CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')] "
    "ELSE list_transform(range(1, len(l) - 1), "
    "i -> array_to_string(l[i:i+2], ' ')) END"
)


def _minhash_ctes(unit_sql: str, cands_cond: str = "a.id < b.id") -> str:
    """Shared CTE body of the DuckDB MinHash-LSH twin (through ``scored``).

    Recomputes the exact signatures (md5-prefix base, 31-bit affine family —
    ``operators.dedup.minhash_family``), the exact band buckets (the same
    affine combination of the band's slots the Spark side shuffles on), the
    exact candidate set, and the exact-Jaccard score. Engines agree because
    every step is integer arithmetic on a portable hash.
    """
    from map_reduce_engine_spark.operators.dedup import minhash_family

    av, bv = minhash_family(64)
    slots = ",\n             ".join(
        f"min(({av[i]} * h + {bv[i]}) & 2147483647) AS h{i}" for i in range(64)
    )
    mix, _ = minhash_family(4)
    bands_sql = "\n      UNION ALL ".join(
        f"SELECT id, {b} AS band, ("
        + " + ".join(f"(({mix[r]} * h{4 * b + r}) & 2147483647)" for r in range(4))
        + ") & 2147483647 AS bucket FROM sig"
        for b in range(16)
    )
    return f"""docs_l AS (
      SELECT doc_id AS id, {_DUCK_L} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    docs_t AS MATERIALIZED (SELECT id, {unit_sql} AS units FROM docs_l),
    toks AS (
      SELECT id, ('0x' || substr(md5(u), 1, 8))::BIGINT & 2147483647 AS h
      FROM docs_t, unnest(units) AS t(u)
    ),
    sig AS MATERIALIZED (
      SELECT id, {slots}
      FROM toks GROUP BY id
    ),
    bands AS MATERIALIZED (
      {bands_sql}
    ),
    cands AS MATERIALIZED (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND {cands_cond}
    ),
    sets AS MATERIALIZED (SELECT id, list_distinct(units) AS s FROM docs_t),
    scored AS MATERIALIZED (
      SELECT c.id1, c.id2,
             round(len(list_intersect(s1.s, s2.s))::DOUBLE
                   / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))),
                   6) AS jaccard
      FROM cands c
      JOIN sets s1 ON s1.id = c.id1
      JOIN sets s2 ON s2.id = c.id2
    )"""


def _minhash_oracle(unit_sql: str) -> str:
    """DuckDB twin of the FULL MinHash-LSH pipeline (signatures → verified pairs)."""
    return f"""
    WITH {_minhash_ctes(unit_sql)}
    SELECT id1, id2, jaccard FROM scored WHERE jaccard >= 0.7
    """


def _neardup_pipeline_oracle() -> str:
    """DuckDB twin of the END-TO-END near-dedup pipeline.

    Extends the MinHash-LSH CTEs with the clustering stage: verified pairs →
    undirected edges → transitive closure (recursive CTE; UNION set semantics
    terminate it) → per-node component = min reachable id — exactly the
    fixpoint ``operators.graph.connected_components`` converges to — then the
    per-component size rollup.
    """
    return f"""
    WITH RECURSIVE {_minhash_ctes("l")},
    verified AS MATERIALIZED (SELECT id1, id2 FROM scored WHERE jaccard >= 0.7),
    und AS MATERIALIZED (
      SELECT id1 AS a, id2 AS b FROM verified
      UNION
      SELECT id2, id1 FROM verified
    ),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    comp AS (
      SELECT a AS node, least(a, min(b)) AS component
      FROM reach GROUP BY a
    )
    SELECT component AS canonical_id, count(*) AS cluster_size
    FROM comp GROUP BY component
    """


@register(
    "minhash_near_dup",
    oracle=_minhash_oracle("l"),
    doc="MinHash-LSH near-dup: band-bucket candidates → exact-Jaccard verify "
    ">= 0.7. FULLY oracle-checked: the portable hash family (md5-prefix "
    "base + 31-bit affine re-hashes) lets DuckDB recompute identical "
    "signatures, buckets, candidates, and verified pairs",
)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    return dd.jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.7, candidates=cands)


@register(
    "dedup_components",
    oracle="""
    SELECT min(doc_id) AS component, count(*) AS size
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
    doc="transitive dedup clustering (operators/graph.py): exact-duplicate "
    "pairs → connected components via iterative min-label propagation "
    "(the Pregel pattern in DataFrame joins). On exact-dup edges the "
    "components provably equal the group-by-text clusters, which is the "
    "oracle; the same operator clusters MinHash/SimHash candidate pairs "
    "at scale",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents")
    # exact-duplicate pairs: min doc per text ↔ every other doc of that text
    canon = docs.groupBy("text").agg(F.min("doc_id").alias("id1"))
    pairs = (
        docs.join(canon, "text")
        .where(F.col("doc_id") != F.col("id1"))
        .select("id1", F.col("doc_id").alias("id2"))
    )
    cc = connected_components(pairs)
    return cc.groupBy("component").agg(F.count("*").alias("size"))


@register(
    "minhash_shingle_near_dup",
    oracle=_minhash_oracle(_DUCK_SHINGLE3),
    doc="MinHash-LSH near-dup over word 3-gram SHINGLES (order-sensitive — "
    "the classic formulation): two docs sharing vocabulary in different "
    "order are near-dups under token sets but not under shingles; "
    "verification is exact shingle-Jaccard >= 0.7 on candidates",
)
def minhash_shingle_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64, shingle_n=3)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    return dd.jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.7, candidates=cands, shingle_n=3
    )


@register(
    "neardup_pipeline",
    oracle=_neardup_pipeline_oracle(),
    doc="the full near-dedup pipeline end-to-end: MinHash-LSH candidates → "
    "exact-Jaccard verify (≥0.7) → connected components → one canonical "
    "survivor per cluster; returns per-cluster (canonical id, size). "
    "This is the composition a 100 TB corpus dedup actually runs — every "
    "stage is an equi-join or bounded iteration, nothing quadratic. FULLY "
    "oracle-checked: the portable MinHash family plus a recursive-CTE "
    "transitive closure lets DuckDB recompute the identical clusters",
)
def neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    # freeze the verified pair set before clustering: the component loop's
    # doubled-edge union references its input TWICE, so an unmaterialized
    # verify pipeline would execute once per union branch (the
    # golden_record_fields lesson)
    verified = (
        dd.jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.7, candidates=cands)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    cc = connected_components(verified)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("cluster_size"))
        .select(F.col("component").alias("canonical_id"), "cluster_size")
    )


def _simhash_oracle() -> str:
    """DuckDB twin of the full SimHash pipeline (sketch → blocking → verify).

    Recomputes the 63-bit sketches lane by lane with the same portable base
    hash and affine family (``operators.dedup.simhash``), the same 16-bit
    segment blocking, and the same ``bit_count(xor)`` Hamming verify.
    """
    from map_reduce_engine_spark.operators.dedup import SIMHASH_BITS, minhash_family

    av, bv = minhash_family(SIMHASH_BITS)
    votes = ",\n             ".join(
        f"sum(CASE WHEN (({av[i]} * h + {bv[i]}) & 2147483647) >= 1073741824 "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    sketch = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH docs_l AS (
      SELECT doc_id AS id, {_DUCK_L} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    toks AS (
      SELECT id, ('0x' || substr(md5(u), 1, 8))::BIGINT & 2147483647 AS h
      FROM docs_l, unnest(l) AS t(u)
    ),
    votes AS (SELECT id, {votes} FROM toks GROUP BY id),
    sk AS (SELECT id, {sketch} AS simhash FROM votes),
    blocked AS (
      SELECT id, simhash, s AS seg, (simhash >> (s * 16)) & 65535 AS key
      FROM sk, unnest([0, 1, 2, 3]) AS t(s)
    ),
    pairs AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2,
             bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM blocked a JOIN blocked b
        ON a.seg = b.seg AND a.key = b.key AND a.id < b.id
    )
    SELECT id1, id2, hamming FROM pairs WHERE hamming <= 3
    """


@register(
    "simhash_near_pairs",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup pairs: 63-bit sketch, pigeonhole blocking, Hamming "
    "<= 3. FULLY oracle-checked: lane votes are affine re-hashes of the "
    "portable md5-prefix base, so DuckDB recomputes identical sketches, "
    "blocks, and Hamming distances",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "repeated_span_coverage",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_L} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    g AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(array_to_string(l[i:i+7], ' ')), 1, 8))::BIGINT AS h
      FROM d, unnest(range(1, len(l) - 6)) AS u(i)
      WHERE len(l) >= 8
    ),
    rep AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h HAVING count(*) >= 2
    ),
    cov AS (
      SELECT DISTINCT g.doc_id, g.i + o.k AS p
      FROM g JOIN rep USING (h) CROSS JOIN unnest(range(0, 8)) AS o(k)
    ),
    c AS (SELECT doc_id, count(*) AS covered_tokens FROM cov GROUP BY doc_id)
    SELECT d.doc_id AS id, len(d.l)::BIGINT AS n_tokens,
           coalesce(c.covered_tokens, 0)::BIGINT AS covered_tokens,
           ((10000 * coalesce(c.covered_tokens, 0)) // len(d.l))::BIGINT AS coverage_bp
    FROM d LEFT JOIN c USING (doc_id)
    """,
    doc="substring-level dedup signal (Lee et al. ACL'22): per document, the "
    "fraction of token positions covered by an 8-token span that also "
    "occurs in another document — the repeated-SPAN (boilerplate/template/"
    "license) measure that whole-document MinHash/SimHash misses. Fixed-k "
    "shingle coverage is the distributable proxy for suffix-array "
    "substring dedup: shuffles key on the md5-prefix gram hash (map-side "
    "distinct first) and the doc id; the k-fold position explode runs only "
    "on repeated-shingle occurrences. Integer output (basis points, "
    "integer division) — nothing for engines to round differently. NOTE "
    "the fixture corpus draws from a ~30-word vocabulary, so coverage "
    "saturates near 100%% here; discrimination shows on natural corpora",
)
def repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.repeated_span_coverage(docs, "doc_id", "text", k=8)


# Shared CTE prefix for the exact-substring (k=50) tier: token arrays ->
# 50-token tile hashes at every position. Tile hash = full (un-masked)
# md5-prefix bigint, the exact DuckDB twin of
# operators/packing.py::winnow_hashes_col.
_DUCK_SUBSTR_G = f"""
    d AS (
      SELECT doc_id, {_DUCK_L} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    g AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(array_to_string(l[i:i+49], ' ')), 1, 8))::BIGINT AS h
      FROM d, unnest(range(1, len(l) - 48)) AS u(i)
      WHERE len(l) >= 50
    )
"""

# Gaps-and-islands merge of k=50 interval starts into maximal spans, over a
# `dup(doc_id, i)` CTE the caller defines. Same merge rule as
# operators/dedup.py::_merge_spans: new island when the gap exceeds k.
_DUCK_SUBSTR_ISL = """
    isl AS (
      SELECT doc_id, i,
             sum(CASE WHEN prev_i IS NULL OR i - prev_i > 50 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev_i
        FROM dup
      )
    )
"""


@register(
    "substring_dedup_spans",
    oracle=f"""
    WITH {_DUCK_SUBSTR_G},
    rep AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h HAVING count(*) >= 2
    ),
    dup AS (SELECT DISTINCT g.doc_id, g.i FROM g JOIN rep USING (h)),
    {_DUCK_SUBSTR_ISL}
    SELECT doc_id AS id,
           min(i)::BIGINT AS span_start,
           (max(i) + 49)::BIGINT AS span_end,
           (max(i) + 49 - min(i) + 1)::BIGINT AS span_tokens
    FROM isl GROUP BY doc_id, island
    """,
    doc="EXACT-substring dedup tier (Lee et al. ACL'22 ExactSubstr, k=50): "
    "maximal duplicated token spans per document — every position covered "
    "by a verbatim 50-token run shared with another document, merged into "
    "maximal intervals. The tier MinHash/SimHash misses: a 50-token "
    "license block inside two otherwise-distinct documents. Distributed "
    "shape: one posexplode to (doc, pos, tile-hash), repeated tiles via "
    "one hash aggregate (map-side distinct first), equi-join back, per-DOC "
    "interval merge (windows keyed by doc id). A shared run of length "
    ">= 50 is recovered exactly; < 50 is invisible by design",
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.substring_dedup_spans(docs, "doc_id", "text", k=50)


@register(
    "substring_dedup_survivors",
    oracle=f"""
    WITH {_DUCK_SUBSTR_G},
    canon AS (
      SELECT h, min(doc_id) AS canon_id
      FROM (SELECT DISTINCT doc_id, h FROM g)
      GROUP BY h HAVING count(*) >= 2
    ),
    dup AS (
      SELECT DISTINCT g.doc_id, g.i
      FROM g JOIN canon USING (h) WHERE g.doc_id <> canon.canon_id
    ),
    {_DUCK_SUBSTR_ISL},
    spans AS (
      SELECT doc_id, max(i) + 49 - min(i) + 1 AS span_tokens
      FROM isl GROUP BY doc_id, island
    ),
    r AS (SELECT doc_id, sum(span_tokens) AS removed_tokens FROM spans GROUP BY doc_id)
    SELECT d.doc_id AS id,
           len(d.l)::BIGINT AS n_tokens,
           coalesce(r.removed_tokens, 0)::BIGINT AS removed_tokens,
           (len(d.l) - coalesce(r.removed_tokens, 0))::BIGINT AS kept_tokens,
           ((10000 * coalesce(r.removed_tokens, 0)) // len(d.l))::BIGINT AS removed_bp
    FROM d LEFT JOIN r USING (doc_id)
    """,
    doc="exact-substring dedup survivorship ledger: per document, tokens "
    "removed under the keep-best rule (the smallest doc_id holding a "
    "duplicated 50-token tile keeps its copy; every other occurrence is "
    "removable), merged to maximal spans and rolled up to integer counts "
    "+ basis points. sum(kept_tokens) is the post-dedup corpus size the "
    "training pipeline actually feeds the tokenizer. Mirrors dedup_exact's "
    "deterministic first-under-order survivorship at span granularity",
)
def substring_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.substring_dedup_survivors(docs, "doc_id", "text", k=50)


@register(
    "incremental_substring_dedup",
    oracle=f"""
    WITH {_DUCK_SUBSTR_G},
    idx AS (SELECT DISTINCT h FROM g WHERE doc_id < 250),
    dup AS (
      SELECT DISTINCT g.doc_id, g.i
      FROM g JOIN idx USING (h) WHERE g.doc_id >= 250
    ),
    {_DUCK_SUBSTR_ISL},
    spans AS (
      SELECT doc_id, max(i) + 49 - min(i) + 1 AS span_tokens
      FROM isl GROUP BY doc_id, island
    ),
    r AS (SELECT doc_id, sum(span_tokens) AS removed_tokens FROM spans GROUP BY doc_id)
    SELECT d.doc_id AS id,
           len(d.l)::BIGINT AS n_tokens,
           coalesce(r.removed_tokens, 0)::BIGINT AS removed_tokens,
           (len(d.l) - coalesce(r.removed_tokens, 0))::BIGINT AS kept_tokens,
           ((10000 * coalesce(r.removed_tokens, 0)) // len(d.l))::BIGINT AS removed_bp
    FROM d LEFT JOIN r USING (doc_id)
    WHERE d.doc_id >= 250
    """,
    doc="INCREMENTAL exact-substring dedup — a new batch (doc_id >= 250) "
    "probed against the historical corpus's canonical-tile index "
    "(doc_id < 250) without re-deduplicating the history: the corpus "
    "reduces to its DISTINCT 50-token tile-hash set (at 100 TB the "
    "PERSISTED index, one aggregate when built, never rescanned per "
    "batch), batch tile occurrences equi-join it, matched positions "
    "merge to maximal spans per batch document, and the ledger reports "
    "tokens removed/kept per batch doc. The corpus always holds the "
    "canonical copy, so every indexed-tile occurrence in the batch is "
    "removable — the exact-substring twin of incremental_near_dup's "
    "band-bucket probe (VERDICT r07 ask #2). Candidate volume scales "
    "with the BATCH; batch-internal duplication is the symmetric tier "
    "run on the batch alone",
)
def incremental_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    corpus = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    return dd.incremental_substring_dedup(corpus, batch, "doc_id", "text", k=50)


@register(
    "incremental_substring_rewrite",
    oracle=f"""
    WITH {_DUCK_SUBSTR_G},
    idx AS (SELECT DISTINCT h FROM g WHERE doc_id < 250),
    rem AS (
      SELECT DISTINCT g.doc_id, g.i + o.k AS p
      FROM g JOIN idx USING (h) CROSS JOIN unnest(range(0, 50)) AS o(k)
      WHERE g.doc_id >= 250
    ),
    toks AS (
      SELECT doc_id, i AS p, l[i] AS tok
      FROM d, unnest(range(1, len(l) + 1)) AS u(i)
      WHERE doc_id >= 250
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.p = r.p
      WHERE r.p IS NULL
    ),
    reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
             count(*) AS kept FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id AS id,
           coalesce(reb.text, '') AS text,
           len(d.l)::BIGINT AS n_tokens,
           (len(d.l) - coalesce(reb.kept, 0))::BIGINT AS removed_tokens
    FROM d LEFT JOIN reb USING (doc_id)
    WHERE d.doc_id >= 250
    """,
    doc="the REWRITE side of incremental exact-substring dedup: the new "
    "batch (doc_id >= 250) with every occurrence of a corpus-indexed "
    "50-token run excised from its text — the output a crawl pipeline "
    "actually appends to the training corpus (incremental_substring_dedup "
    "is the accounting ledger; this is the data). Same batch-scaled probe "
    "of the persisted canonical-tile index, then the shared per-SPAN "
    "excision: matched tile starts merge to maximal per-doc spans, and an "
    "in-row filter-by-index drops covered tokens — the batch token stream "
    "is never exploded or shuffled. The rebuilt strings are part of the "
    "oracle comparison, so the excision boundaries are verified "
    "byte-for-byte; fully-indexed batch documents empty rather than vanish",
)
def incremental_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    corpus = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    return dd.incremental_substring_rewrite(corpus, batch, "doc_id", "text", k=50)


@register(
    "incremental_batch_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250),
    batch AS (
      SELECT doc_id, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM fp WHERE doc_id >= 250
    )
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN h.fingerprint IS NOT NULL THEN 'dup_of_history'
                WHEN b.rn > 1 THEN 'dup_in_batch'
                ELSE 'novel' END AS status
    FROM batch b LEFT JOIN hist h ON b.fingerprint = h.fingerprint
    """,
    doc="incremental dedup of a new batch against an existing corpus index "
    "— the daily-crawl shape: the historical side is its DISTINCT "
    "fingerprint set (map-side dedup before the shuffle, and at 100 TB "
    "it is the stored fingerprint index, not a rescan), the new batch "
    "left-joins it on the fingerprint and a batch-internal window keeps "
    "the min-id survivor among the remaining novels. One shuffle on "
    "fingerprint for the join + one for the window; history is never "
    "rewritten. Statuses: dup_of_history / dup_in_batch / novel",
)
def incremental_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    hist = fp.where(F.col("doc_id") < 250).select("fingerprint").distinct()
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    batch = fp.where(F.col("doc_id") >= 250).withColumn("rn", F.row_number().over(w))
    return (
        batch.join(
            hist.withColumn("in_hist", F.lit(True)), "fingerprint", "left"
        )
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("in_hist"), F.lit("dup_of_history"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("novel"))
            .alias("status"),
        )
    )


@register(
    "incremental_near_dup",
    oracle=f"""
    WITH {_minhash_ctes("l", cands_cond="a.id >= 250 AND b.id < 250")},
    m AS (
      SELECT id1, id2, jaccard,
             count(*) OVER (PARTITION BY id1) AS nm,
             row_number() OVER (PARTITION BY id1 ORDER BY jaccard DESC, id2) AS rn
      FROM scored WHERE jaccard >= 0.7
    )
    SELECT id1 AS doc_id, nm::BIGINT AS n_hist_matches,
           id2 AS best_match_id, jaccard AS best_jaccard
    FROM m WHERE rn = 1
    """,
    doc="incremental NEAR-dup of a new batch against a historical MinHash "
    "index — the fuzzy twin of incremental_batch_dedup: the historical "
    "side is the stored band-bucket index (recomputed here from doc_id < "
    "250 so the registry entry stays self-contained; build_band_index/"
    "write_band_index persist it bucketed on (band, bucket) and the "
    "incremental-ingest job probes THAT table via hist_index_df), the "
    "new batch's band entries equi-join it, and exact "
    "Jaccard verifies only cross-batch candidates — candidate volume "
    "scales with the BATCH, the history is never self-joined or "
    "rescanned. Output: each new doc with >= 0.7 matches, its match "
    "count and best (highest-Jaccard, min-id tiebreak) historical "
    "document. Same portable hash family as minhash_near_dup, so the "
    "oracle recomputes the identical pipeline",
)
def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    # localCheckpoint, not persist: reused by both the new and historical
    # band sides within this query only; persist() would leak a session-long
    # cache entry per invocation (same policy as operators/graph.py)
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64).localCheckpoint(
        eager=True
    )
    cands = dd.minhash_cross_candidates(
        sigs.where(F.col("id") >= 250), sigs.where(F.col("id") < 250)
    )
    scored = dd.jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.7, candidates=cands
    )
    w = Window.partitionBy("id1")
    return (
        scored.withColumn("nm", F.count("*").over(w))
        .withColumn(
            "rn",
            F.row_number().over(w.orderBy(F.desc("jaccard"), "id2")),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("id1").alias("doc_id"),
            F.col("nm").cast("bigint").alias("n_hist_matches"),
            F.col("id2").alias("best_match_id"),
            F.col("jaccard").alias("best_jaccard"),
        )
    )


@register(
    "tokenset_dedup_best",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, text,
             array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ') AS tokenset,
             round(
               (CASE WHEN len(string_split_regex(trim(text), '\s+')) BETWEEN 5 AND 100000 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
             + (CASE WHEN length(regexp_replace(text, '\s', '', 'g'))
                          / len(string_split_regex(trim(text), '\s+')) BETWEEN 2 AND 12 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
             + (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) >= 0.6 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
             + (CASE WHEN length(regexp_replace(text, '[^\.,;:!\?]', '', 'g')) / length(text) <= 0.2 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
             , 2) AS quality
      FROM documents WHERE trim(text) <> ''
    ),
    ranked AS (
      SELECT doc_id, quality, tokenset,
             count(*) OVER (PARTITION BY tokenset) AS n_members,
             row_number() OVER (PARTITION BY tokenset ORDER BY quality DESC, doc_id) AS rn
      FROM q
    )
    SELECT doc_id AS survivor_id, quality AS survivor_quality,
           n_members::BIGINT AS n_members
    FROM ranked WHERE rn = 1 AND n_members > 1
    """,
    doc="bag-of-words dedup with a KEEP-BEST-COPY survivor policy: documents "
    "sharing the same distinct-token SET (the cheap order-insensitive "
    "near-dup key between exact fingerprints and MinHash) cluster "
    "together, and each multi-member cluster keeps its highest-QUALITY "
    "member (heuristic score, min-id tiebreak) instead of the min-id "
    "convention — the policy production dedup actually wants: when copies "
    "differ by truncation/boilerplate, keep the best one. One shuffle on "
    "the tokenset key; quality is the same pure-expression score as "
    "quality_score, so the oracle replays everything",
)
def tokenset_dedup_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from map_reduce_engine_spark.operators.text import quality_score, tokens_col

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    q = quality_score(docs, "doc_id", "text").select("doc_id", "quality")
    keyed = docs.join(q, "doc_id").select(
        "doc_id",
        "quality",
        F.array_join(F.array_sort(F.array_distinct(tokens_col("text"))), " ").alias("tokenset"),
    )
    w = Window.partitionBy("tokenset")
    ranked = keyed.withColumn("n_members", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(w.orderBy(F.desc("quality"), "doc_id"))
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("n_members") > 1))
        .select(
            F.col("doc_id").alias("survivor_id"),
            F.col("quality").alias("survivor_quality"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


@register(
    "shingle_containment_pairs",
    oracle=f"""
    WITH l AS (
      SELECT doc_id AS id, {_DUCK_L} AS l
      FROM documents WHERE doc_id < 300 AND trim(text) <> ''
    ),
    sh AS (
      SELECT DISTINCT id, unnest({_DUCK_SHINGLE3}) AS shingle FROM l
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id1, b.id AS id2, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id1, id2, i AS n_shared,
           round(i / least(s1.n, s2.n), 6) AS containment
    FROM inter
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE i / least(s1.n, s2.n) >= 0.6
    """,
    doc="asymmetric containment join on 3-gram shingle sets: "
    "|A∩B| / min(|A|,|B|) — catches quote/subset relationships that "
    "symmetric Jaccard dilutes (a paragraph fully contained in a long doc "
    "scores ~1 here but near 0 on Jaccard), the containment tier of a "
    "dedup stack (Broder's containment sketch setting). Same "
    "inverted-index shape as ngram_jaccard_pairs: explode distinct "
    "shingles, equi-self-join, never a cross join; production runs feed "
    "LSH candidates instead of the id bound",
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 300) & (F.trim("text") != "")
    )
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(dd.shingles_col("text", 3)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count("*").alias("i"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n").alias("n2"))
    cont = F.col("i") / F.least("n1", "n2")
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .where(cont >= 0.6)
        .select("id1", "id2", F.col("i").alias("n_shared"), F.round(cont, 6).alias("containment"))
    )


@register(
    "dup_cluster_size_distribution",
    oracle="""
    WITH c AS (
      SELECT text, count(*) AS cluster_size FROM documents GROUP BY text
    )
    SELECT cluster_size, count(*) AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs,
           ((cluster_size - 1) * count(*))::BIGINT AS removable_docs
    FROM c GROUP BY cluster_size
    """,
    doc="duplicate-cluster size distribution: how many exact-dup clusters "
    "of each size exist and how many documents dedup would remove — the "
    "corpus-health histogram that decides whether dedup is worth a pass "
    "(heavy tail = template spam). Two cheap hash aggregates; the second "
    "runs over cluster-count-sized data",
)
def dup_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("text").agg(F.count("*").alias("cluster_size"))
    return c.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).cast("bigint").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count("*")).cast("bigint").alias("removable_docs"),
    )


@register(
    "prefix_filter_simjoin",
    oracle=r"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (SELECT tok, count(*)::BIGINT AS df FROM toks GROUP BY tok),
    sized AS (
      SELECT doc_id, count(*)::BIGINT AS sz FROM toks GROUP BY doc_id
    ),
    ordered AS (
      SELECT t.doc_id, t.tok, s.sz,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY f.df, t.tok) AS rn
      FROM toks t JOIN freq f ON f.tok = t.tok JOIN sized s ON s.doc_id = t.doc_id
    ),
    prefix AS (
      SELECT doc_id, tok FROM ordered
      WHERE rn <= sz - (7 * sz + 9) // 10 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id1, c.id2, count(*)::BIGINT AS n_inter
      FROM cand c
      JOIN toks x ON x.doc_id = c.id1
      JOIN toks y ON y.doc_id = c.id2 AND y.tok = x.tok
      GROUP BY c.id1, c.id2
    )
    SELECT i.id1, i.id2, i.n_inter,
           (s1.sz + s2.sz - i.n_inter) AS n_union,
           10000 * i.n_inter // (s1.sz + s2.sz - i.n_inter) AS jaccard_bp
    FROM inter i
    JOIN sized s1 ON s1.doc_id = i.id1
    JOIN sized s2 ON s2.doc_id = i.id2
    WHERE 10 * i.n_inter >= 7 * (s1.sz + s2.sz - i.n_inter)
    """,
    doc="prefix-filtering set-similarity self-join (SSJoin/PPJoin family, "
    "Chaudhuri et al. 2006): token sets ordered rarest-token-first by "
    "global document frequency; two sets with Jaccard >= 0.7 MUST share a "
    "token within each other's first (|X| - ceil(0.7|X|) + 1) tokens, so "
    "the candidate join runs over PREFIX entries only — exact recall "
    "(unlike MinHash's probabilistic recall) with near-LSH candidate "
    "volume, because prefixes are rare tokens with tiny posting lists. "
    "The threshold test is pure integers (10*inter >= 7*union; ceil via "
    "(7s+9) div 10), so both engines agree exactly. Shuffles: token "
    "explode/distinct, frequency join (rarest-first order is the "
    "optimization: high-df tokens never enter prefixes, killing the hub "
    "posting lists), prefix equi-join, candidate-only verification.",
)
def prefix_filter_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    sized = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ordered = (
        toks.join(freq, "tok")
        .join(sized, "doc_id")
        .withColumn("rn", F.row_number().over(w))
    )
    prefix = ordered.where(
        F.col("rn") <= F.col("sz") - F.expr("(7 * sz + 9) div 10") + 1
    ).select("doc_id", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    x = toks.select(F.col("doc_id").alias("id1"), "tok")
    y = toks.select(F.col("doc_id").alias("id2"), "tok")
    inter = (
        cand.join(x, "id1")
        .join(y, ["id2", "tok"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sized.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sized.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))
    un = F.col("sz1") + F.col("sz2") - F.col("n_inter")
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .where(F.lit(10) * F.col("n_inter") >= F.lit(7) * un)
        .select(
            "id1",
            "id2",
            "n_inter",
            un.alias("n_union"),
            F.expr("10000 * n_inter div (sz1 + sz2 - n_inter)").alias("jaccard_bp"),
        )
    )


@register(
    "sorted_neighborhood_pairs",
    oracle=r"""
    WITH keyed AS (
      SELECT doc_id, lang,
             list_aggregate(list_sort(list_distinct(
               string_split_regex(trim(text), '\s+'))), 'string_agg', ' ')
               AS snkey,
             len(list_distinct(string_split_regex(trim(text), '\s+')))::BIGINT
               AS sz
      FROM documents WHERE trim(text) <> ''
    ),
    ordered AS (
      SELECT doc_id, lang, snkey, sz,
             row_number() OVER (PARTITION BY lang ORDER BY snkey, doc_id)
               AS rn
      FROM keyed
    ),
    cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2
      FROM ordered a JOIN ordered b
        ON a.lang = b.lang AND b.rn - a.rn BETWEEN 1 AND 3
    ),
    toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+'))
               AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    inter AS (
      SELECT c.id1, c.id2, c.sz1, c.sz2, count(*)::BIGINT AS n_inter
      FROM cand c
      JOIN toks x ON x.doc_id = c.id1
      JOIN toks y ON y.doc_id = c.id2 AND y.tok = x.tok
      GROUP BY c.id1, c.id2, c.sz1, c.sz2
    )
    SELECT least(id1, id2) AS id1, greatest(id1, id2) AS id2, n_inter,
           (sz1 + sz2 - n_inter) AS n_union,
           10000 * n_inter // (sz1 + sz2 - n_inter) AS jaccard_bp
    FROM inter
    WHERE 2 * n_inter >= (sz1 + sz2 - n_inter)
    """,
    doc="blocked sorted-neighborhood dedup blocking (Hernandez & Stolfo "
    "1995, the multi-pass variant): within each language block, documents "
    "sort by their canonical token-set string and only windows of 3 "
    "neighbors in that order become candidates — O(n·w) candidate volume "
    "with zero hashing, the third blocking tier next to LSH "
    "(probabilistic) and prefix filtering (exact). Candidates verify "
    "with exact integer Jaccard >= 0.5 (2*inter >= union). The rank join "
    "is an equi-join on lang with a +-3 band — band-bounded fan-out; at "
    "scale the sort key doubles as the range-partitioning key.",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from map_reduce_engine_spark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.array_join(F.array_sort(F.array_distinct(tokens_col("text"))), " ").alias(
            "snkey"
        ),
        F.size(F.array_distinct(tokens_col("text"))).cast("bigint").alias("sz"),
    )
    w = Window.partitionBy("lang").orderBy("snkey", "doc_id")
    ordered = keyed.withColumn("rn", F.row_number().over(w))
    # each row probes exactly its 3 successor RANKS via explode, so the
    # neighbor join is a pure (lang, rank) equi-join with fan-out 3 per row
    # — never "equi-join on lang then filter", whose pre-filter fan-out is
    # the language block squared
    a = ordered.select(
        "lang",
        F.col("doc_id").alias("id1"),
        F.col("sz").alias("sz1"),
        F.explode(
            F.array(*[F.col("rn") + F.lit(i) for i in (1, 2, 3)])
        ).alias("rn"),
    )
    b = ordered.select(
        "lang", F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"), "rn"
    )
    cand = a.join(b, ["lang", "rn"])
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("tok")
    )
    x = toks.select(F.col("doc_id").alias("id1"), "tok")
    y = toks.select(F.col("doc_id").alias("id2"), "tok")
    inter = (
        cand.join(x, "id1")
        .join(y, ["id2", "tok"])
        .groupBy("id1", "id2", "sz1", "sz2")
        .agg(F.count("*").alias("n_inter"))
    )
    un = F.col("sz1") + F.col("sz2") - F.col("n_inter")
    return (
        inter.where(F.lit(2) * F.col("n_inter") >= un)
        .select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
            "n_inter",
            un.alias("n_union"),
            F.expr("10000 * n_inter div (sz1 + sz2 - n_inter)").alias("jaccard_bp"),
        )
    )


def _blocking_recall_oracle() -> str:
    """DuckDB twin of the blocking-quality report: the MinHash-LSH CTE chain
    (through ``cands``) next to the EXACT inverted-index truth at
    Jaccard >= 0.7 (all-integer threshold), then the recall / reduction
    metrics over both."""
    return f"""
    WITH {_minhash_ctes("l")},
    rawtoks AS (
      SELECT id, unnest(list_distinct(units)) AS u FROM docs_t
    ),
    sz AS (SELECT id, len(list_distinct(units))::BIGINT AS sz FROM docs_t),
    tp AS (
      SELECT a.id AS id1, b.id AS id2, count(*)::BIGINT AS n_inter
      FROM rawtoks a JOIN rawtoks b ON a.u = b.u AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    truth AS (
      SELECT tp.id1, tp.id2
      FROM tp JOIN sz s1 ON s1.id = tp.id1 JOIN sz s2 ON s2.id = tp.id2
      WHERE 10 * tp.n_inter >= 7 * (s1.sz + s2.sz - tp.n_inter)
    ),
    nd AS (SELECT count(*)::BIGINT AS n_docs FROM docs_t),
    m AS (
      SELECT (SELECT count(*)::BIGINT FROM truth) AS n_truth,
             (SELECT count(*)::BIGINT FROM cands) AS n_cand,
             (SELECT count(*)::BIGINT FROM truth t
              WHERE EXISTS (SELECT 1 FROM cands c
                            WHERE c.id1 = t.id1 AND c.id2 = t.id2)) AS n_hit,
             (SELECT n_docs * (n_docs - 1) // 2 FROM nd) AS n_possible
    )
    SELECT (SELECT n_docs FROM nd) AS n_docs, n_possible, n_truth, n_cand,
           n_hit,
           10000 * n_hit // n_truth AS recall_bp,
           10000 - 10000 * n_cand // n_possible AS reduction_ratio_bp,
           (10000 * n_hit // n_truth) >= 9500 AS recall_within_bound
    FROM m
    """


@register(
    "blocking_recall_report",
    oracle=_blocking_recall_oracle(),
    doc="blocking-quality evaluation of the MinHash-LSH candidate "
    "generator against EXACT ground truth: pairs completeness (recall of "
    "true Jaccard>=0.7 pairs among LSH candidates) and reduction ratio "
    "(fraction of the n-choose-2 pair space the blocking never touches) "
    "— the two standard record-linkage blocking metrics (Christen 2012). "
    "Truth comes from the exact inverted-index join with the all-integer "
    "threshold (the prefix_filter_simjoin arithmetic), so the report is "
    "deterministic and the S-curve's theoretical ~99% recall at (16, 4) "
    "bands is VERIFIED, not assumed (verdict bound 95%). Runs the "
    "evaluation harness shape: both pipelines + three 1-row aggregates.",
)
def blocking_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)

    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("u")
    )
    sz = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.select(F.col("doc_id").alias("id1"), "u")
    b = toks.select(F.col("doc_id").alias("id2"), "u")
    tp = (
        a.join(b, "u")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sz.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sz.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))
    truth = (
        tp.join(s1, "id1")
        .join(s2, "id2")
        .where(
            F.lit(10) * F.col("n_inter")
            >= F.lit(7) * (F.col("sz1") + F.col("sz2") - F.col("n_inter"))
        )
        .select("id1", "id2")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_cand = cands.agg(F.count("*").alias("n_cand"))
    n_hit = truth.join(cands, ["id1", "id2"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.expr("CAST(n_docs AS BIGINT) * (n_docs - 1) div 2").alias("n_possible"),
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_cand").cast("bigint").alias("n_cand"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.expr("10000 * CAST(n_hit AS BIGINT) div CAST(n_truth AS BIGINT)").alias(
                "recall_bp"
            ),
            F.expr(
                "10000 - 10000 * CAST(n_cand AS BIGINT)"
                " div (CAST(n_docs AS BIGINT) * (n_docs - 1) div 2)"
            ).alias("reduction_ratio_bp"),
            (
                F.expr("10000 * CAST(n_hit AS BIGINT) div CAST(n_truth AS BIGINT)")
                >= 9500
            ).alias("recall_within_bound"),
        )
    )


@register(
    "cross_source_dup_matrix",
    oracle=f"""
    WITH {_minhash_ctes("l")},
    verified AS (SELECT id1, id2 FROM scored WHERE jaccard >= 0.7),
    srcs AS (
      SELECT least(d1.source, d2.source)    AS source_a,
             greatest(d1.source, d2.source) AS source_b,
             CASE WHEN d1.source = d2.source THEN 1 ELSE 0 END AS intra
      FROM verified v
      JOIN documents d1 ON d1.doc_id = v.id1
      JOIN documents d2 ON d2.doc_id = v.id2
    )
    SELECT source_a, source_b,
           count(*)::BIGINT   AS n_pairs,
           sum(intra)::BIGINT AS n_intra_source
    FROM srcs GROUP BY source_a, source_b
    """,
    doc="cross-source duplicate-flow matrix: MinHash-verified near-dup pairs "
    "rolled up by the (source, source) of their two documents — the "
    "curation dashboard that shows WHICH feeds are re-crawling each other "
    "(off-diagonal mass) vs duplicating internally (diagonal). Reuses the "
    "fully-portable MinHash-LSH pipeline (band-bucket equi-join, exact "
    "Jaccard verify) and adds two equi-joins back to the source column "
    "plus a |sources|^2-bounded rollup, so the extra cost over "
    "minhash_near_dup is two hash joins on doc_id. The decision signal "
    "for per-source dedup budgets in a multi-feed 100 TB ingest.",
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    pairs = dd.jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.7, candidates=cands)
    s1 = docs.select(F.col("doc_id").alias("id1"), F.col("source").alias("s1"))
    s2 = docs.select(F.col("doc_id").alias("id2"), F.col("source").alias("s2"))
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .select(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
            F.when(F.col("s1") == F.col("s2"), 1).otherwise(0).alias("intra"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("intra").cast("bigint").alias("n_intra_source"),
        )
    )


@register(
    "rare_token_blocking_pairs",
    oracle=r"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    df_t AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    w AS (
      SELECT tok,
             CAST(round(1000000.0 * ln(CAST(n.n AS DOUBLE) / df)) AS BIGINT) AS w_micro
      FROM df_t, n_docs n
    ),
    rare AS (SELECT tok FROM df_t WHERE df BETWEEN 2 AND 5),
    cands AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM toks a
      JOIN rare r ON r.tok = a.tok
      JOIN toks b ON b.tok = a.tok AND a.doc_id < b.doc_id
    ),
    sides AS (
      SELECT c.id1, c.id2, t.tok, 1 AS s1, 0 AS s2
      FROM cands c JOIN toks t ON t.doc_id = c.id1
      UNION ALL
      SELECT c.id1, c.id2, t.tok, 0, 1
      FROM cands c JOIN toks t ON t.doc_id = c.id2
    ),
    per_tok AS (
      SELECT id1, id2, tok, max(s1) AS in1, max(s2) AS in2
      FROM sides GROUP BY id1, id2, tok
    ),
    wj AS (
      SELECT p.id1, p.id2,
             sum(CASE WHEN in1 = 1 AND in2 = 1 THEN w.w_micro ELSE 0 END) AS inter_w,
             sum(w.w_micro) AS union_w
      FROM per_tok p JOIN w ON w.tok = p.tok
      GROUP BY p.id1, p.id2
    )
    SELECT id1, id2,
           (inter_w * 1000000 // union_w)::BIGINT AS wjaccard_ppm
    FROM wj
    WHERE inter_w * 1000000 // union_w >= 300000
    """,
    doc="rare-token blocking with IDF-weighted Jaccard verification: "
    "candidate pairs must share a DISCRIMINATIVE token (document frequency "
    "2..5 — each such token contributes at most C(5,2) pairs, so blocking "
    "fan-out is bounded per token, never block-squared), then the verify "
    "step scores the full token sets with IDF weights (rare shared "
    "vocabulary counts for more than stopwords — the Fellegi-Sunter "
    "intuition for entity resolution). Complements the exact-recall "
    "prefix filter (prefix_filter_simjoin) and MinHash (probabilistic): "
    "this tier trades recall on stopword-only overlap for a guaranteed- "
    "cheap candidate join. IDF weights freeze to integer micro-units at "
    "the ln() call (temperature_mixture_weights template) so every "
    "downstream sum and the final ppm ratio are exact integers.",
)
def rare_token_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    from map_reduce_engine_spark.operators.text import tokens_col

    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok")).distinct()
    df_t = toks.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = toks.agg(F.countDistinct("doc_id").alias("n"))
    w = df_t.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.expr("CAST(round(1000000.0 * ln(CAST(n AS DOUBLE) / df)) AS BIGINT)").alias(
            "w_micro"
        ),
    )
    rare = df_t.where(F.col("df").between(2, 5)).select("tok")
    a = toks.alias("a")
    b = toks.alias("b")
    cands = (
        a.join(rare, "tok")
        .join(b, "tok")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    sides = (
        cands.join(toks.withColumnRenamed("doc_id", "id1"), "id1")
        .select("id1", "id2", "tok", F.lit(1).alias("s1"), F.lit(0).alias("s2"))
        .unionByName(
            cands.join(toks.withColumnRenamed("doc_id", "id2"), "id2").select(
                "id1", "id2", "tok", F.lit(0).alias("s1"), F.lit(1).alias("s2")
            )
        )
    )
    per_tok = sides.groupBy("id1", "id2", "tok").agg(
        F.max("s1").alias("in1"), F.max("s2").alias("in2")
    )
    wj = (
        per_tok.join(w, "tok")
        .groupBy("id1", "id2")
        .agg(
            F.sum(
                F.when((F.col("in1") == 1) & (F.col("in2") == 1), F.col("w_micro")).otherwise(0)
            ).alias("inter_w"),
            F.sum("w_micro").alias("union_w"),
        )
    )
    return (
        wj.select(
            "id1",
            "id2",
            F.expr("inter_w * 1000000 div union_w").cast("bigint").alias("wjaccard_ppm"),
        )
        .where(F.col("wjaccard_ppm") >= 300000)
    )


def _label_prop_rounds(rounds: int = 8) -> str:
    """Fixed-round min-label propagation as MATERIALIZED CTEs.

    One-hop step per round — EXACTLY the update ``connected_components``
    performs (new(n) = min(prev(n), min over neighbors prev(nb))), so with
    the Spark side pinned to the same ``max_iter`` the two engines agree
    round-for-round whether or not the fixpoint was reached. Linear in
    edges per round, unlike the recursive-CTE transitive closure, which is
    quadratic in cluster size (the neardup_pipeline oracle pays that; this
    one must not — golden-record runs over the SAME dense pair set)."""
    parts = [
        """l0 AS MATERIALIZED (
      SELECT DISTINCT a AS node, a AS label FROM und
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""l{r} AS MATERIALIZED (
      SELECT p.node, least(p.label, coalesce(m.minnb, p.label)) AS label
      FROM l{r - 1} p LEFT JOIN (
        SELECT e.a AS node, min(pb.label) AS minnb
        FROM und e JOIN l{r - 1} pb ON pb.node = e.b
        GROUP BY e.a
      ) m ON m.node = p.node
    )"""
        )
    return ",\n    ".join(parts)


@register(
    "golden_record_fields",
    oracle=f"""
    WITH {_minhash_ctes("l")},
    verified AS (SELECT id1, id2 FROM scored WHERE jaccard >= 0.7),
    und AS MATERIALIZED (
      SELECT id1 AS a, id2 AS b FROM verified
      UNION
      SELECT id2, id1 FROM verified
    ),
    {_label_prop_rounds(8)},
    comp AS (
      SELECT node, label AS component FROM l8
    ),
    mem AS (
      SELECT c.component, c.node, d.lang, d.source
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ),
    pick_src AS (
      SELECT component, val AS golden_source FROM (
        SELECT component, source AS val,
               row_number() OVER (PARTITION BY component
                                  ORDER BY count(*) DESC, source) AS rn
        FROM mem GROUP BY component, source
      ) WHERE rn = 1
    ),
    pick_lang AS (
      SELECT component, val AS golden_lang FROM (
        SELECT component, lang AS val,
               row_number() OVER (PARTITION BY component
                                  ORDER BY count(*) DESC, lang) AS rn
        FROM mem GROUP BY component, lang
      ) WHERE rn = 1
    )
    SELECT m.component AS canonical_id,
           count(*)::BIGINT AS n_members,
           ps.golden_source, pl.golden_lang
    FROM mem m
    JOIN pick_src ps ON ps.component = m.component
    JOIN pick_lang pl ON pl.component = m.component
    GROUP BY m.component, ps.golden_source, pl.golden_lang
    """,
    doc="golden-record construction (MDM field survivorship): cluster "
    "near-duplicate documents (MinHash-verified pairs -> connected "
    "components), then elect each cluster's surviving field values by "
    "majority vote with a deterministic lexicographic tiebreak — the "
    "master-data step AFTER dedup detection that none of the row-level "
    "survivor policies (dedup_exact_survivors) cover: the golden record "
    "can mix fields from different members. Per-field voting is one "
    "(cluster, value) hash aggregate + a cluster-partitioned top-1 "
    "window over the vote counts — bounded by distinct values per "
    "cluster, never raw rows. The oracle reproduces the component "
    "labels with a fixed 8-round min-label propagation (linear in edges "
    "per round; the Spark side pins max_iter=8 so the engines agree "
    "round-for-round even short of the fixpoint).",
)
def golden_record_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from map_reduce_engine_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = dd.minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    # the component loop's doubled-edge union would otherwise execute the
    # whole MinHash-verify pipeline once per union branch: freeze the pair
    # set first (it is the dup-pair list — tiny relative to the corpus)
    pairs = dd.jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.7, candidates=cands
    ).localCheckpoint(eager=True)
    # max_iter pinned to the oracle's 8 unrolled label-prop rounds: the
    # early-broken fixpoint equals the fixed unrolling whenever the graph
    # converges within 8 hops, and both sides run the identical 8 rounds
    # when it does not
    comp = connected_components(pairs, src="id1", dst="id2", max_iter=8)
    # members feed three aggregations (sizes + two field votes)
    mem = comp.join(
        docs.select(F.col("doc_id").alias("node"), "lang", "source"), "node"
    ).localCheckpoint(eager=True)

    def majority(field: str, out: str) -> DataFrame:
        votes = mem.groupBy("component", field).agg(F.count("*").alias("c"))
        w = Window.partitionBy("component").orderBy(F.desc("c"), F.asc(field))
        return (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("component", F.col(field).alias(out))
        )

    return (
        mem.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .join(majority("source", "golden_source"), "component")
        .join(majority("lang", "golden_lang"), "component")
        .select(
            F.col("component").alias("canonical_id"),
            "n_members",
            "golden_source",
            "golden_lang",
        )
    )


@register(
    "substring_dedup_rewrite",
    oracle=f"""
    WITH {_DUCK_SUBSTR_G},
    canon AS (
      SELECT h, min(doc_id) AS canon_id
      FROM (SELECT DISTINCT doc_id, h FROM g)
      GROUP BY h HAVING count(*) >= 2
    ),
    rem AS (
      SELECT DISTINCT g.doc_id, g.i + o.k AS p
      FROM g JOIN canon USING (h) CROSS JOIN unnest(range(0, 50)) AS o(k)
      WHERE g.doc_id <> canon.canon_id
    ),
    toks AS (
      SELECT doc_id, i AS p, l[i] AS tok
      FROM d, unnest(range(1, len(l) + 1)) AS u(i)
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.p = r.p
      WHERE r.p IS NULL
    ),
    reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
             count(*) AS kept FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id AS id,
           coalesce(reb.text, '') AS text,
           len(d.l)::BIGINT AS n_tokens,
           (len(d.l) - coalesce(reb.kept, 0))::BIGINT AS removed_tokens
    FROM d LEFT JOIN reb USING (doc_id)
    """,
    doc="the exact-substring REWRITE (Lee et al. ACL'22's actual output): "
    "the corpus with every non-canonical occurrence of a duplicated "
    "50-token run excised from the text — span removal, not document "
    "removal, so one shared license block no longer drags whole documents "
    "out of the corpus. Reassembly is the per-SPAN excision: removable "
    "tile starts merge to maximal per-doc spans, which collect to one "
    "array per document and drive an in-row filter-by-index over the "
    "token array — the token stream is never exploded or shuffled "
    "(3.3x faster than the position-explode form it replaced at the "
    "adversarial 16x smoke, byte-identical). Fully-duplicated "
    "documents empty rather than vanish. The rebuilt STRINGS are part of "
    "the oracle comparison, so the excision boundaries are verified "
    "byte-for-byte, not just counted",
)
def substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    return dd.substring_dedup_rewrite(docs, "doc_id", "text", k=50)


@register(
    "decontamination_spans",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, doc_id % 100 >= 90 AS is_test, {_DUCK_L} AS l
      FROM documents WHERE trim(text) <> ''
    ),
    g AS (
      SELECT doc_id, is_test, i,
             ('0x' || substr(md5(array_to_string(l[i:i+12], ' ')), 1, 8))::BIGINT AS h
      FROM d, unnest(range(1, len(l) - 11)) AS u(i)
      WHERE len(l) >= 13
    ),
    train_tiles AS (SELECT DISTINCT h FROM g WHERE NOT is_test),
    dup AS (
      SELECT DISTINCT g.doc_id, g.i FROM g JOIN train_tiles USING (h)
      WHERE g.is_test
    ),
    isl AS (
      SELECT doc_id, i,
             sum(CASE WHEN prev_i IS NULL OR i - prev_i > 13 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev_i
        FROM dup
      )
    )
    SELECT doc_id AS id,
           min(i)::BIGINT AS span_start,
           (max(i) + 12)::BIGINT AS span_end,
           (max(i) + 12 - min(i) + 1)::BIGINT AS span_tokens
    FROM isl GROUP BY doc_id, island
    """,
    doc="GPT-3-style span-level decontamination (Brown et al. 2020 app. C: "
    "13-gram overlap against the training set): for every TEST document "
    "(the same doc_id%100>=90 holdout convention as contamination_check), "
    "the maximal spans covered by a verbatim 13-token run appearing "
    "anywhere in the TRAIN split — the spans an eval pipeline excises (or "
    "flags) before trusting a benchmark number. Asymmetric sibling of "
    "substring_dedup_spans: the train side reduces to its distinct "
    "tile-hash set (one hash aggregate), the test side equi-joins it and "
    "merges per-document; where contamination_check reports a 5-gram "
    "RATE, this returns the exact 13-gram span EXTENTS",
)
def decontamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    test = docs.where(F.col("doc_id") % 100 >= 90)
    train = docs.where(F.col("doc_id") % 100 < 90)
    return dd.cross_corpus_contamination_spans(test, train, "doc_id", "text", k=13)


# Fixed demo blocklist for the phrase-filter query: multi-token phrases that
# occur in the fixture vocabulary (plus one that never matches, so the
# no-hit path is exercised). A production run swaps the literal list for a
# broadcast table; the matching expression is identical.
_BLOCKLIST = ("slow query", "big table", "merge batch", "data leak")


@register(
    "blocklist_phrase_filter",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, source,
             ' ' || regexp_replace(trim(text), '\s+', ' ', 'g') || ' ' AS padded
      FROM documents WHERE trim(text) <> ''
    ),
    hits AS (
      SELECT doc_id, source,
             list_filter({list(_BLOCKLIST)!r},
                         p -> instr(padded, ' ' || p || ' ') > 0) AS hl
      FROM d
    )
    SELECT doc_id, source,
           len(hl)::BIGINT AS n_hits,
           array_to_string(list_sort(hl), ',') AS hit_phrases
    FROM hits WHERE len(hl) > 0
    """,
    doc="blocklist phrase filter (the C4-style 'banned word list' gate, "
    "Raffel et al. 2020): every document containing any of a fixed "
    "multi-token phrase list as a whole-word substring, with the matched "
    "phrases. Whole-word semantics via single-space normalization + "
    "space-padded containment — no regex per phrase, no tokenizer "
    "dependence. Scale shape: pure column expressions over one scan "
    "(zero shuffles, zero Python); a production blocklist of 10^4+ "
    "phrases swaps the literal array for a broadcast join on the "
    "first-token blocking key, same verify expression",
)
def blocklist_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.trim("text") != "")
    arr = "array(" + ", ".join(f"'{p}'" for p in _BLOCKLIST) + ")"
    padded = r"' ' || regexp_replace(trim(text), '\\s+', ' ') || ' '"
    return (
        docs.select(
            "doc_id",
            "source",
            F.expr(
                f"filter({arr}, p -> instr({padded}, ' ' || p || ' ') > 0)"
            ).alias("hl"),
        )
        .where(F.size("hl") > 0)
        .select(
            "doc_id",
            "source",
            F.size("hl").cast("bigint").alias("n_hits"),
            F.array_join(F.array_sort("hl"), ",").alias("hit_phrases"),
        )
    )
