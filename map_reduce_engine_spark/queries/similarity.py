"""Similarity-search conformance queries over the ``embeddings`` fixture.

Brute-force cosine top-k is the oracle-checked ground truth (the DuckDB side
computes the same double-precision dot products via list functions), and the
multi-table LSH ANN path is oracle-checked too — its seeded hyperplane
literals regenerate identically in the DuckDB twin. IVF and PQ depend on
trained centroids/codebooks (not reasonably SQL-expressible), so their
conformance artifacts are per-query verdict oracles (exactly k results +
recall floor met); all approximate methods additionally report recall@k
against brute force (ann_recall_report, tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators import similarity as sim
from map_reduce_engine_spark.queries.base import register, t

# DuckDB cosine between two FLOAT[] lists, accumulated in double precision
# (parity with operators/similarity.py which casts to double before the
# zip_with/aggregate dot product).
_DUCK_COS = (
    "list_dot_product(a::DOUBLE[], b::DOUBLE[]) / "
    "(sqrt(list_dot_product(a::DOUBLE[], a::DOUBLE[])) * sqrt(list_dot_product(b::DOUBLE[], b::DOUBLE[])))"
)


@register(
    "knn_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round({_DUCK_COS.replace('a::', 'q.qv::').replace('b::', 'e.embedding::')}, 6) AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
    doc="exact cosine top-10 neighbors for 5 probe vectors (brute force, broadcast queries)",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    return out.select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))


@register(
    "embedding_near_dup",
    oracle=f"""
    SELECT x.vec_id AS id1, y.vec_id AS id2,
           round({_DUCK_COS.replace('a::', 'x.embedding::').replace('b::', 'y.embedding::')}, 6) AS cosine
    FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
    WHERE x.vec_id < 400 AND y.vec_id < 400
      AND round({_DUCK_COS.replace('a::', 'x.embedding::').replace('b::', 'y.embedding::')}, 6) >= 0.99
    """,
    doc="embedding-cosine near-duplicate pairs (exact all-pairs on a bounded slice)",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    # n_planes=0 → exact all-pairs within the bounded slice (oracle-comparable);
    # the LSH-bucketed scale path is exercised by ann_topk below.
    return sim.embedding_near_dup(emb, "vec_id", "embedding", threshold=0.99, n_planes=0)


def _ann_lsh_oracle(k: int = 10, n_planes: int = 8, n_tables: int = 4, seed: int = 42, dim: int = 64) -> str:
    """DuckDB twin of the multi-table multi-probe LSH ANN query.

    The hyperplanes are a SEEDED numpy Gaussian sample embedded as literal
    arrays on the Spark side (``operators.similarity.random_hyperplane_
    buckets``); regenerating them here with the same seeds and emitting
    them as ``repr``-round-tripped double literals makes both engines hash
    against bit-identical planes. Sign bits agree because DuckDB's
    ``list_dot_product`` accumulates in the same left-to-right double order
    as Spark's ``F.aggregate`` (already relied on by knn_cosine_topk), and
    a Gaussian dot product never lands within an ulp of zero on this
    fixture. Candidate set, multi-probe fan-out, cosine, and ranking then
    mirror the Spark plan clause for clause.
    """
    import numpy as np

    def bucket_expr(planes) -> str:
        terms = []
        for p, row in enumerate(planes):
            lits = ", ".join(repr(float(x)) for x in row)
            terms.append(
                f"(CASE WHEN list_dot_product(v, [{lits}]) >= 0 THEN {1 << p} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")::BIGINT"

    per_table = []
    for t_ in range(n_tables):
        planes = np.random.RandomState(seed + t_).standard_normal((n_planes, dim))
        per_table.append(
            f"SELECT vec_id, {t_} AS tbl, {bucket_expr(planes)} AS bucket, v FROM emb"
        )
    cb = "\n      UNION ALL ".join(per_table)
    probes = ", ".join(str(x) for x in [0] + [1 << i for i in range(n_planes)])
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      {cb}
    ),
    qp AS (
      SELECT vec_id AS query_id, tbl, xor(bucket, px.x) AS bucket
      FROM cb CROSS JOIN unnest([{probes}]) AS px(x)
      WHERE vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
      FROM qp JOIN cb c ON c.tbl = qp.tbl AND c.bucket = qp.bucket
      WHERE c.vec_id <> qp.query_id
    ),
    scored AS (
      SELECT cd.query_id, cd.neighbor_id,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) AS cosine
      FROM cand cd
      JOIN emb a ON a.vec_id = cd.query_id
      JOIN emb b ON b.vec_id = cd.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


@register(
    "ann_lsh_topk",
    oracle=_ann_lsh_oracle(),
    doc="ANN top-k via multi-table multi-probe random-hyperplane LSH buckets "
    "(the 100 TB scale path). FULLY oracle-checked: the seeded plane "
    "literals regenerate identically in the DuckDB twin, so buckets, "
    "probes, candidates, and ranked cosines all match bit-for-bit",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.ann_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10, n_planes=8)
    return out.select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))


@register(
    "ivf_ann_topk",
    oracle="""
    SELECT vec_id AS query_id,
           10::BIGINT AS n_results,
           TRUE AS floor_met
    FROM embeddings WHERE vec_id < 5
    """,
    doc="ANN top-k via IVF cells (distributed KMeans centroids, n_probe "
    "nearest cells). The neighbor lists depend on the trained centroids "
    "(not SQL-reproducible without re-running KMeans), so the conformance "
    "artifact is a per-query deterministic verdict: exactly k results "
    "returned and recall@10 vs the in-Spark exact brute force >= 0.2 "
    "(observed minimum across fixture scales is 0.3; 0.6 at the driver's "
    "sf0.01). The raw neighbor output shape is covered oracle-exactly by "
    "ann_lsh_topk; the operator itself is recall-gated in "
    "tests/test_operators.py",
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.ivf_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=10, n_cells=16, n_probe=4
    ).localCheckpoint(eager=True)  # feeds two subtrees (count + recall join): run once
    exact = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = out.select("query_id", "neighbor_id").join(exact, ["query_id", "neighbor_id"])
    per_q = out.groupBy("query_id").agg(F.count("*").alias("n_results"))
    recall = hits.groupBy("query_id").agg((F.count("*") / F.lit(10.0)).alias("recall"))
    return per_q.join(recall, "query_id", "left").select(
        "query_id",
        "n_results",
        (F.coalesce("recall", F.lit(0.0)) >= 0.2).alias("floor_met"),
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
           len(embedding)::BIGINT AS dim
    FROM embeddings
    """,
    doc="vector metadata pass: L2 norms + dimensionality (zip_with/aggregate math)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(F.aggregate(vecd, F.lit(0.0), lambda acc, x: acc + x * x)), 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@register(
    "label_centroid_distance",
    oracle="""
    WITH centroids AS (
      SELECT label, avg(e) AS c, i
      FROM (SELECT label, unnest(embedding::DOUBLE[]) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY label, i
    )
    SELECT c.label, n.n_vectors, c.centroid_sq_norm
    FROM (SELECT label, round(sum(c * c), 6) AS centroid_sq_norm
          FROM centroids GROUP BY label) c
    JOIN (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label) n
      ON c.label = n.label
    """,
    doc="per-label centroid statistics (grouped vector aggregation)",
)
def label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    # explode to (label, i, e), average per (label, i), then fold back per label
    ex = emb.select(
        "label", F.posexplode(F.transform(F.col("embedding"), lambda x: x.cast("double"))).alias("i", "e")
    )
    cent = ex.groupBy("label", "i").agg(F.avg("e").alias("c"))
    n_per_label = emb.groupBy("label").agg(F.count("*").alias("n_vectors"))
    sq = cent.groupBy("label").agg(F.round(F.sum(F.col("c") * F.col("c")), 6).alias("centroid_sq_norm"))
    return n_per_label.join(sq, "label").select("label", "n_vectors", "centroid_sq_norm")


@register(
    "ann_recall_report",
    oracle="""
    SELECT 'lsh' AS method, 0.3::DOUBLE AS floor, TRUE AS floor_met,
           50::BIGINT AS n_exact
    UNION ALL
    SELECT 'ivf' AS method, 0.4::DOUBLE AS floor, TRUE AS floor_met,
           50::BIGINT AS n_exact
    UNION ALL
    SELECT 'pq' AS method, 0.25::DOUBLE AS floor, TRUE AS floor_met,
           50::BIGINT AS n_exact
    """,
    doc="recall@10 of each ANN method (multi-table LSH, IVF) against the "
    "exact brute-force neighbors for 5 probes, computed entirely as joins "
    "and aggregates — the quality dashboard a production ANN deployment "
    "watches. The recall VALUE depends on the seeded hash family / trained "
    "centroids (not SQL-reproducible without re-deriving both), so the "
    "conformance artifact is the deterministic verdict: recall >= the "
    "method's floor (LSH 0.3, IVF 0.4, PQ 0.25)"
    " plus the exact-neighbor count the denominators came from; a "
    "recall collapse flips floor_met and hash-mismatches the ledger",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = (
        sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)  # joined once per method: run once
    )
    n_exact = exact.count()
    reports = []
    # the tuned operating points test_operators.py validates: few planes on
    # 64-dim near-uniform vectors (more planes → vanishing buckets), 4/16
    # cells probed for IVF
    for method, floor, df in (
        ("lsh", 0.3, sim.ann_topk(emb, queries, "vec_id", "embedding", k=10, n_planes=6)),
        (
            "ivf",
            0.4,
            sim.ivf_topk(emb, queries, "vec_id", "embedding", k=10, n_cells=16, n_probe=4),
        ),
        ("pq", 0.25, sim.pq_topk(emb, queries, "vec_id", "embedding", k=10, m=16, n_codes=16)),
    ):
        hits = df.select("query_id", "neighbor_id").join(exact, ["query_id", "neighbor_id"])
        reports.append(
            hits.agg(
                F.lit(method).alias("method"),
                F.lit(floor).cast("double").alias("floor"),
                ((F.count("*") / F.lit(n_exact)) >= F.lit(floor)).alias("floor_met"),
                F.lit(n_exact).cast("bigint").alias("n_exact"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@register(
    "knn_cosine_int8",
    # Fully oracle-checked: DuckDB rounds doubles half-away-from-zero like
    # Spark's HALF_UP, quantized dot products are exact integers (order-
    # independent), and both engines clamp to [-127, 127] by construction.
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec FROM embeddings
    ),
    s AS (
      SELECT vec_id, vec,
             coalesce(list_max(list_transform(vec, x -> abs(x))), 0.0) AS absmax
      FROM v
    ),
    sc AS (
      SELECT vec_id, vec,
             CASE WHEN absmax > 0 THEN absmax / 127.0 ELSE 1.0 END AS scale
      FROM s
    ),
    qv AS (
      SELECT vec_id,
             list_transform(vec, x -> greatest(-127.0, least(127.0, round(x / scale)))) AS qvec
      FROM sc
    ),
    n AS (
      SELECT vec_id, qvec, sqrt(list_dot_product(qvec, qvec)) AS nrm FROM qv
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.qvec, c.qvec) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
    doc="brute-force cosine top-10 over int8-QUANTIZED embeddings (4x "
    "smaller storage/shuffle than float32; scales cancel in cosine). "
    "FULLY oracle-checked: quantized dot products are exact integers, so "
    "float summation order is moot; operator-level test additionally "
    "bounds the quantization error at <2% absolute cosine",
)
def knn_cosine_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_spark.operators.similarity import cosine_int8, quantize_int8

    emb = quantize_int8(t(spark, sf_dir, "embeddings"), "embedding")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qv"), F.col("qscale").alias("qs")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("cv"), F.col("qscale").alias("cs")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_int8(F.col("qv"), F.col("qs"), F.col("cv"), F.col("cs")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


@register(
    "pq_ann_topk",
    oracle="""
    SELECT vec_id AS query_id,
           10::BIGINT AS n_results,
           TRUE AS floor_met
    FROM embeddings WHERE vec_id < 5
    """,
    doc="ANN top-k via product quantization with asymmetric distance "
    "(operators/similarity.py::pq_topk): vectors stored as 16 one-byte "
    "subspace codes (16x smaller than float32), queries score through "
    "broadcast per-subspace lookup tables — the memory/bandwidth-bound "
    "regime (FAISS IndexPQ) that complements LSH (hash) and IVF "
    "(clustering); compose codes inside IVF cells for IVFPQ at 100 TB. "
    "Codes depend on the trained codebooks, so like ivf_ann_topk the "
    "conformance artifact is a per-query verdict: exactly k results and "
    "recall@10 vs the in-Spark exact brute force >= 0.2 (measured minimum "
    "0.3, aggregate 0.48 across fixture scales)",
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.pq_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=10, m=16, n_codes=16
    ).localCheckpoint(eager=True)  # feeds two subtrees (count + recall join): run once
    exact = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = out.select("query_id", "neighbor_id").join(exact, ["query_id", "neighbor_id"])
    per_q = out.groupBy("query_id").agg(F.count("*").alias("n_results"))
    recall = hits.groupBy("query_id").agg((F.count("*") / F.lit(10.0)).alias("recall"))
    return per_q.join(recall, "query_id", "left").select(
        "query_id",
        "n_results",
        (F.coalesce("recall", F.lit(0.0)) >= 0.2).alias("floor_met"),
    )


@register(
    "semantic_dedup",
    oracle="""
    SELECT count(*)::BIGINT AS n_total, TRUE AS partition_ok, TRUE AS dropped_valid
    FROM embeddings
    """,
    doc="SemDeDup semantic dedup (arXiv:2303.09540): KMeans-cell-local "
    "cosine pruning with deterministic min-id survivors. Cell assignment "
    "depends on the trained centroids (not SQL-reproducible), so the "
    "conformance artifact is a verdict row: kept+dropped exactly "
    "partitions the corpus (every id once), and every dropped id is "
    "re-verified against its keeper through an INDEPENDENT JVM-side "
    "exact-cosine recompute >= tau (the drop decision itself came from the "
    "numpy-side Arrow pass — two disjoint code paths must agree). The "
    "fixture embeddings carry no planted near-dups (max pairwise cosine "
    "~0.51), so tau=0.4 exercises a non-empty drop path.",
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    res = sim.semantic_dedup(
        emb, "vec_id", "embedding", n_cells=16, threshold=0.4
    ).localCheckpoint(eager=True)  # feeds three aggregates: run once

    vec = emb.select(
        F.col("vec_id").alias("kid"),
        sim._vecd(F.col("embedding")).alias("kv"),
    ).withColumn("knorm", sim.l2_norm(F.col("kv")))
    dvec = emb.select(
        F.col("vec_id").alias("did"),
        sim._vecd(F.col("embedding")).alias("dv"),
    ).withColumn("dnorm", sim.l2_norm(F.col("dv")))
    dropped_ok = (
        res.where(~F.col("is_kept"))
        .join(dvec, F.col("vec_id") == F.col("did"))
        .join(vec, F.col("keeper_id") == F.col("kid"))
        .select(
            (
                sim.dot(F.col("dv"), F.col("kv"))
                / F.nullif(F.col("dnorm") * F.col("knorm"), F.lit(0.0))
                >= 0.4
            ).alias("ok")
        )
        .agg(F.coalesce(F.bool_and("ok"), F.lit(True)).alias("dropped_valid"))
    )
    stats = res.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("vec_id").alias("n_ids"),
    )
    total = emb.agg(F.count("*").alias("n_total"))
    return (
        stats.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(dropped_ok))
        .select(
            "n_total",
            ((F.col("n_rows") == F.col("n_total")) & (F.col("n_ids") == F.col("n_total"))).alias(
                "partition_ok"
            ),
            "dropped_valid",
        )
    )


def _jl_oracle() -> str:
    """DuckDB twin of the JL projection: the identical seeded plane
    literals inlined, the identical dot-product accumulation order."""
    planes = sim.jl_plane_literals(out_dim=16, seed=7, dim=64)
    plist = ", ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[])"
        for row in planes
    )
    return f"""
    WITH pr AS (
      SELECT vec_id, [{plist}] AS p
      FROM embeddings WHERE vec_id < 20
    ),
    pairs AS (
      SELECT e1.vec_id AS id1, e2.vec_id AS id2,
             round(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(e1.embedding::DOUBLE[], e1.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(e2.embedding::DOUBLE[], e2.embedding::DOUBLE[]))), 6) AS cos_orig,
             round(list_dot_product(p1.p, p2.p) /
                   (sqrt(list_dot_product(p1.p, p1.p)) * sqrt(list_dot_product(p2.p, p2.p))), 6) AS cos_proj
      FROM embeddings e1
      JOIN embeddings e2 ON e1.vec_id < e2.vec_id AND e2.vec_id < 20
      JOIN pr p1 ON p1.vec_id = e1.vec_id
      JOIN pr p2 ON p2.vec_id = e2.vec_id
      WHERE e1.vec_id < 20
    )
    SELECT id1, id2, cos_orig, cos_proj, round(abs(cos_orig - cos_proj), 6) AS abs_err
    FROM pairs
    """


@register(
    "jl_distance_preservation",
    oracle=_jl_oracle(),
    doc="Johnson-Lindenstrauss random projection 64 → 16 dims "
    "(operators/similarity.py::random_projection): a narrow, shuffle-free "
    "per-row map over seeded Gaussian literal planes that cuts every "
    "downstream distance computation and shuffle byte count 4x. "
    "Conformance output: every probe pair's original vs projected cosine "
    "and the absolute distortion — FULLY oracle-checked because the "
    "DuckDB twin inlines the identical plane literals and replays the "
    "identical accumulation order (test_operators.py asserts the JL "
    "distortion bound actually holds)",
)
def jl_distance_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pr = sim.random_projection(emb, "vec_id", "embedding", out_dim=16, seed=7, dim=64)
    probe = emb.where(F.col("vec_id") < 20)
    e1 = probe.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    e2 = probe.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    p1 = pr.select(F.col("id").alias("id1"), F.col("proj").alias("q1"))
    p2 = pr.select(F.col("id").alias("id2"), F.col("proj").alias("q2"))
    vd = sim._vecd
    pairs = (
        e1.join(e2, F.col("id1") < F.col("id2"))
        .join(p1, "id1")
        .join(p2, "id2")
        .select(
            "id1",
            "id2",
            F.round(
                sim.dot(vd(F.col("v1")), vd(F.col("v2")))
                / (sim.l2_norm(vd(F.col("v1"))) * sim.l2_norm(vd(F.col("v2")))),
                6,
            ).alias("cos_orig"),
            F.round(
                sim.dot(F.col("q1"), F.col("q2"))
                / (sim.l2_norm(F.col("q1")) * sim.l2_norm(F.col("q2"))),
                6,
            ).alias("cos_proj"),
        )
    )
    return pairs.select(
        "id1", "id2", "cos_orig", "cos_proj",
        F.round(F.abs(F.col("cos_orig") - F.col("cos_proj")), 6).alias("abs_err"),
    )


@register(
    "maxsim_late_interaction",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, vec_id // 5 AS doc, embedding FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE doc < 2),
    scored AS (
      SELECT q.doc AS query_doc, v.doc AS cand_doc, q.vec_id AS qvec,
             max(CAST(round(({_DUCK_COS.replace('a::', 'q.embedding::').replace('b::', 'v.embedding::')}) * 1000000, 0) AS BIGINT)) AS best
      FROM q JOIN v ON v.doc <> q.doc
      GROUP BY 1, 2, 3
    ),
    summed AS (
      SELECT query_doc, cand_doc, sum(best) AS score_micro
      FROM scored GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_doc, cand_doc, score_micro,
             row_number() OVER (PARTITION BY query_doc
                                ORDER BY score_micro DESC, cand_doc) AS rank
      FROM summed
    )
    SELECT query_doc, cand_doc, score_micro::BIGINT AS score_micro, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
    doc="ColBERT-style late-interaction retrieval: documents are BAGS of "
    "vectors (here vec_id div 5 groups 500 embeddings into 100 5-vector "
    "docs) and score(q, d) = sum over query vectors of the max cosine "
    "against any doc vector — the multi-vector semantics single-vector "
    "ANN can't express. Shape: broadcast the (tiny) query bag, one "
    "equi-free scoring join, then TWO aggregates (max per query-vector, "
    "sum per doc pair) and a per-query top-k window. Scores are summed in "
    "exact MICRO-cosine integers (bigint) so cross-engine float addition "
    "order can't shift a rank. At 100 TB the scoring join runs per "
    "candidate from a first-stage ANN, not the full corpus — this query "
    "IS that second stage, restricted to 2 probe docs",
)
def maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", (F.col("vec_id") / 5).cast("bigint").alias("doc"), "embedding"
    )
    vd = sim._vecd
    q = emb.where(F.col("doc") < 2).select(
        F.col("doc").alias("query_doc"),
        F.col("vec_id").alias("qvec"),
        vd(F.col("embedding")).alias("qv"),
    )
    c = emb.select(
        F.col("doc").alias("cand_doc"),
        vd(F.col("embedding")).alias("cv"),
    )
    cos = sim.dot(F.col("qv"), F.col("cv")) / (
        sim.l2_norm(F.col("qv")) * sim.l2_norm(F.col("cv"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_doc") != F.col("query_doc"))
        .groupBy("query_doc", "cand_doc", "qvec")
        .agg(F.max(F.round(cos * 1000000, 0).cast("bigint")).alias("best"))
    )
    summed = scored.groupBy("query_doc", "cand_doc").agg(
        F.sum("best").alias("score_micro")
    )
    w = Window.partitionBy("query_doc").orderBy(F.desc("score_micro"), "cand_doc")
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_doc", "cand_doc", "score_micro", F.col("rank").cast("bigint").alias("rank")
        )
    )


@register(
    "ivfpq_ann_topk",
    oracle="""
    SELECT vec_id AS query_id,
           10::BIGINT AS n_results,
           TRUE AS floor_met
    FROM embeddings WHERE vec_id < 5
    """,
    doc="ANN top-k via IVF cells + residual product quantization "
    "(operators/similarity.py::ivfpq_topk) — the FAISS IndexIVFPQ "
    "composition: coarse centroids bound the candidate set (equi-join on "
    "cell, probed n_probe cells per query), residual PQ codes bound the "
    "index bytes (~m per vector), and the per-candidate score is "
    "q·centroid + m LUT lookups, pure JVM. Codebooks/centroids are "
    "trained, so the conformance artifact is the per-query verdict: "
    "exactly k results and recall@10 vs in-Spark brute force >= 0.2 "
    "(measured 0.38-0.42 across fixture scales)",
)
def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.ivfpq_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=10, n_cells=16, n_probe=4
    ).localCheckpoint(eager=True)  # feeds two subtrees (count + recall join): run once
    exact = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = out.select("query_id", "neighbor_id").join(exact, ["query_id", "neighbor_id"])
    per_q = out.groupBy("query_id").agg(F.count("*").alias("n_results"))
    recall = hits.groupBy("query_id").agg((F.count("*") / F.lit(10.0)).alias("recall"))
    return per_q.join(recall, "query_id", "left").select(
        "query_id",
        "n_results",
        (F.coalesce("recall", F.lit(0.0)) >= 0.2).alias("floor_met"),
    )


@register(
    "binary_hamming_topk",
    oracle="""
    WITH codes AS (
      SELECT vec_id,
        list_sum(list_transform(range(1, 33),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT AS lo,
        list_sum(list_transform(range(33, 65),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END))::BIGINT AS hi
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, lo, hi FROM codes WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             (bit_count(xor(c.lo, q.lo)::BIT) + bit_count(xor(c.hi, q.hi)::BIT))::BIGINT AS hamming
      FROM q JOIN codes c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, hamming, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 30
    """,
    doc="binary-quantized first-stage retrieval (operators/similarity.py::"
    "binary_quantize / hamming_topk): each embedding packs to 64 SIGN "
    "bits (two 32-bit words — 256x smaller than float32) and candidates "
    "rank by Hamming distance, pure integer xor+popcount per pair. "
    "FULLY oracle-checked — the code is deterministic bit math both "
    "engines replay exactly (unlike the trained ANN tiers' verdicts). "
    "The cascade contract (top-30 here catches ~0.64 of the exact top-10, "
    "asserted in test_operators.py) is the standard rerank recipe: this "
    "tier scans one word per vector, the exact/PQ tier rescores only its "
    "survivors",
)
def binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.hamming_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=30)


def _ranking_metrics_oracle() -> str:
    """MRR/NDCG of the (fully deterministic) binary Hamming tier against
    exact-cosine relevance, all in integer micro-units: per-rank DCG
    contributions are round(1e6 / log2(rank+1)) — identical doubles
    rounded identically — summed as BIGINTs, so no float-order drift."""
    codes = """
      SELECT vec_id,
        list_sum(list_transform(range(1, 33),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT AS lo,
        list_sum(list_transform(range(33, 65),
          i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END))::BIGINT AS hi
      FROM embeddings
    """
    return f"""
    WITH codes AS ({codes}),
    q AS (SELECT vec_id AS query_id, lo, hi FROM codes WHERE vec_id < 5),
    ham AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             (bit_count(xor(c.lo, q.lo)::BIT) + bit_count(xor(c.hi, q.hi)::BIT)) AS hamming
      FROM q JOIN codes c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
      FROM ham
    ),
    exact_scored AS (
      SELECT e1.vec_id AS query_id, e2.vec_id AS neighbor_id,
             round(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(e1.embedding::DOUBLE[], e1.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(e2.embedding::DOUBLE[], e2.embedding::DOUBLE[]))), 6) AS cosine
      FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < 5 AND e2.vec_id <> e1.vec_id
    ),
    rel AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS xr
        FROM exact_scored
      ) WHERE xr <= 10
    ),
    hits AS (
      SELECT ranked.query_id, ranked.rank
      FROM ranked JOIN rel ON rel.query_id = ranked.query_id
                          AND rel.neighbor_id = ranked.neighbor_id
      WHERE ranked.rank <= 30
    ),
    per_q AS (
      SELECT query_id,
             count(*) AS n_hits,
             min(rank) AS first_hit_rank,
             sum(CAST(round(1000000.0 / log2(rank + 1), 0) AS BIGINT))::BIGINT AS dcg_micro
      FROM hits GROUP BY query_id
    ),
    ideal AS (
      SELECT sum(CAST(round(1000000.0 / log2(i + 1), 0) AS BIGINT))::BIGINT AS idcg_micro
      FROM unnest(range(1, 11)) AS u(i)
    )
    SELECT q.query_id,
           coalesce(per_q.n_hits, 0)::BIGINT AS n_hits,
           coalesce(per_q.first_hit_rank, 0)::BIGINT AS first_hit_rank,
           coalesce(per_q.dcg_micro, 0)::BIGINT AS dcg_micro,
           round(coalesce(per_q.dcg_micro, 0)::DOUBLE / ideal.idcg_micro, 4) AS ndcg
    FROM q LEFT JOIN per_q ON per_q.query_id = q.query_id, ideal
    """


@register(
    "ann_ranking_metrics",
    oracle=_ranking_metrics_oracle(),
    doc="retrieval-quality metrics for the binary Hamming tier scored "
    "against exact-cosine relevance (the top-10 brute-force neighbors): "
    "per query, the hit count in the tier's top-30, the first relevant "
    "rank (MRR's numerator), and DCG/NDCG — with every DCG contribution "
    "converted to round(1e6/log2(rank+1)) INTEGER micro-units before "
    "summation, so cross-engine float addition order cannot move a "
    "metric. Both the ranking under evaluation (deterministic sign "
    "codes) and the relevance set (exact cosine) are SQL-reproducible, "
    "so the whole evaluation is FULLY oracle-checked — the eval harness "
    "a production retrieval deployment runs nightly",
)
def ann_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    ranked = sim.hamming_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=30)
    rel = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = ranked.join(rel, ["query_id", "neighbor_id"]).select("query_id", "rank")
    contrib = F.round(F.lit(1000000.0) / F.log2(F.col("rank") + 1), 0).cast("bigint")
    per_q = hits.groupBy("query_id").agg(
        F.count("*").alias("n_hits"),
        F.min("rank").alias("first_hit_rank"),
        F.sum(contrib).cast("bigint").alias("dcg_micro"),
    )
    ideal = (
        spark.range(1, 11)
        .agg(F.sum(F.round(F.lit(1000000.0) / F.log2(F.col("id") + 1), 0).cast("bigint")).alias("idcg_micro"))
    )
    base = queries.select(F.col("vec_id").alias("query_id"))
    return (
        base.join(per_q, "query_id", "left")
        .crossJoin(F.broadcast(ideal))
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce("first_hit_rank", F.lit(0)).cast("bigint").alias("first_hit_rank"),
            F.coalesce("dcg_micro", F.lit(0)).cast("bigint").alias("dcg_micro"),
            F.round(F.coalesce("dcg_micro", F.lit(0)) / F.col("idcg_micro"), 4).alias("ndcg"),
        )
    )


_MAT_COS_FULL = (
    "list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) * "
    "sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))"
)
_MAT_COS_TRUNC = (
    "list_dot_product(q.qv[1:16]::DOUBLE[], e.embedding[1:16]::DOUBLE[]) / "
    "(sqrt(list_dot_product(q.qv[1:16]::DOUBLE[], q.qv[1:16]::DOUBLE[])) * "
    "sqrt(list_dot_product(e.embedding[1:16]::DOUBLE[], e.embedding[1:16]::DOUBLE[])))"
)


@register(
    "matryoshka_truncation_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    fullr AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY round({_MAT_COS_FULL}, 6) DESC, e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
      ) WHERE rank <= 10
    ),
    truncr AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY round({_MAT_COS_TRUNC}, 6) DESC, e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
      ) WHERE rank <= 10
    )
    SELECT f.query_id,
           count(t.neighbor_id)::BIGINT AS overlap_at_10,
           1000 * count(t.neighbor_id)::BIGINT // 10 AS recall_permille
    FROM fullr f LEFT JOIN truncr t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
    doc="Matryoshka-style truncation evaluation: top-10 cosine neighbors "
    "from the FIRST 16 of 64 dimensions vs the full-dimension top-10, "
    "overlap per probe in integer permille — the measurement that decides "
    "whether a 4x cheaper truncated index is good enough as a first stage. "
    "Both rankings are deterministic (rounded score, id tiebreak); the "
    "comparison is an exact count, so the eval is fully oracle-checked. "
    "Same bounded-probe scan shape as knn_cosine_topk",
)
def matryoshka_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 5)
    full = sim.cosine_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=10)
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    probes16 = emb16.where(F.col("vec_id") < 5)
    trunc = sim.cosine_topk(emb16, probes16, id_col="vec_id", vec_col="embedding", k=10)
    f = full.select("query_id", "neighbor_id")
    tr = trunc.select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    joined = f.join(
        tr, (F.col("query_id") == F.col("tq")) & (F.col("neighbor_id") == F.col("tn")), "left"
    )
    return joined.groupBy("query_id").agg(
        F.count("tn").cast("bigint").alias("overlap_at_10"),
        F.expr("1000 * count(tn) div 10").alias("recall_permille"),
    )


@register(
    "label_balance_audit",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT sum(n)::BIGINT AS total, max(n) AS max_n, min(n) AS min_n FROM c)
    SELECT c.label, c.n,
           CAST(10000 * c.n // t.total AS BIGINT) AS share_bp,
           100 * t.max_n // t.min_n AS imbalance_pct
    FROM c CROSS JOIN t
    """,
    doc="training-label balance audit over the embedding table: per-class "
    "share in integer basis points plus the global max/min imbalance "
    "ratio — the class-skew gate a fine-tuning pipeline checks before "
    "sampling weights are chosen. One aggregate + a broadcast 1-row "
    "summary",
)
def label_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count("*").alias("n"))
    tt = c.agg(
        F.sum("n").alias("total"), F.max("n").alias("max_n"), F.min("n").alias("min_n")
    )
    return c.crossJoin(F.broadcast(tt)).select(
        "label",
        "n",
        F.expr("10000 * n div total").alias("share_bp"),
        F.expr("100 * max_n div min_n").alias("imbalance_pct"),
    )


@register(
    "knn_label_accuracy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id < 50
    ),
    scored AS (
      SELECT q.query_id, q.true_label, e.vec_id AS neighbor_id, e.label,
             round({_DUCK_COS.replace('a::', 'q.qv::').replace('b::', 'e.embedding::')}, 6)
               AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, true_label, label, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ),
    votes AS (
      SELECT query_id, true_label, label, count(*)::BIGINT AS votes
      FROM ranked WHERE rank <= 5
      GROUP BY query_id, true_label, label
    ),
    top AS (
      SELECT query_id, true_label, label AS predicted,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, label) AS vr
      FROM votes
    )
    SELECT true_label,
           count(*)::BIGINT AS n_probes,
           sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)::BIGINT
             AS n_correct,
           10000 * sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)::BIGINT
             // count(*)::BIGINT AS accuracy_bp
    FROM top WHERE vr = 1
    GROUP BY true_label
    """,
    doc="k-NN classifier evaluation over the labeled embedding fixture: "
    "5-nearest-neighbor majority vote (ties -> smallest label, the "
    "deterministic convention) vs true label for a bounded 50-probe set, "
    "reported as per-class accuracy in integer basis points — the "
    "label-quality smoke test an embedding pipeline runs before trusting "
    "vectors for retrieval or dedup. Reuses the sanctioned bounded-probe "
    "exact-kNN scan; all post-scan aggregates are per-query-bounded.",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 50)
    nn = sim.cosine_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=5)
    truth = probes.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        nn.join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "label")
        .agg(F.count("*").alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    top = votes.withColumn("vr", F.row_number().over(wv)).where(F.col("vr") == 1)
    correct = F.sum(
        F.when(F.col("label") == F.col("true_label"), 1).otherwise(0)
    ).cast("bigint")
    return top.groupBy("true_label").agg(
        F.count("*").alias("n_probes"),
        correct.alias("n_correct"),
        F.expr(
            "10000 * CAST(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END)"
            " AS BIGINT) div CAST(count(*) AS BIGINT)"
        ).alias("accuracy_bp"),
    )


@register(
    "embedding_covariance_top",
    oracle="""
    WITH pairs AS (
      SELECT i, j FROM range(0, 64) t(i), range(0, 64) s(j) WHERE j > i
    ),
    ex AS (
      SELECT p.i, p.j,
             e.embedding[p.i + 1]::DOUBLE AS x,
             e.embedding[p.j + 1]::DOUBLE AS y
      FROM embeddings e, pairs p
    ),
    stats AS (
      SELECT i, j,
             round(avg(x * y) - avg(x) * avg(y), 8) AS cov
      FROM ex GROUP BY i, j
    ),
    ranked AS (
      SELECT i::BIGINT AS dim_i, j::BIGINT AS dim_j, cov,
             row_number() OVER (ORDER BY abs(cov) DESC, i, j) AS rank
      FROM stats
    )
    SELECT dim_i, dim_j, cov, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 10
    """,
    doc="embedding covariance screening: the 10 most-correlated dimension "
    "pairs of the 64-dim embedding column (largest |cov(i,j)|) — the "
    "whitening / redundant-dimension audit run before PCA or Matryoshka "
    "truncation decisions. The per-row expansion emits dim*(dim-1)/2 "
    "products per vector via one in-row transform (no join), and the "
    "aggregate reduces to a fixed 2016-row output regardless of corpus "
    "size — a bounded-output global statistic, the same shape as "
    "numeric_correlation_matrix but over the vector column. Covariances "
    "are rounded to 8 decimals BEFORE ranking so both engines rank "
    "identical values (cross-engine double sums differ at the ulp; the "
    "(i, j) tiebreak settles rounded ties deterministically).",
)
def embedding_covariance_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, 62), i ->"
                " transform(sequence(i + 1, 63), j ->"
                " struct(i AS i, j AS j,"
                " CAST(embedding[i] AS DOUBLE) AS x,"
                " CAST(embedding[j] AS DOUBLE) AS y))))"
            )
        ).alias("p")
    ).select("p.*")
    stats = ex.groupBy("i", "j").agg(
        F.round(F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y"), 8).alias("cov")
    )
    w = Window.orderBy(F.abs(F.col("cov")).desc(), "i", "j")
    return (
        stats.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
        .select(
            F.col("i").cast("bigint").alias("dim_i"),
            F.col("j").cast("bigint").alias("dim_j"),
            "cov",
            "rank",
        )
    )


@register(
    "embedding_outlier_report",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i,
             CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS v
      FROM embeddings, range(1, 65) t(i)
    ),
    cent AS (
      SELECT label, i, sum(v) // count(*) AS c FROM ex GROUP BY label, i
    ),
    d2 AS (
      SELECT e.vec_id, e.label,
             sum((e.v - c.c) * (e.v - c.c))::BIGINT AS dist2
      FROM ex e JOIN cent c ON c.label = e.label AND c.i = e.i
      GROUP BY e.vec_id, e.label
    ),
    r AS (
      SELECT label, dist2,
             row_number() OVER (PARTITION BY label ORDER BY dist2, vec_id) AS rn,
             count(*) OVER (PARTITION BY label) AS nn
      FROM d2
    ),
    q AS (
      SELECT label,
             max(CASE WHEN rn = ((nn - 1) * 50) // 100 + 1 THEN dist2 END) AS med,
             max(CASE WHEN rn = ((nn - 1) * 99) // 100 + 1 THEN dist2 END) AS p99
      FROM r GROUP BY label
    )
    SELECT d.label, count(*)::BIGINT AS n_vectors,
           q.med::BIGINT AS median_dist2_micro2,
           q.p99::BIGINT AS p99_dist2_micro2,
           sum(CASE WHEN d.dist2 > 4 * q.med THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM d2 d JOIN q ON q.label = d.label
    GROUP BY d.label, q.med, q.p99
    """,
    doc="per-label embedding outlier report: distance-to-own-centroid "
    "distribution (median, discrete p99) and the count of vectors more "
    "than 2x the median distance out — the mislabeled/corrupt-vector QA "
    "every embedding pipeline runs before training a classifier head. "
    "Values freeze to integer micro-units at the element level (floor(x*"
    "1e6+0.5), identical formula both engines), centroids are exact "
    "integer division of sums, so every distance is an exact BIGINT and "
    "the percentiles are DISCRETE row picks (time_to_convert_cohorts "
    "template). Per-vector distances come from one explode + two "
    "hash-aggregates; the percentile window runs over one row per vector "
    "partitioned by label — at 100 TB swap the window for the mergeable "
    "sketch percentile (approx_quantile_sketch), same report schema.",
)
def embedding_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "e"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("i"),
        F.expr("CAST(floor(CAST(e AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)").alias("v"),
    )
    cent = ex.groupBy("label", "i").agg(F.expr("sum(v) div count(*)").alias("c"))
    d2 = (
        ex.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist2"))
    )
    w = Window.partitionBy("label").orderBy("dist2", "vec_id")
    r = d2.select(
        "label",
        "dist2",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("label")).alias("nn"),
    )
    q = r.groupBy("label").agg(
        F.max(F.when(F.col("rn") == F.expr("(nn - 1) * 50 div 100 + 1"), F.col("dist2"))).alias(
            "med"
        ),
        F.max(F.when(F.col("rn") == F.expr("(nn - 1) * 99 div 100 + 1"), F.col("dist2"))).alias(
            "p99"
        ),
    )
    return (
        d2.join(q, "label")
        .groupBy("label", "med", "p99")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.when(F.col("dist2") > 4 * F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "label",
            "n_vectors",
            F.col("med").cast("bigint").alias("median_dist2_micro2"),
            F.col("p99").cast("bigint").alias("p99_dist2_micro2"),
            "n_outliers",
        )
    )


def _pca_oracle(rounds: int = 8) -> str:
    """Generate the unrolled power-iteration oracle (top PC of the 64-dim
    embedding covariance).  Integer second moments -> HUGEINT-exact scaled
    covariance -> list-based matrix -> ``rounds`` mat-vec/normalize steps.
    ``list_dot_product`` folds left exactly like Spark's
    ``aggregate(zip_with(..), 0D, +)`` (the knn_cosine_topk precedent), so
    every double op happens in the same order on both engines."""
    head = """
    WITH ints AS MATERIALIZED (
      SELECT list_transform(embedding, e -> CAST(round(e * 1e6) AS BIGINT))
               AS xs
      FROM embeddings
    ),
    nn AS (SELECT count(*)::BIGINT AS n FROM ints),
    dims AS (SELECT unnest(range(64)) AS i),
    si AS MATERIALIZED (
      SELECT d.i, sum(xs[d.i + 1])::BIGINT AS s FROM ints, dims d GROUP BY d.i
    ),
    pr AS (SELECT a.i, b.i AS j FROM dims a, dims b WHERE b.i >= a.i),
    pij AS MATERIALIZED (
      SELECT p.i, p.j, sum(xs[p.i + 1] * xs[p.j + 1])::BIGINT AS pij
      FROM ints, pr p GROUP BY p.i, p.j
    ),
    craw AS MATERIALIZED (
      SELECT p.i, p.j,
             (nn.n::HUGEINT * p.pij::HUGEINT - a.s::HUGEINT * b.s::HUGEINT)
               AS ci
      FROM pij p JOIN si a ON a.i = p.i JOIN si b ON b.i = p.j, nn
    ),
    tr AS (SELECT sum(ci)::DOUBLE AS trace_raw FROM craw WHERE i = j),
    mfull AS (
      SELECT i, j, ci::DOUBLE AS c FROM craw
      UNION ALL SELECT j, i, ci::DOUBLE FROM craw WHERE i < j
    ),
    mat AS MATERIALIZED (
      SELECT list(r ORDER BY i) AS cm FROM (
        SELECT i, list(c ORDER BY j) AS r FROM mfull GROUP BY i)
    ),
    v0 AS (SELECT cm, list_transform(range(64), k -> 0.125::DOUBLE) AS v
           FROM mat)"""
    rounds_sql = []
    for r in range(1, rounds + 1):
        rounds_sql.append(
            f"w{r} AS MATERIALIZED (SELECT cm, "
            "list_transform(cm, row -> list_dot_product(row, v)) AS w "
            f"FROM v{r - 1})"
        )
        rounds_sql.append(
            f"v{r} AS MATERIALIZED (SELECT cm, "
            "list_transform(w, e -> e / sqrt(list_dot_product(w, w))) AS v "
            f"FROM w{r})"
        )
    tail = f"""
    wf AS (SELECT v, list_transform(cm, row -> list_dot_product(row, v)) AS w
           FROM v{rounds}),
    lam AS (SELECT v, list_dot_product(v, w) AS lam_raw FROM wf),
    ex AS (
      SELECT ks.k AS dim, v[ks.k + 1] AS loading, lam_raw
      FROM lam, (SELECT unnest(range(64)) AS k) ks
    ),
    ranked AS (
      SELECT dim::BIGINT AS dim, loading, lam_raw,
             row_number() OVER (ORDER BY abs(loading) DESC, dim) AS rank
      FROM ex
    )
    SELECT r.dim, round(r.loading, 6) AS loading,
           round(r.lam_raw / (nn.n::DOUBLE * nn.n::DOUBLE * 1e12), 8)
             AS eigenvalue,
           round(r.lam_raw / tr.trace_raw, 6) AS explained_share,
           r.rank::BIGINT AS rank
    FROM ranked r, nn, tr WHERE r.rank <= 8
    """
    return head + ",\n" + ",\n".join(rounds_sql) + "," + tail


@register(
    "pca_power_iteration",
    oracle=_pca_oracle(),
    doc="top principal component of the 64-dim embedding covariance via 8 "
    "rounds of in-engine power iteration — the PCA step an embedding "
    "pipeline runs before whitening or Matryoshka truncation (complements "
    "embedding_covariance_top, which only screens pairwise covariances). "
    "Engine-exact by construction: second moments are EXACT integer sums "
    "of micro-unit components (one upper-triangle in-row expansion, "
    "2080 pairs/vector, partial-aggregated to a fixed 2080-row grid "
    "regardless of corpus size); the scaled covariance n*Pij - Si*Sj is "
    "DECIMAL(38)/HUGEINT-exact and converts to double once; and the whole "
    "iteration is single-row 64-element array math (zip_with + left-fold "
    "aggregate == DuckDB list_dot_product, the knn precedent) where every "
    "float op runs in identical order on both engines — so even the "
    "eigenvector SIGN matches. Scale shape: three corpus passes (count, "
    "per-dim sums, pair products), then everything is dimension-bounded; "
    "per-round state is one 64-vector (localCheckpoint-ed, the "
    "iterative-loop discipline). Emits the top-8 |loading| dims, the "
    "eigenvalue in value^2 units, and the explained-variance share.",
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    rounds = 8
    ints = t(spark, sf_dir, "embeddings").select(
        F.expr("transform(embedding, e -> CAST(round(e * 1e6) AS BIGINT))").alias(
            "xs"
        )
    )
    nn = ints.agg(F.count("*").alias("n"))
    si = (
        ints.select(F.posexplode("xs").alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum("xi").alias("s"))
        .localCheckpoint(eager=True)
    )
    pij = (
        ints.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, 63), i ->"
                    " transform(sequence(i, 63), j -> struct(i AS i, j AS j,"
                    " element_at(xs, i + 1) * element_at(xs, j + 1) AS p))))"
                )
            ).alias("x")
        )
        .select("x.*")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("pij"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    craw = (
        pij.join(F.broadcast(si.select("i", F.col("s").alias("si_s"))), "i")
        .join(
            F.broadcast(si.select(F.col("i").alias("j"), F.col("s").alias("sj_s"))),
            "j",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (dec("n") * dec("pij") - dec("si_s") * dec("sj_s")).alias("ci"),
        )
        .localCheckpoint(eager=True)  # 2080 rows; feeds trace + both mirror halves
    )
    tr = craw.where(F.col("i") == F.col("j")).agg(
        F.sum("ci").cast("double").alias("trace_raw")
    )
    mfull = craw.select("i", "j", F.col("ci").cast("double").alias("c")).union(
        craw.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("ci").cast("double")
        )
    )
    mat = (
        mfull.groupBy("i")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(j, c))), x -> x.c)").alias(
                "r"
            )
        )
        .agg(
            F.expr("transform(array_sort(collect_list(struct(i, r))), x -> x.r)").alias(
                "cm"
            )
        )
    )
    state = (
        mat.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(tr))
        .withColumn("v", F.expr("transform(sequence(0, 63), k -> CAST(0.125 AS DOUBLE))"))
        .localCheckpoint(eager=True)
    )
    w_expr = F.expr(
        "transform(cm, row -> aggregate(zip_with(row, v, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b))"
    )
    for _ in range(rounds):
        # one checkpoint per round, AFTER normalize: the un-checkpointed
        # depth is a single round, so the (w referenced 3x in the normalize
        # expression) duplication stays constant work instead of compounding
        # across rounds; each eager checkpoint is one Spark job and the
        # round-job count IS the wall time on a 1-row state
        state = state.select("cm", "n", "trace_raw", w_expr.alias("w"))
        state = state.select(
            "cm",
            "n",
            "trace_raw",
            F.expr(
                "transform(w, e -> e / sqrt(aggregate(zip_with(w, w,"
                " (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)))"
            ).alias("v"),
        ).localCheckpoint(eager=True)
    final = state.select("n", "trace_raw", "v", w_expr.alias("wf")).select(
        "n",
        "trace_raw",
        "v",
        F.expr(
            "aggregate(zip_with(v, wf, (x, y) -> x * y), CAST(0 AS DOUBLE),"
            " (a, b) -> a + b)"
        ).alias("lam_raw"),
    )
    from pyspark.sql import Window

    ex = final.select(
        "n", "trace_raw", "lam_raw", F.posexplode("v").alias("dim", "loading")
    )
    wr = Window.orderBy(F.abs(F.col("loading")).desc(), F.col("dim"))
    return (
        ex.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rank") <= 8)
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round("loading", 6).alias("loading"),
            F.round(
                F.col("lam_raw")
                / (F.col("n").cast("double") * F.col("n").cast("double") * F.lit(1e12)),
                8,
            ).alias("eigenvalue"),
            F.round(F.col("lam_raw") / F.col("trace_raw"), 6).alias("explained_share"),
            "rank",
        )
    )


@register(
    "embedding_drift_report",
    oracle="""
    WITH ints AS (
      SELECT vec_id % 2 AS grp,
             list_transform(embedding, e -> CAST(round(e * 1e6) AS BIGINT))
               AS xs
      FROM embeddings
    ),
    cnt AS (SELECT grp, count(*)::BIGINT AS n FROM ints GROUP BY grp),
    sums AS (
      SELECT i.grp, d.i, sum(xs[d.i + 1])::BIGINT AS s
      FROM ints i, (SELECT unnest(range(64)) AS i) d GROUP BY i.grp, d.i
    ),
    means AS (
      SELECT s.grp, c.n,
             list(s.s::DOUBLE / c.n::DOUBLE ORDER BY s.i) AS m
      FROM sums s JOIN cnt c ON c.grp = s.grp GROUP BY s.grp, c.n
    ),
    ab AS (
      SELECT a.n AS n_a, b.n AS n_b, a.m AS ma, b.m AS mb
      FROM means a, means b WHERE a.grp = 0 AND b.grp = 1
    )
    SELECT n_a, n_b,
           round(list_dot_product(ma, mb)
                 / (sqrt(list_dot_product(ma, ma))
                    * sqrt(list_dot_product(mb, mb))), 6) AS cosine_means,
           CAST(round(1e6 * list_aggregate(
             list_transform(range(64), k -> abs(ma[k + 1] - mb[k + 1])),
             'max')) AS BIGINT) AS max_dim_shift_micro
    FROM ab
    """,
    doc="embedding drift monitor: split the corpus into even/odd vec_id "
    "halves (stand-ins for two snapshots), compare their mean embedding "
    "vectors — cosine of means plus the worst per-dimension shift. The "
    "cheap 'did my embedding space move?' gate run before re-using a "
    "trained ANN index on refreshed data. Exact: per-half per-dim sums "
    "are BIGINT micro-units folded in ONE grouped aggregate (128 output "
    "rows at any corpus size), means are single divisions, and the "
    "cosine is the zip_with/aggregate fold == list_dot_product identity "
    "(knn precedent) — so both engines emit identical doubles before the "
    "rounding. One corpus pass; everything after is dimension-bounded.",
)
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ints = t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).alias("grp"),
        F.expr("transform(embedding, e -> CAST(round(e * 1e6) AS BIGINT))").alias(
            "xs"
        ),
    )
    cnt = ints.groupBy("grp").agg(F.count("*").alias("n"))
    sums = (
        ints.select("grp", F.posexplode("xs").alias("i", "xi"))
        .groupBy("grp", "i")
        .agg(F.sum("xi").alias("s"))
    )
    means = (
        sums.join(F.broadcast(cnt), "grp")
        .groupBy("grp", "n")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i,"
                " CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mv))), x -> x.mv)"
            ).alias("m")
        )
    )
    a = means.where(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("m").alias("ma")
    )
    b = means.where(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("m").alias("mb")
    )
    dot = (
        "aggregate(zip_with({x}, {y}, (p, q) -> p * q), CAST(0 AS DOUBLE),"
        " (acc, e) -> acc + e)"
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round(
            F.expr(
                f"{dot.format(x='ma', y='mb')} / (sqrt({dot.format(x='ma', y='ma')})"
                f" * sqrt({dot.format(x='mb', y='mb')}))"
            ),
            6,
        ).alias("cosine_means"),
        F.expr(
            "CAST(round(1e6 * array_max(zip_with(ma, mb,"
            " (p, q) -> abs(p - q)))) AS BIGINT)"
        ).alias("max_dim_shift_micro"),
    )


@register(
    "rocchio_feedback_rerank",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vi
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, vi AS qvi
          FROM e WHERE vec_id < 3),
    s1 AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
             e.vi AS nvi,
             round(list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    top AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, nid) AS rk
        FROM s1
      ) WHERE rk <= 10
    ),
    counts AS (
      SELECT query_id,
             CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END) AS BIGINT) AS nn
      FROM top GROUP BY query_id
    ),
    dims AS (
      SELECT query_id, i,
             CAST(sum(CASE WHEN nlabel = qlabel THEN nvi[i] ELSE 0 END) AS BIGINT) AS sp,
             CAST(sum(CASE WHEN nlabel <> qlabel THEN nvi[i] ELSE 0 END) AS BIGINT) AS sn
      FROM top CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY query_id, i
    ),
    vecs AS (SELECT query_id, list(sp ORDER BY i) AS spv,
                    list(sn ORDER BY i) AS snv
             FROM dims GROUP BY query_id),
    qp AS (
      SELECT q.query_id, c.np, c.nn,
             list_transform(range(1, 65), i ->
               20 * greatest(c.np, 1) * greatest(c.nn, 1) * q.qvi[i]
               + 15 * greatest(c.nn, 1) * v.spv[i]
               - 3 * greatest(c.np, 1) * v.snv[i]) AS qpv
      FROM q JOIN counts c USING (query_id) JOIN vecs v USING (query_id)
    ),
    s2 AS (
      SELECT qp.query_id, qp.np AS n_pos, qp.nn AS n_neg,
             e.vec_id AS neighbor_id,
             round(list_dot_product(qp.qpv::DOUBLE[], e.v)
                   / (sqrt(list_dot_product(qp.qpv::DOUBLE[], qp.qpv::DOUBLE[]))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
      FROM qp JOIN e ON e.vec_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, cosine, rank::BIGINT AS rank, n_pos, n_neg
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM s2)
    WHERE rank <= 10
    """,
    doc="Rocchio relevance-feedback re-ranking (Rocchio 1971, the classic "
    "IR feedback loop): 3 probe vectors retrieve exact cosine top-10; "
    "neighbors sharing the probe's label are positive feedback, the rest "
    "negative; the modified query alpha*q + beta*mean(pos) - gamma*mean(neg) "
    "(alpha=1, beta=0.75, gamma=0.15) re-ranks the corpus. Exactness trick: "
    "embeddings freeze to integer micro-units and the modified query is "
    "scaled through by 20*|P|*|N| — q'' = 20*P*N*q + 15*N*sum(pos) - "
    "3*P*sum(neg), pure BIGINT arithmetic (cosine is scale-invariant, so "
    "the re-ranking is IDENTICAL to the float formula); empty feedback "
    "sets degrade via greatest(|S|, 1) with a zero sum. Both cosine "
    "passes rank on the 6-dp-rounded score (engine-stable); dot products "
    "accumulate left-to-right identically in both engines. Scale: the "
    "probe side stays broadcast-tiny through both passes (same shape as "
    "knn_cosine_topk); per-dim feedback sums aggregate <= k*dim rows per "
    "probe; at production scale the second pass composes with the ANN "
    "index instead of brute force (documented pivot, same semantics).",
)
def rocchio_feedback_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        ).alias("vi"),
    )
    queries = emb.where(F.col("vec_id") < 3)
    top = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    qmeta = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vi").alias("qvi"),
    )
    nmeta = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        F.col("vi").alias("nvi"),
    )
    fb = top.join(nmeta, "neighbor_id").join(qmeta, "query_id")
    counts = fb.groupBy("query_id").agg(
        F.sum((F.col("nlabel") == F.col("qlabel")).cast("int"))
        .cast("bigint")
        .alias("np"),
        F.sum((F.col("nlabel") != F.col("qlabel")).cast("int"))
        .cast("bigint")
        .alias("nn"),
    )
    dims = fb.select(
        "query_id", "qlabel", "nlabel", F.posexplode("nvi").alias("pos", "val")
    )
    sums = dims.groupBy("query_id", "pos").agg(
        F.sum(F.when(F.col("nlabel") == F.col("qlabel"), F.col("val")).otherwise(0))
        .cast("bigint")
        .alias("sp"),
        F.sum(F.when(F.col("nlabel") != F.col("qlabel"), F.col("val")).otherwise(0))
        .cast("bigint")
        .alias("sn"),
    )
    vecs = sums.groupBy("query_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, sp))), s -> s.sp)"
        ).alias("spv"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, sn))), s -> s.sn)"
        ).alias("snv"),
    )
    qp = (
        qmeta.join(counts, "query_id")
        .join(vecs, "query_id")
        .select(
            F.col("query_id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> "
                "20 * greatest(np, 1) * greatest(nn, 1) * element_at(qvi, i) "
                "+ 15 * greatest(nn, 1) * element_at(spv, i) "
                "- 3 * greatest(np, 1) * element_at(snv, i))"
            ).alias("embedding"),
            "np",
            "nn",
        )
    )
    rer = sim.cosine_topk(emb, qp, id_col="vec_id", vec_col="embedding", k=10)
    return rer.join(
        qp.select(F.col("vec_id").alias("query_id"), "np", "nn"), "query_id"
    ).select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.col("rank").cast("bigint").alias("rank"),
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
    )


# Frozen DCG position weights: w_i = round(1e9 / log2(i + 1)) for ranks
# 1..10, plus their prefix sums (IDCG lookup). Emitting the weights as
# INTEGER literals on both engines turns DCG into a pure BIGINT sum — no
# transcendental call and no float summation order anywhere in the metric.
import math as _math

_DCG_W = [round(1e9 / _math.log2(i + 1)) for i in range(1, 11)]
_DCG_P = [sum(_DCG_W[: j + 1]) for j in range(10)]
_W_SQL = ", ".join(str(w) for w in _DCG_W)
_P_SQL = ", ".join(str(p) for p in _DCG_P)

# shared oracle prefix: exact cosine top-10 for 5 probes with binary
# label relevance (neighbor label == probe label), the same retrieval as
# knn_cosine_topk
_RANKED_REL_SQL = """
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
          FROM e WHERE vec_id < 5),
    s1 AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
             round(list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    top AS (
      SELECT query_id, qlabel, nlabel,
             CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END AS rel, rk
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, nid) AS rk
            FROM s1)
      WHERE rk <= 10
    )
"""


@register(
    "ndcg_retrieval_eval",
    oracle=f"""
    WITH {_RANKED_REL_SQL},
    dcg AS (
      SELECT query_id, any_value(qlabel) AS qlabel,
             CAST(sum(rel * ([{_W_SQL}])[rk]) AS BIGINT) AS dcg_nano,
             CAST(sum(rel) AS BIGINT) AS n_rel_topk
      FROM top GROUP BY query_id
    ),
    corpus_rel AS (
      SELECT q.query_id,
             CAST(count(*) AS BIGINT) AS n_rel_corpus
      FROM (SELECT vec_id AS query_id, label AS qlabel FROM embeddings
            WHERE vec_id < 5) q
      JOIN embeddings e ON e.label = q.qlabel AND e.vec_id <> q.query_id
      GROUP BY q.query_id
    )
    SELECT d.query_id, d.n_rel_topk,
           coalesce(c.n_rel_corpus, 0)::BIGINT AS n_rel_corpus,
           d.dcg_nano,
           CASE WHEN coalesce(c.n_rel_corpus, 0) > 0
                THEN ([{_P_SQL}])[least(c.n_rel_corpus, 10)]
                ELSE 0 END::BIGINT AS idcg_nano,
           CASE WHEN coalesce(c.n_rel_corpus, 0) > 0
                THEN CAST((1000000 * d.dcg_nano)
                          // ([{_P_SQL}])[least(c.n_rel_corpus, 10)] AS BIGINT)
           END AS ndcg_ppm
    FROM dcg d LEFT JOIN corpus_rel c USING (query_id)
    """,
    doc="nDCG@10 per probe query (Järvelin & Kekäläinen 2002): exact "
    "cosine top-10 retrieval with binary label relevance; DCG uses "
    "nano-frozen 1/log2(i+1) position weights emitted as INTEGER literals "
    "on both engines, so the whole metric is exact BIGINT arithmetic — "
    "no transcendental and no float sum. IDCG is the textbook ideal: the "
    "weight prefix sum at min(|corpus relevant|, 10), looked up from a "
    "literal prefix-sum array. ndcg_ppm = (1e6 * DCG) div IDCG, one "
    "integer division. The standard graded-ranking quality score beside "
    "average_precision_eval / cumulative_gains_deciles. Scale: retrieval "
    "is the broadcast-probe kNN shape; relevance totals are one "
    "label-keyed aggregate.",
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    top = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    qmeta = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    nmeta = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    w_arr = ", ".join(str(w) for w in _DCG_W)
    p_arr = ", ".join(str(p) for p in _DCG_P)
    rel = (
        top.join(nmeta, "neighbor_id")
        .join(qmeta, "query_id")
        .select(
            "query_id",
            "qlabel",
            (F.col("nlabel") == F.col("qlabel")).cast("int").alias("rel"),
            F.col("rank").alias("rk"),
        )
    )
    dcg = rel.groupBy("query_id").agg(
        F.expr(f"CAST(sum(rel * element_at(array({w_arr}), CAST(rk AS INT))) AS BIGINT)").alias(
            "dcg_nano"
        ),
        F.sum("rel").cast("bigint").alias("n_rel_topk"),
    )
    corpus_rel = (
        qmeta.join(
            emb.select("vec_id", F.col("label").alias("nlabel")),
            (F.col("nlabel") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_rel_corpus"))
    )
    return (
        dcg.join(corpus_rel, "query_id", "left")
        .select(
            "query_id",
            "n_rel_topk",
            F.coalesce("n_rel_corpus", F.lit(0)).cast("bigint").alias("n_rel_corpus"),
            "dcg_nano",
            F.expr(
                f"CASE WHEN coalesce(n_rel_corpus, 0) > 0 THEN "
                f"element_at(array({p_arr}), CAST(least(n_rel_corpus, 10) AS INT)) "
                f"ELSE CAST(0 AS BIGINT) END"
            )
            .cast("bigint")
            .alias("idcg_nano"),
            F.expr(
                f"CASE WHEN coalesce(n_rel_corpus, 0) > 0 THEN "
                f"CAST((1000000 * dcg_nano) div "
                f"element_at(array({p_arr}), CAST(least(n_rel_corpus, 10) AS INT)) AS BIGINT) END"
            ).alias("ndcg_ppm"),
        )
    )


@register(
    "mrr_retrieval_eval",
    oracle=f"""
    WITH {_RANKED_REL_SQL},
    first_rel AS (
      SELECT query_id, min(CASE WHEN rel = 1 THEN rk END) AS first_rank
      FROM top GROUP BY query_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_relevant,
           CAST(sum(coalesce(1000000 // first_rank, 0)) // count(*)
                AS BIGINT) AS mrr_ppm
    FROM first_rel
    """,
    doc="MRR@10 over the 5 probe queries: reciprocal rank of the first "
    "label-relevant neighbor in the exact cosine top-10, zero when none "
    "is relevant, averaged in exact integer ppm (1e6 div rank per query, "
    "sum div n — deterministic integer semantics documented in lieu of "
    "float reciprocals). The first-hit ranking metric beside nDCG's "
    "graded view. Same broadcast-probe retrieval shape.",
)
def mrr_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    top = sim.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    qmeta = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    nmeta = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    first_rel = (
        top.join(nmeta, "neighbor_id")
        .join(qmeta, "query_id")
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("nlabel") == F.col("qlabel"), F.col("rank"))
            ).alias("first_rank")
        )
    )
    return first_rel.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(F.col("first_rank").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_with_relevant"),
        F.expr(
            "CAST(sum(coalesce(1000000 div first_rank, 0)) div count(*) AS BIGINT)"
        ).alias("mrr_ppm"),
    )


@register(
    "embedding_similarity_reliability",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 200),
    pairs AS (
      SELECT round(list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine,
             CASE WHEN x.label = y.label THEN 1 ELSE 0 END AS same
      FROM e x JOIN e y ON x.vec_id < y.vec_id
    )
    SELECT CAST(least(9, floor(cosine * 10)) AS BIGINT) AS cos_decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(same) AS BIGINT) AS n_same_label,
           CAST((1000000 * sum(same)) // count(*) AS BIGINT) AS same_rate_ppm
    FROM pairs
    GROUP BY least(9, floor(cosine * 10))
    """,
    doc="similarity->same-label reliability curve of the embedding space: "
    "every pair in a bounded slice scored by exact cosine, bucketed into "
    "cosine deciles (top decile inclusive of 1.0 via least(9, .)), and "
    "the empirical P(same label | decile) reported in exact integer ppm. "
    "The metric-learning calibration view beside expected_calibration_"
    "error's classifier view: a healthy embedding shows the rate rising "
    "monotonically with cosine; a flat curve means distances carry no "
    "label signal and every downstream ANN/dedup threshold is arbitrary. "
    "Scale: the all-pairs slice is the unbiased-census form; the shipped "
    "corpus-scale sibling is embedding_similarity_reliability_lsh (same "
    "decile aggregates over an LSH bucket equi-join on the whole table), "
    "identical semantics per pair.",
)
def embedding_similarity_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    e = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    x = e.select(
        F.col("vec_id").alias("id1"), F.col("label").alias("l1"), F.col("v").alias("v1")
    )
    y = e.select(
        F.col("vec_id").alias("id2"), F.col("label").alias("l2"), F.col("v").alias("v2")
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (p, q) -> p * q), CAST(0 AS DOUBLE),"
        " (acc, el) -> acc + el)"
    )
    pairs = x.join(y, F.col("id1") < F.col("id2")).select(
        F.round(
            F.expr(
                f"{dot.format(a='v1', b='v2')} / (sqrt({dot.format(a='v1', b='v1')})"
                f" * sqrt({dot.format(a='v2', b='v2')}))"
            ),
            6,
        ).alias("cosine"),
        (F.col("l1") == F.col("l2")).cast("int").alias("same"),
    )
    return (
        pairs.groupBy(
            F.expr("CAST(least(9, floor(cosine * 10)) AS BIGINT)").alias(
                "cos_decile"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("same").cast("bigint").alias("n_same_label"),
        )
        .select(
            "cos_decile",
            "n_pairs",
            "n_same_label",
            F.expr("CAST((1000000 * n_same_label) div n_pairs AS BIGINT)").alias(
                "same_rate_ppm"
            ),
        )
    )


def _reliability_lsh_oracle(n_planes: int = 4, seed: int = 7, dim: int = 64) -> str:
    """DuckDB twin of the LSH-bucketed reliability curve: the seeded
    hyperplanes are regenerated with the same numpy seed and inlined as
    repr-round-tripped double literals (the ``_ann_lsh_oracle`` recipe), so
    both engines assign bit-identical buckets and score the identical
    candidate-pair set."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((n_planes, dim))
    terms = []
    for p, row in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in row)
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket = "(" + " + ".join(terms) + ")::BIGINT"
    return f"""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, label, v, {bucket} AS bucket FROM emb),
    pairs AS (
      SELECT round(list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine,
             CASE WHEN x.label = y.label THEN 1 ELSE 0 END AS same
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT CAST(least(9, floor(cosine * 10)) AS BIGINT) AS cos_decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(same) AS BIGINT) AS n_same_label,
           CAST((1000000 * sum(same)) // count(*) AS BIGINT) AS same_rate_ppm
    FROM pairs
    GROUP BY least(9, floor(cosine * 10))
    """


@register(
    "embedding_similarity_reliability_lsh",
    oracle=_reliability_lsh_oracle(),
    doc="the CORPUS-SCALE sibling of embedding_similarity_reliability: the "
    "same similarity->same-label decile curve, but over pairs generated "
    "by a seeded random-hyperplane LSH bucket EQUI-JOIN on the WHOLE "
    "embedding table instead of all-pairs on a bounded slice. 2^4 "
    "buckets bound the per-bucket join fan-out, so pair volume is "
    "~n^2/16 per bucket rather than n^2 global — the shape that survives "
    "100x: more planes for bigger corpora via operators/sizing.py::"
    "planes_for_corpus (random_hyperplane_buckets auto-sizes with "
    "n_planes=None; this registry entry PINS the value the sizing rule "
    "yields at the driver fixture — 500 vectors -> 4 planes, asserted in "
    "tests/test_sizing.py — because the static oracle inlines the "
    "matching seeded plane set). The "
    "bucketed curve is biased TOWARD high-cosine pairs by construction "
    "(that is the point: those are the pairs ANN/dedup thresholds act "
    "on); the bounded-slice sibling remains the unbiased census. FULLY "
    "oracle-checked: seeded planes inlined as literals on both engines, "
    "so bucket assignment, candidate set, cosine, and deciles replay "
    "bit-identically",
)
def embedding_similarity_reliability_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    # 4 = sizing.planes_for_corpus(500) at the driver fixture — pinned (not
    # auto-sized) because the static oracle inlines the 4 seeded planes;
    # tests/test_sizing.py asserts the pin and the rule agree
    b = sim.random_hyperplane_buckets(emb, "vec_id", "embedding", n_planes=4, seed=7)
    e = b.select(
        "vec_id",
        "label",
        "bucket",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    x = e.select(
        "bucket",
        F.col("vec_id").alias("id1"),
        F.col("label").alias("l1"),
        F.col("v").alias("v1"),
    )
    y = e.select(
        "bucket",
        F.col("vec_id").alias("id2"),
        F.col("label").alias("l2"),
        F.col("v").alias("v2"),
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (p, q) -> p * q), CAST(0 AS DOUBLE),"
        " (acc, el) -> acc + el)"
    )
    pairs = (
        x.join(y, "bucket")
        .where(F.col("id1") < F.col("id2"))
        .select(
            F.round(
                F.expr(
                    f"{dot.format(a='v1', b='v2')} / (sqrt({dot.format(a='v1', b='v1')})"
                    f" * sqrt({dot.format(a='v2', b='v2')}))"
                ),
                6,
            ).alias("cosine"),
            (F.col("l1") == F.col("l2")).cast("int").alias("same"),
        )
    )
    return (
        pairs.groupBy(
            F.expr("CAST(least(9, floor(cosine * 10)) AS BIGINT)").alias("cos_decile")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("same").cast("bigint").alias("n_same_label"),
        )
        .select(
            "cos_decile",
            "n_pairs",
            "n_same_label",
            F.expr("CAST((1000000 * n_same_label) div n_pairs AS BIGINT)").alias(
                "same_rate_ppm"
            ),
        )
    )
