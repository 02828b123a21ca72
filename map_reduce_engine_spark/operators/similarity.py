"""Similarity search over embedding columns (``array<float>``).

North-star operators (SURVEY.md §2 Part C): brute-force cosine top-k as the
correctness baseline, and a random-hyperplane (SimHash-for-vectors) LSH
bucketed variant as the 100 TB scale path. Vector math uses ``zip_with`` /
``aggregate`` higher-order functions — evaluated JVM-side per row, no Python,
no UDF — in double precision (parity with the DuckDB oracle's double sums).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lit_double_array(values) -> Column:
    """Literal array<double> built as ONE parsed SQL expression.

    The F.array(*[F.lit(v) ...]) form costs a py4j round-trip per element —
    thousands of driver-side milliseconds for plane/LUT matrices (measured
    ~50x slower than parsing). CAST(repr(v) AS DOUBLE) round-trips the
    exact double (shortest-repr parse), so results are bit-identical.
    """
    return F.expr("array(" + ",".join(f"CAST({float(v)!r} AS DOUBLE)" for v in values) + ")")


def _vecd(col: Column) -> Column:
    """array<float> → array<double> (accumulate in double like the oracle)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, l2_norm(_vecd(F.col(vec_col))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, cosine).

    Brute force with the small query set broadcast — each corpus partition
    scores all queries locally (no shuffle of the corpus), then a per-query
    top-k. Self-matches excluded. Ranking key is (rounded cosine desc,
    neighbor id) so results are deterministic under any partitioning and
    any summation order.
    """
    q = queries.select(
        F.col(id_col).alias(query_id),
        _vecd(F.col(vec_col)).alias("qv"),
    ).withColumn("qnorm", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _vecd(F.col(vec_col)).alias("cv"),
    ).withColumn("cnorm", l2_norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col(query_id))
        .select(
            query_id,
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "cosine", "rank")
    )


def random_hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int | None = 12,
    seed: int = 42,
    dim: int = 64,
    out: str = "bucket",
    n_rows: int | None = None,
) -> DataFrame:
    """Assign each vector an LSH bucket: sign pattern against random planes.

    Planes are a fixed seeded Gaussian sample embedded as literal arrays —
    identical on every executor, no broadcast variable, no Python at eval
    time. Vectors with the same bucket are likely cosine-near neighbors;
    bucket count 2^n_planes bounds per-bucket join fan-out at scale.

    ``n_planes=None`` auto-sizes from the corpus via
    ``operators/sizing.py::planes_for_corpus`` (more planes for bigger
    corpora — expected per-bucket population stays bounded). The sizing
    probe is ``df.count()`` — a FULL corpus action per call — unless the
    caller passes the row count it already knows as ``n_rows`` (a pipeline
    that just counted or checkpointed the frame should). Pass an explicit
    ``n_planes`` where a STATIC oracle inlines the matching plane set
    (the registry's seeded-literal queries); ``n_rows`` is ignored then.
    """
    if n_planes is None:
        from map_reduce_engine_spark.operators.sizing import planes_for_corpus

        n_planes = planes_for_corpus(df.count() if n_rows is None else n_rows)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    plane_cols = [_lit_double_array(row) for row in planes]
    vec = _vecd(F.col(vec_col))
    bits = [
        F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0)) for p in plane_cols
    ]
    bucket: Column = F.lit(0).cast("bigint")
    for i, bit in enumerate(bits):
        bucket = bucket.bitwiseOR(F.shiftleft(bit.cast("bigint"), i))
    return df.withColumn(out, bucket)


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int = 16,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """(id, proj: array<double>) — Johnson-Lindenstrauss random projection.

    Projects ``dim``-dimensional vectors onto ``out_dim`` seeded Gaussian
    directions embedded as literal arrays (the ``random_hyperplane_buckets``
    recipe, kept un-normalized: JL's 1/sqrt(out_dim) factor cancels in any
    cosine/relative-distance use, and omitting it keeps the arithmetic a
    plain dot product both engines replay bit-identically). A narrow
    per-row map — no shuffle, no Python, no state — so at 100 TB it is a
    pure scan-speed pass that cuts every downstream distance computation
    and shuffle byte count by dim/out_dim (the JL lemma bounds the pairwise
    distance distortion at O(sqrt(log n / out_dim))). The dimensionality
    companion to ``int8`` quantization's per-component compression.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((out_dim, dim))
    vec = _vecd(F.col(vec_col))
    proj = F.array(*[dot(vec, _lit_double_array(row)) for row in planes])
    return df.select(F.col(id_col).alias("id"), proj.alias("proj"))


def jl_plane_literals(out_dim: int = 16, seed: int = 42, dim: int = 64) -> list[list[float]]:
    """The exact plane matrix ``random_projection`` embeds — exposed so a
    SQL twin can inline the identical literals."""
    rng = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rng.standard_normal((out_dim, dim))]


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
    multi_probe: bool = True,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to the query's LSH buckets.

    The scale path for 100 TB corpora — classic multi-table LSH:
    ``n_tables`` independent sign-pattern hash tables (different seeds), a
    candidate passes if it collides with the query in ANY table. Per-table
    collision probability p compounds to 1-(1-p)^L recall. Both sides are
    bucketed in one pass each (the corpus carries L (table, bucket) entries),
    then an equi-join on (table, bucket) — shuffle co-location, never a cross
    join. ``multi_probe`` additionally probes every bucket at Hamming
    distance 1 in each table — a (1+n_planes)x fan-out on the tiny query
    side only, recovering neighbors that fall just across one hyperplane.
    Exact cosine within candidates, per-query top-k. Use ``cosine_topk`` for
    ground truth / recall@k evaluation.
    """
    def with_table_buckets(df: DataFrame) -> DataFrame:
        out = df
        for t in range(n_tables):
            out = random_hyperplane_buckets(
                out, id_col, vec_col, n_planes, seed + t, dim, out=f"_b{t}"
            )
        entries = F.array(*[
            F.struct(F.lit(t).alias("table"), F.col(f"_b{t}").alias("bucket"))
            for t in range(n_tables)
        ])
        return out.withColumn("_tb", F.explode(entries)).select(
            *df.columns, F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket")
        )

    cb = with_table_buckets(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _vecd(F.col(vec_col)).alias("cv"),
        "table",
        "bucket",
    ).withColumn("cnorm", l2_norm(F.col("cv")))
    qb = with_table_buckets(queries).select(
        F.col(id_col).alias("query_id"),
        _vecd(F.col(vec_col)).alias("qv"),
        "table",
        "bucket",
    ).withColumn("qnorm", l2_norm(F.col("qv")))
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("bigint"), i)) for i in range(n_planes)],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    scored = (
        cb.join(qb, ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _ivf_cell_fn(centers: list[list[float]]):
    """(C matrix, cells(V, n) -> (top-n cell ids, norms)) from a trained
    centroid list — the shared assignment math of the build and probe
    sides. On the unit sphere argmin ||u-c||^2 == argmin (||c||^2 - 2 u·c).
    """
    C = np.array(centers, dtype=np.float64)  # (n_cells, dim)
    Csq = (C**2).sum(axis=1)

    def _cells(V: "np.ndarray", n: int) -> "np.ndarray":
        norms = np.sqrt((V**2).sum(axis=1))
        U = V / np.where(norms > 0, norms, 1.0)[:, None]
        d2 = Csq[None, :] - 2.0 * (U @ C.T)  # (n_rows, n_cells)
        return np.argsort(d2, kind="stable", axis=1)[:, :n], norms

    return C, _cells


def _check_vec_dims(pdf, dim: int, what: str) -> None:
    """Loud dimensionality guard for the Arrow assignment passes: a batch
    whose vectors don't match the trained centroids' dimensionality must
    fail with a diagnosis, not a reshape traceback deep in an executor —
    rolling a wrong-dim batch into a stored index is the
    mismatched-banding failure family for the ANN tier. O(batch) length
    scan, trivial beside the matmul it guards."""
    dims = {len(v) for v in pdf["v"]}
    if dims - {dim}:
        raise ValueError(
            f"{what} expects dim-{dim} vectors (the trained centroids'), "
            f"got dims {sorted(dims)} — a different embedding model/column "
            "cannot probe or roll into this index"
        )


def ivf_train_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int | None = 32,
    seed: int = 42,
    max_iter: int = 5,
) -> tuple[list[list[float]], DataFrame]:
    """(centers, (neighbor_id, cv, cnorm, cell) frame) — the trained IVF
    index: seeded Lloyd's centroids plus every corpus vector's cell
    assignment. The expensive build half of :func:`ivf_topk`, split out so
    a deployment trains/assigns ONCE and persists the result
    (:func:`write_ivf_index` — the ANN sibling of the tile and band
    indexes); queries then probe the stored table. Deterministic for a
    fixed (corpus, n_cells, seed): the training sample is
    content-deterministic (``_bounded_train_sample``), so rebuilding and
    reading back yield identical indexes."""
    unit = lambda v: F.transform(v, lambda x: x / F.nullif(l2_norm(v), F.lit(0.0)))  # noqa: E731

    if n_cells is None:
        # grow-with-corpus default (operators/sizing.py): expected cell
        # population stays bounded as rows grow, so the probe-join fan-out
        # is O(n), not O(n²/cells). The count() is a parquet metadata
        # aggregate on file-backed corpora, not a data scan.
        from map_reduce_engine_spark.operators.sizing import cells_for_corpus

        n_cells = cells_for_corpus(corpus.count())
    target = max(50 * n_cells, 1000)
    X = _bounded_train_sample(corpus, id_col, unit(_vecd(F.col(vec_col))), target)
    centers = _lloyd_kmeans(X, n_cells, seed, max_iter)

    # Cell assignment through one Arrow-batched pass (same rationale as
    # pq_topk: the JVM-literal alternative builds n_cells dot-product
    # expressions through py4j, whose driver-side construction cost dwarfs
    # the arithmetic).
    return centers, ivf_assign(centers, corpus, id_col, vec_col)


def ivf_assign(
    centers: list[list[float]], df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(neighbor_id, cv, cnorm, cell) — assign ``df``'s vectors to their
    nearest stored centroid: the append half of the IVF index's
    mergeable-state story, shared by the initial build
    (:func:`ivf_train_assign`) and the daily roll-forward
    (:func:`ivf_roll_forward`). One Arrow-batched pass over ``df`` only —
    cost scales with the rows being assigned, never the stored index."""
    import pandas as pd
    from pyspark.sql import types as T

    C, _cells = _ivf_cell_fn(centers)

    cb_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cv", T.ArrayType(T.DoubleType())),
            T.StructField("cnorm", T.DoubleType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign_batch(batches):
        for pdf in batches:
            _check_vec_dims(pdf, C.shape[1], "ivf_assign: stored IVF index")
            V = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, C.shape[1])
            cells, norms = _cells(V, 1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["id"].values,
                    "cv": list(V),
                    "cnorm": norms,
                    "cell": cells[:, 0].astype("int32"),
                }
            )

    return df.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(assign_batch, schema=cb_schema)


def ivf_roll_forward(
    index: tuple[list[list[float]], DataFrame],
    batch: DataFrame,
    id_col: str,
    vec_col: str,
) -> tuple[list[list[float]], DataFrame]:
    """Absorb an appended batch into a stored IVF index WITHOUT retraining:
    only the batch's vectors are assigned (to the STORED centroids —
    :func:`ivf_assign`) and unioned into the assignment frame; the history
    is never re-read. The same mergeable-state contract as the tile and
    band indexes' distinct-of-union — rows already present in the stored
    assignment are left-anti'd out, so a re-run of the same day cannot
    duplicate entries. Persist the result with :func:`write_ivf_index`
    (same centroids) to produce tomorrow's index table.

    The centroids themselves go STALE as the corpus grows or drifts —
    check :func:`ivf_staleness` after rolling; when it flags
    ``retrain_due`` the next build should be a fresh
    :func:`ivf_train_assign` over the full corpus.

    The re-run guard is ``dedup.roll_forward_guard``'s broadcast-semi
    overlap probe, not a naive anti-join: LeftAnti can only broadcast its
    right side, so anti-joining the batch against the stored assignment
    would hash-shuffle the whole corpus-sized table every day — the guard
    scans it once with an in-memory probe instead."""
    from map_reduce_engine_spark.operators.dedup import roll_forward_guard

    centers, cb = index
    fresh = roll_forward_guard(
        ivf_assign(centers, batch, id_col, vec_col), cb, ["neighbor_id"]
    )
    return centers, cb.unionByName(fresh)


def ivf_staleness(
    index: tuple[list[list[float]], DataFrame],
    rows_per_cell: int = 4096,
    skew_factor: int = 4,
) -> dict:
    """Staleness diagnostic for a stored IVF index: is a retrain due?

    Two triggers, both from the property-tested sizing rule
    (``operators/sizing.py::cells_for_corpus``):

    - **capacity**: the corpus has grown past what the trained cell count
      keeps bounded — ``cells_for_corpus(n_vectors, rows_per_cell) >
      n_cells`` means expected per-cell population exceeds the bound the
      index was sized for;
    - **skew**: distribution drift piled vectors into few cells —
      ``max_cell_pop > skew_factor * rows_per_cell`` degrades the probe
      join's fan-out even when the average is fine.

    Cost: one |cells|-sized aggregate fed by a one-column (``cell``) scan
    of the assignment table — column pruning keeps the vectors out of the
    read, so the bytes moved are a single int column, cheap at any scale
    (but a real scan, not parquet metadata). Returns a dict with the
    counts and both trigger verdicts — job gates lift it into their
    sign-off row (``ann-serve``)."""
    from map_reduce_engine_spark.operators.sizing import cells_for_corpus

    centers, cb = index
    n_cells = len(centers)
    pops = cb.groupBy("cell").agg(F.count("*").alias("pop")).agg(
        F.coalesce(F.sum("pop"), F.lit(0)).alias("n_vectors"),
        F.coalesce(F.max("pop"), F.lit(0)).alias("max_cell_pop"),
    ).collect()[0]
    n_vectors, max_pop = int(pops.n_vectors), int(pops.max_cell_pop)
    cells_needed = cells_for_corpus(n_vectors, rows_per_cell=rows_per_cell)
    capacity_exceeded = cells_needed > n_cells
    skewed = max_pop > skew_factor * rows_per_cell
    return {
        "n_cells": n_cells,
        "n_vectors": n_vectors,
        "max_cell_pop": max_pop,
        "cells_needed": cells_needed,
        "rows_per_cell": rows_per_cell,
        "capacity_exceeded": capacity_exceeded,
        "skewed": skewed,
        "retrain_due": capacity_exceeded or skewed,
    }


def write_ivf_index(
    centers: list[list[float]],
    index_df: DataFrame,
    table: str,
    path: str | None = None,
    n_buckets: int = 32,
) -> None:
    """Persist a trained IVF index: the cell-assignment frame as a parquet
    table BUCKETED on ``cell`` (the probe join's key) and the centroids as
    the tiny companion table ``{table}_centroids`` (one row per cell —
    query assignment needs them back). Catalog-addressed for the same
    reason as the tile/band indexes (Spark bucketing lives in the
    catalog).

    When ``path`` is given, the centroid files live at
    ``{path}/_centroids`` — NESTED under the index directory, so
    relocating or deleting the index moves/removes both halves together
    (they are one index). The underscore prefix keeps the subdirectory
    invisible to the assignment table's own file listing (Hadoop's
    default path filter hides ``_``/``.``-prefixed paths — the
    ``_SUCCESS``-marker convention), so the nesting never pollutes the
    cell scan."""
    spark = index_df.sparkSession
    writer = (
        index_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell INT, center ARRAY<DOUBLE>",
    )
    cwriter = cent.write.mode("overwrite").format("parquet")
    if path is not None:
        cwriter = cwriter.option("path", f"{path}/_centroids")
    cwriter.saveAsTable(f"{table}_centroids")


def read_ivf_index(spark, table: str) -> tuple[list[list[float]], DataFrame]:
    """(centers, cell-assignment frame) read back from
    :func:`write_ivf_index` — the assignment via ``spark.table`` (bucket
    spec preserved), the centroids via one |cells|-sized collect."""
    centers = [
        r.center
        for r in spark.table(f"{table}_centroids").orderBy("cell").collect()
    ]
    return centers, spark.table(table)


def ivf_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int | None = 32,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
    index: tuple[list[list[float]], DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning — the
    clustered alternative to ``ann_topk``'s hash-based LSH.

    Train: seeded Lloyd's on a BOUNDED unit-normalized sample, driver-side
    (cosine NN == euclidean NN on the unit sphere) — the FAISS recipe:
    centroid quality saturates at ~tens of points per centroid, the sample
    collect ships a few hundred KB at ANY corpus size, and a local numpy
    fit costs milliseconds where a distributed KMeans pays multi-second
    scheduling overhead per job. Serve: each corpus vector is assigned
    to its nearest centroid and each query probes its ``n_probe`` nearest
    cells — the candidate join is an equi-join on ``cell`` exactly like a
    production IVF index. Unlike data-independent LSH planes, centroids
    adapt to the corpus distribution — better recall/candidate-count on
    clustered embeddings.

    Pass ``index`` (a (centers, assignment-frame) pair from
    :func:`ivf_train_assign` / :func:`read_ivf_index`) to serve queries
    against the PERSISTED index — no retrain, no corpus re-assignment,
    ``corpus`` may be ``None``; without it the index is built inline (the
    self-contained registry form). The training knobs (``n_cells``,
    ``seed``, ``max_iter``) belong to the BUILD and take no effect when
    ``index`` is given — the stored index already fixes them; only ``k``
    and ``n_probe`` shape the probe.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if index is not None:
        centers, cb = index
    elif corpus is not None:
        centers, cb = ivf_train_assign(corpus, id_col, vec_col, n_cells, seed, max_iter)
    else:
        raise ValueError("ivf_topk needs either corpus or index")
    C, _cells = _ivf_cell_fn(centers)

    qb_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("qv", T.ArrayType(T.DoubleType())),
            T.StructField("qnorm", T.DoubleType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign_queries(batches):
        for pdf in batches:
            _check_vec_dims(pdf, C.shape[1], "ivf_topk: IVF index")
            V = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, C.shape[1])
            cells, norms = _cells(V, n_probe)
            n = len(V)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["id"].values, n_probe),
                    "qv": [v for v in V for _ in range(n_probe)],
                    "qnorm": np.repeat(norms, n_probe),
                    "cell": cells.reshape(-1).astype("int32"),
                }
            )

    qb = queries.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(assign_queries, schema=qb_schema)
    scored = (
        cb.join(qb, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine >= threshold).

    LSH-bucketed self-join — near-dups at cosine >= 0.95 collide in the same
    sign-pattern bucket with high probability, so the pair space stays
    near-linear. For exhaustive small-scale verification set n_planes=0
    (single bucket → exact all-pairs).
    """
    b = random_hyperplane_buckets(df, id_col, vec_col, n_planes, seed, dim) if n_planes > 0 else df.withColumn("bucket", F.lit(0))
    b = b.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v"), "bucket"
    ).withColumn("norm", l2_norm(F.col("v")))
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id1"),
            F.col("y.id").alias("id2"),
            F.round(dot(F.col("x.v"), F.col("y.v")) / (F.col("x.norm") * F.col("y.norm")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


# --------------------------------------------------------------------------
# Embedding quantization (int8) — the 100 TB storage/bandwidth lever
# --------------------------------------------------------------------------


def quantize_int8(df: DataFrame, vec_col: str, out: str = "qvec", scale_col: str = "qscale") -> DataFrame:
    """Symmetric per-vector int8 quantization: 4x smaller than float32.

    ``q_i = round(x_i / s) with s = max|x| / 127``; the scale rides along as
    one float per vector. At 100 TB the embedding column dominates storage
    and shuffle bandwidth — int8 quarters both, and candidate scoring on
    quantized vectors (``cosine_int8``) typically costs <1% recall@k.
    All JVM-side array transforms; no Python.
    """
    vec = _vecd(F.col(vec_col))
    absmax = F.aggregate(vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    # Clamp before the cast: absmax/(absmax/127) can land a hair above 127
    # in fp, and a tinyint cast would wrap it to -128.
    q = lambda x: F.greatest(  # noqa: E731
        F.lit(-127.0), F.least(F.lit(127.0), F.round(x / F.col(scale_col)))
    ).cast("tinyint")
    return df.withColumn(scale_col, scale).withColumn(out, F.transform(vec, q))


def cosine_int8(qvec_a: Column, scale_a: Column, qvec_b: Column, scale_b: Column) -> Column:
    """Cosine between two int8-quantized vectors (scales cancel in cosine,
    so this is exactly the cosine of the dequantized vectors)."""
    fa = F.transform(qvec_a, lambda x: x.cast("double"))
    fb = F.transform(qvec_b, lambda x: x.cast("double"))
    return dot(fa, fb) / (l2_norm(fa) * l2_norm(fb))


# --------------------------------------------------------------------------
# Product quantization (PQ) — the memory/bandwidth-bound ANN regime
# --------------------------------------------------------------------------


def _lloyd_kmeans(X: "np.ndarray", k: int, seed: int, max_iter: int) -> list[list[float]]:
    """Seeded Lloyd's iterations on a (bounded, already-sampled) numpy array.

    Deterministic: seeded distinct-point init, fixed iteration count. Shared
    by the IVF cell trainer and the PQ codebook trainer — the driver-side
    training half of the FAISS recipe (train small and local, serve
    distributed). Empty clusters keep their previous center.
    """
    rng = np.random.RandomState(seed)
    centers = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            pts = X[assign == c]
            if len(pts):
                centers[c] = pts.mean(axis=0)
    return [[float(x) for x in c] for c in centers]


def _bounded_train_sample(df: DataFrame, id_col: str, vec_expr, target: int) -> "np.ndarray":
    """Content-deterministic bounded training sample for driver-side KMeans.

    ``df.sample`` is per-partition Bernoulli and ``limit`` takes whichever
    partitions answer first, so once the corpus exceeds ``target`` the
    selected ROWS — not merely their order — change with physical layout,
    and so would the trained centroids and every decision derived from
    them. Sample by CONTENT instead: keep rows whose portable id hash
    falls below the fraction cutoff (the same row set under any
    partitioning), lexsort the collected vectors (toPandas order is
    partition-dependent), and cap at ``2 * target`` sorted rows. The
    collect stays a few hundred KB at any corpus size: the hash filter
    admits ~1.2*target rows in expectation with binomial concentration.
    """
    from map_reduce_engine_spark.operators.dedup import _MASK31, portable_base31

    n_rows = df.count()
    train = df
    if n_rows > target:
        frac = min(1.0, (1.2 * target) / n_rows)
        cut = int(frac * (_MASK31 + 1))
        train = df.where(portable_base31(F.col(id_col).cast("string")) < F.lit(cut))
    X = np.array(train.select(vec_expr.alias("v")).toPandas()["v"].tolist(), dtype=np.float64)
    if len(X) == 0:
        return X
    return X[np.lexsort(X.T[::-1])][: 2 * target]


def _train_pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    seed: int,
    max_iter: int,
) -> list[list[list[float]]]:
    """Per-subspace KMeans codebooks trained driver-side on a bounded
    seeded sample (the FAISS recipe: train small and local, serve
    distributed).

    The sample is BOUNDED (~60 points per code) regardless of corpus size —
    at 100 TB the collect ships a few hundred KB, same class as the IVF
    centroid/LSH-plane literals SCALE.md already sanctions — and ``m``
    independent Lloyd's runs on a few-thousand-row numpy array cost
    milliseconds, vs ``m`` sequential distributed KMeans jobs whose
    scheduling overhead dwarfs the arithmetic at ANY scale. Deterministic
    and layout-invariant: content-hash sample (``_bounded_train_sample``),
    seeded init, fixed iteration count.
    """
    target = max(50 * n_codes, 1000)
    X = _bounded_train_sample(corpus, id_col, _vecd(F.col(vec_col)), target)
    dim = X.shape[1]
    d = dim // m
    return [
        _lloyd_kmeans(X[:, j * d : (j + 1) * d], n_codes, seed + j, max_iter)
        for j in range(m)
    ]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """Approximate top-k cosine via product quantization with asymmetric
    distance (ADC) — the regime where the index must be SMALLER than the
    vectors: each corpus vector is stored as ``m`` one-byte codes (8 bytes
    for a 64-dim float32 vector: 32× compression), and queries score
    against codes through per-subspace lookup tables without ever touching
    the original floats.

    Train: ``m`` per-subspace KMeans codebooks (bounded seeded sample,
    driver-side Lloyd's — the FAISS recipe). Encode: ONE Arrow-batched
    ``mapInPandas`` pass assigns every subvector its nearest code as a
    vectorized numpy argmin over all ``m`` subspaces at once — this is the
    sanctioned vectorized-math Python boundary: the JVM-expression
    alternative is m*n_codes literal dot products per row, whose codegen
    compile time alone dwarfs the arithmetic. Serve: the (tiny) query side
    precomputes LUT[j][c] = <q_j, codebook_j[c]> as literal-expression
    arrays, broadcasts, and the corpus-side score is m element_at lookups +
    adds per (query, vector) — pure JVM, a sequential scan over m-byte
    codes, which at 100 TB is bandwidth-, not compute-, bound (the FAISS
    IndexPQ shape; compose with IVF cells exactly like ivf_topk for the
    IVFPQ shape). Estimated norms come from the codebook at encode time, so
    serving reads ONLY (id, codes, est_norm).
    """
    import pandas as pd
    from pyspark.sql import types as T

    books = _train_pq_codebooks(corpus, id_col, vec_col, m, n_codes, seed, max_iter)
    dim = len(books[0][0]) * m
    d = dim // m
    B = np.array(books, dtype=np.float64)  # (m, n_codes, d)
    Bsq = (B**2).sum(axis=2)  # (m, n_codes) — ||c||^2 per code

    enc_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("est_norm", T.DoubleType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            X = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, m, d)
            # ||x_j - c||^2 argmin via (c·c - 2 x_j·c); einsum over all
            # subspaces at once: (n, m, n_codes)
            dots = np.einsum("nmd,mcd->nmc", X, B)
            codes = (Bsq[None, :, :] - 2.0 * dots).argmin(axis=2)  # (n, m)
            est_norm = np.sqrt(np.take_along_axis(Bsq[None, :, :].repeat(len(X), 0), codes[:, :, None], axis=2).sum(axis=(1, 2)))
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["id"].values,
                    "codes": list(codes.astype("int32")),
                    "est_norm": est_norm,
                }
            )

    encoded = corpus.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(encode, schema=enc_schema)

    # Query-side LUTs through the same Arrow pass (the literal-expression
    # alternative is m*n_codes py4j-built dot expressions, whose DRIVER-side
    # construction alone costs seconds); the query side is tiny by contract.
    lut_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("qnorm", T.DoubleType()),
            T.StructField("luts", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )

    def make_luts(batches):
        for pdf in batches:
            Q = np.array(pdf["v"].tolist(), dtype=np.float64)
            qn = np.sqrt((Q**2).sum(axis=1))
            lut = np.einsum("nmd,mcd->nmc", Q.reshape(-1, m, d), B)  # (n, m, n_codes)
            yield pd.DataFrame(
                {
                    "query_id": pdf["id"].values,
                    "qnorm": qn,
                    "luts": [[list(row) for row in q_lut] for q_lut in lut],
                }
            )

    qb = queries.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(make_luts, schema=lut_schema)

    est_dot = sum(
        F.element_at(F.element_at("luts", j + 1), F.col("codes").getItem(j) + 1)
        for j in range(m)
    )
    scored = (
        encoded.crossJoin(F.broadcast(qb))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                est_dot / F.nullif(F.col("qnorm") * F.col("est_norm"), F.lit(0.0)), 6
            ).alias("cosine_est"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_est").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_est", "rank")
    )


# --------------------------------------------------------------------------
# Semantic deduplication (SemDeDup) — cluster-local near-dup pruning
# --------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int | None = 32,
    threshold: float = 0.95,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540).

    Cluster the embedding space (bounded seeded sample → driver-side Lloyd's,
    the same trainer ``ivf_topk`` uses), assign every vector to its nearest
    centroid in one Arrow-batched pass, then compare vectors ONLY within a
    cell: grown ``n_cells`` ∝ corpus size keeps per-cell population bounded,
    so the candidate pair space is Σ|cell|² ≈ O(n·cell_size) instead of the
    all-pairs O(n²) — the paper's scaling trick, and the same equi-join-on-
    ``cell`` shuffle shape as a production IVF index. A row is dropped when
    its cell contains a smaller-id row with cosine >= ``threshold``
    (deterministic min-id survivor, matching the exact-dedup convention).

    Returns one row per input id: ``(id_col, cell, is_kept, keeper_id)``
    with ``keeper_id`` the smallest qualifying same-cell neighbor (NULL for
    kept rows). Reference parity: the reference engine has no embedding
    operators at all (SURVEY §2 Part C north-star extension).
    """
    import pandas as pd
    from pyspark.sql import types as T

    # The vectorized per-cell pass gives zero-norm pairs cosine 0 where the
    # old SQL fold gave NULL, and NaN components never qualify (numpy
    # NaN >= t is False). Both are equivalent to the join form ONLY under a
    # positive threshold — enforce it rather than silently diverging
    # (ADVICE r11).
    if not threshold > 0:
        raise ValueError(
            f"semantic_dedup requires threshold > 0 (got {threshold}): the "
            "vectorized cosine pass treats zero-norm/NaN pairs as "
            "non-qualifying, which only matches the exact-join semantics "
            "for positive thresholds"
        )

    unit = lambda v: F.transform(v, lambda x: x / F.nullif(l2_norm(v), F.lit(0.0)))  # noqa: E731

    # Bounded-sample centroid training (rationale at ivf_topk): quality
    # saturates at ~tens of points per centroid; the collect is a few
    # hundred KB at ANY corpus size. _bounded_train_sample selects rows by
    # CONTENT (portable id-hash filter) and canonicalizes order, so the
    # trained centroids — and therefore the whole dedup decision — are
    # invariant under input repartitioning even above the sampling
    # threshold.
    if n_cells is None:
        # grow-with-corpus default: keeps Σ|cell|² ≈ O(n·rows_per_cell)
        # as the corpus scales (the SemDeDup scaling rule, executable)
        from map_reduce_engine_spark.operators.sizing import cells_for_corpus

        n_cells = cells_for_corpus(df.count())
    target = max(50 * n_cells, 1000)
    X = _bounded_train_sample(df, id_col, unit(_vecd(F.col(vec_col))), target)
    if len(X) == 0:  # empty partition-filter result, empty source — no throw
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cell int, is_kept boolean, keeper_id {id_type}"
        )
    centers = _lloyd_kmeans(X, min(n_cells, len(X)), seed, max_iter)

    C = np.array(centers, dtype=np.float64)
    Csq = (C**2).sum(axis=1)

    asg_schema = T.StructType(
        [
            # id passes through untouched — carry the input's type so
            # non-bigint ids (e.g. string doc ids) survive the Arrow hop
            # with the same schema the empty-input early return emits.
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("norm", T.DoubleType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches):
        # One vectorized pass per Arrow batch (same shape as ivf_topk's
        # corpus assigner): on the unit sphere argmin ||u-c||² ==
        # argmin (||c||² - 2 u·c).
        for pdf in batches:
            V = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, C.shape[1])
            norms = np.sqrt((V**2).sum(axis=1))
            U = V / np.where(norms > 0, norms, 1.0)[:, None]
            d2 = Csq[None, :] - 2.0 * (U @ C.T)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "v": list(V),
                    "norm": norms,
                    "cell": d2.argmin(axis=1).astype("int32"),
                }
            )

    cb = (
        df.select(F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v"))
        .mapInPandas(assign, schema=asg_schema)
        # feeds per-cell pairing below AND callers that re-verify drops:
        # materialize once, keep lineage flat
        .localCheckpoint(eager=True)
    )

    # Within-cell pairing as ONE vectorized pass per cell (guide §4.2: hand
    # whole batches to native code): each cell's cosine matrix is a single
    # BLAS matmul, replacing the cell self-join whose per-pair 64-element
    # dot ran as an interpreted higher-order function (measured: the join
    # dominated the operator's wall time). The |cell|² matrix is bounded by
    # the same cell-sizing rule that bounds the join's candidate space.
    # Rows sort by id inside the cell, so the decision (and therefore the
    # output) is invariant under input partitioning; keeper = the first
    # (smallest) qualifying id. Zero-norm vectors get cosine 0 (the join
    # used NULL) — both never reach a positive threshold.
    out_schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("cell", T.IntegerType()),
            T.StructField("is_kept", T.BooleanType()),
            T.StructField("keeper_id", df.schema[id_col].dataType),
        ]
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # Chunked over rows so worker memory is O(chunk × |cell|), never
        # |cell|² (guide §5): the declared query pins n_cells, so cell size
        # grows with the corpus and a full S-matrix would OOM the Python
        # worker exactly where the old streamed join degraded gracefully
        # (VERDICT r11 "What's wrong" #2). Each chunk's cosines come from
        # one BLAS matmul of the chunk's rows against the [0, chunk_end)
        # prefix — for cells under the chunk size this is a single
        # V @ V.T, the identical computation (and float-summation order)
        # as the unchunked round-11 form.
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = pdf["norm"].to_numpy(dtype=np.float64)
        ids = pdf["id"]
        chunk = 4096
        has_keeper = np.zeros(n, dtype=bool)
        first = np.zeros(n, dtype=np.int64)
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            denom = np.outer(norms[a:b], norms[:b])
            S = (V[a:b] @ V[:b].T) / np.where(denom > 0.0, denom, np.inf)
            # strictly-smaller-id candidates only: global row index a+r may
            # qualify against global columns < a+r (tril offset shifts with
            # the chunk's position in the cell)
            qualify = (S >= threshold) & np.tril(
                np.ones((b - a, b), dtype=bool), k=a - 1
            )
            has_keeper[a:b] = qualify.any(axis=1)
            first[a:b] = qualify.argmax(axis=1)
        return pd.DataFrame(
            {
                "id": ids,
                "cell": pdf["cell"],
                "is_kept": ~has_keeper,
                "keeper_id": [
                    ids.iloc[first[i]] if has_keeper[i] else None for i in range(n)
                ],
            }
        )

    return (
        cb.groupBy("cell")
        .applyInPandas(dedup_cell, schema=out_schema)
        .select(
            F.col("id").alias(id_col),
            "cell",
            "is_kept",
            "keeper_id",
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 16,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """Approximate top-k via IVF cells + residual product quantization —
    the FAISS IndexIVFPQ composition both component docstrings promise.

    Train (driver-side, bounded content-hash sample): coarse centroids on
    the unit sphere, then per-subspace codebooks over the sample's
    RESIDUALS (u - centroid[cell]) — residual magnitudes are much smaller
    than raw coordinates, so the same code budget quantizes finer than
    plain PQ. Encode: ONE Arrow pass emits (cell, codes, est_norm) per
    corpus vector — the serving index reads ~m bytes + 2 ints per vector.
    Serve: each query probes its ``n_probe`` nearest cells; its (tiny)
    probe rows carry q·centroid[cell] plus the GLOBAL per-subspace LUTs
    (codebooks are shared across cells), broadcast into an EQUI-JOIN on
    ``cell`` — candidate volume is the probed cells' population, never the
    corpus, and the per-candidate score is q·c + Σ_j LUT[j][code_j]: m
    array lookups + adds, pure JVM. The 100 TB shape: bounded index bytes
    per vector (PQ), bounded candidates per query (IVF), one equi-join.
    """
    import pandas as pd
    from pyspark.sql import types as T

    unit = lambda v: F.transform(v, lambda x: x / F.nullif(l2_norm(v), F.lit(0.0)))  # noqa: E731

    target = max(50 * max(n_cells, n_codes), 1000)
    X = _bounded_train_sample(corpus, id_col, unit(_vecd(F.col(vec_col))), target)
    dim = X.shape[1]
    d = dim // m
    C = np.array(_lloyd_kmeans(X, n_cells, seed, max_iter), dtype=np.float64)
    Csq = (C**2).sum(axis=1)
    cells = (Csq[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
    R = X - C[cells]
    B = np.array(
        [_lloyd_kmeans(R[:, j * d : (j + 1) * d], n_codes, seed + j, max_iter) for j in range(m)],
        dtype=np.float64,
    )  # (m, n_codes, d)
    Bsq = (B**2).sum(axis=2)

    enc_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("est_norm", T.DoubleType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            V = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, dim)
            norms = np.sqrt((V**2).sum(axis=1))
            U = V / np.where(norms > 0, norms, 1.0)[:, None]
            cell = (Csq[None, :] - 2.0 * (U @ C.T)).argmin(axis=1)
            Rv = (U - C[cell]).reshape(-1, m, d)
            dots = np.einsum("nmd,mcd->nmc", Rv, B)
            codes = (Bsq[None, :, :] - 2.0 * dots).argmin(axis=2)  # (n, m)
            decoded = np.take_along_axis(
                B[None, :, :, :].repeat(len(U), 0), codes[:, :, None, None].repeat(d, 3), axis=2
            )[:, :, 0, :].reshape(-1, dim)
            est = C[cell] + decoded
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["id"].values,
                    "cell": cell.astype("int32"),
                    "codes": list(codes.astype("int32")),
                    "est_norm": np.sqrt((est**2).sum(axis=1)),
                }
            )

    encoded = corpus.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(encode, schema=enc_schema)

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("qdotc", T.DoubleType()),
            T.StructField("luts", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )

    def make_probes(batches):
        for pdf in batches:
            Q = np.array(pdf["v"].tolist(), dtype=np.float64).reshape(-1, dim)
            norms = np.sqrt((Q**2).sum(axis=1))
            U = Q / np.where(norms > 0, norms, 1.0)[:, None]
            order = np.argsort(Csq[None, :] - 2.0 * (U @ C.T), kind="stable", axis=1)
            lut = np.einsum("nmd,mcd->nmc", U.reshape(-1, m, d), B)  # (n, m, n_codes)
            rows = {"query_id": [], "cell": [], "qdotc": [], "luts": []}
            for i in range(len(U)):
                lut_i = [[float(x) for x in row] for row in lut[i]]
                for c in order[i, :n_probe]:
                    rows["query_id"].append(int(pdf["id"].values[i]))
                    rows["cell"].append(int(c))
                    rows["qdotc"].append(float(U[i] @ C[c]))
                    rows["luts"].append(lut_i)
            yield pd.DataFrame(rows)

    qb = queries.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).mapInPandas(make_probes, schema=probe_schema)

    est_dot = F.col("qdotc") + sum(
        F.element_at(F.element_at("luts", j + 1), F.col("codes").getItem(j) + 1)
        for j in range(m)
    )
    scored = (
        encoded.join(F.broadcast(qb), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(est_dot / F.nullif(F.col("est_norm"), F.lit(0.0)), 6).alias("cosine_est"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_est").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_est", "rank")
    )


def binary_quantize(df: DataFrame, id_col: str, vec_col: str, dim: int = 64) -> DataFrame:
    """(id, code, norm) — 1-bit-per-dimension binary quantization.

    The most aggressive embedding compression tier below PQ: each
    dimension contributes its SIGN bit, packing a 64-dim vector into one
    BIGINT (256x smaller than float32). Hamming distance between codes is
    a monotone proxy for angular distance (each agreeing sign halves the
    orthant disagreement), computed as ``bit_count(xor)`` — pure integer
    JVM work, the cheapest possible first-stage filter for a rerank
    cascade. Deterministic, data-independent, merge-free: the code is a
    per-row map any engine reproduces bit-identically.
    """
    vec = _vecd(F.col(vec_col))
    bit = lambda i: F.when(F.element_at(vec, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    # two 32-bit halves, not one 64-bit word: bit 63 overflows engines with
    # CHECKED shift arithmetic (DuckDB), and Hamming distance decomposes
    # exactly as the sum of per-half popcounts
    lo: Column = F.lit(0).cast("bigint")
    hi: Column = F.lit(0).cast("bigint")
    half = dim // 2
    for i in range(half):
        lo = lo.bitwiseOR(F.shiftleft(bit(i).cast("bigint"), i))
    for i in range(half, dim):
        hi = hi.bitwiseOR(F.shiftleft(bit(i).cast("bigint"), i - half))
    return df.select(
        F.col(id_col).alias("id"),
        lo.alias("code_lo"),
        hi.alias("code_hi"),
        l2_norm(vec).alias("norm"),
    )


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k by Hamming distance over binary sign codes.

    (query_id, neighbor_id, hamming, rank) — candidates ranked by
    ascending ``bit_count(code_q XOR code_c)`` with id tiebreak. The
    serving scan reads ONE bigint per corpus vector; the (tiny) query-side
    codes broadcast. The standard two-stage recipe reranks this tier's
    top-k' with exact or PQ scores (compose with ``cosine_topk`` /
    ``pq_topk``).
    """
    cb = binary_quantize(corpus, id_col, vec_col, dim).select(
        F.col("id").alias("neighbor_id"),
        F.col("code_lo").alias("clo"),
        F.col("code_hi").alias("chi"),
    )
    qb = binary_quantize(queries, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"),
        F.col("code_lo").alias("qlo"),
        F.col("code_hi").alias("qhi"),
    )
    scored = (
        cb.crossJoin(F.broadcast(qb))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.col("clo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("chi").bitwiseXOR(F.col("qhi")))
            ).cast("bigint").alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("hamming"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", F.col("rank").cast("bigint").alias("rank"))
    )
