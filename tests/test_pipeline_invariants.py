"""Invariant tests for the newest training-pipeline queries.

The oracle-parity test already proves value equality with DuckDB; these pin
the STRUCTURAL guarantees downstream consumers rely on (funnel monotonicity,
chunk tiling, sample-size bounds) so a future refactor that happens to agree
with a refactored oracle still can't break the contract.
"""

from __future__ import annotations

from collections import defaultdict

from map_reduce_engine_spark.queries import REGISTRY

import pytest

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_quality_filter_funnel_monotone(spark, sf_dir, duck):
    rows = {r.stage: r.survivors for r in _run("quality_filter_funnel", spark, sf_dir)}
    order = ["ingest", "nonempty", "min_tokens", "alpha_ratio", "type_token_ratio"]
    assert list(rows) and set(rows) == set(order)
    counts = [rows[s] for s in order]
    assert counts == sorted(counts, reverse=True), counts
    total = duck.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert counts[0] == total


def test_weighted_priority_sample_bounds(spark, sf_dir, duck):
    rows = _run("weighted_priority_sample", spark, sf_dir)
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r.rank)
    pop = dict(
        duck.sql("SELECT source, count(*) FROM documents GROUP BY source").fetchall()
    )
    for source, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), source
        assert len(ranks) == min(8, pop[source]), source


def test_doc_chunking_tiles_exactly(spark, sf_dir, duck):
    rows = _run("doc_chunking", spark, sf_dir)
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append((r.chunk_idx, r.chunk_start, r.chunk_len))
    n_tokens = dict(
        duck.sql(
            r"SELECT doc_id, len(string_split_regex(trim(text), '\s+')) "
            "FROM documents WHERE trim(text) <> ''"
        ).fetchall()
    )
    assert set(per_doc) == set(n_tokens)
    for doc_id, chunks in per_doc.items():
        chunks.sort()
        idxs = [c[0] for c in chunks]
        assert idxs == list(range(len(chunks)))
        for i, (idx, start, length) in enumerate(chunks):
            assert start == 32 * idx
            last = i == len(chunks) - 1
            if last:
                # final chunk reaches exactly the end of the document
                assert start + length == n_tokens[doc_id]
            else:
                assert length == 64
        if len(chunks) == 1:
            assert chunks[0][2] == n_tokens[doc_id]
        else:
            # overlap construction: every non-initial chunk is >= 33 tokens
            assert all(c[2] >= 33 for c in chunks)


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = {r.coverage_pct: r.vocab_size for r in _run("vocab_coverage", spark, sf_dir)}
    assert set(rows) == {50, 90, 99}
    assert 1 <= rows[50] <= rows[90] <= rows[99]


def test_source_vocab_jaccard_range(spark, sf_dir):
    rows = _run("source_vocab_jaccard", spark, sf_dir)
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.jaccard_bp <= 10000
        assert r.shared_tokens >= 1


def test_dataset_card_totals(spark, sf_dir, duck):
    rows = _run("dataset_card", spark, sf_dir)
    total = duck.sql(
        "SELECT count(*) FROM documents WHERE trim(text) <> ''"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.min_chars <= r.max_chars
        assert r.total_tokens >= r.n_docs  # every kept doc has >= 1 token


def test_spearman_perfect_monotone_is_one(spark):
    """A strictly increasing x→y relation has Spearman rho exactly 1.0
    (equal rank vectors make the closed form collapse to 1), regardless
    of how nonlinear the relation is."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("a", i, i * i * i) for i in range(1, 30)], "g STRING, x BIGINT, y BIGINT"
    )
    wx = Window.partitionBy("g").orderBy("x")
    wy = Window.partitionBy("g").orderBy("y")
    r = df.select(
        "g",
        (2 * F.rank().over(wx) + F.count("*").over(Window.partitionBy("g", "x")) - 1)
        .cast("bigint").alias("rx"),
        (2 * F.rank().over(wy) + F.count("*").over(Window.partitionBy("g", "y")) - 1)
        .cast("bigint").alias("ry"),
    )
    m = r.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    ).collect()[0]
    n, sx, sy, sxx, syy, sxy = (float(m[c]) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    rho = (n * sxy - sx * sy) / (((n * sxx - sx * sx) ** 0.5) * ((n * syy - sy * sy) ** 0.5))
    assert rho == 1.0


def test_winsorized_mean_pulls_in_outliers(spark):
    """Clipping at discrete p05/p95 must move the mean toward the bulk when
    a heavy outlier is present, and leave an outlier-free group unchanged."""
    from map_reduce_engine_spark.queries.base import REGISTRY  # noqa: F401 (registry import parity)
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rows = [("g", float(v)) for v in list(range(100, 140)) + [100000.0]]
    df = spark.createDataFrame(rows, "k STRING, value DOUBLE").select(
        "k", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    wr = Window.partitionBy("k").orderBy("cents")
    r = df.withColumn("rn", F.row_number().over(wr)).withColumn(
        "nn", F.count("*").over(Window.partitionBy("k"))
    )
    cuts = r.groupBy("k").agg(
        F.max(F.when(F.col("rn") == F.expr("((nn - 1) * 5) div 100 + 1"), F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.expr("((nn - 1) * 95) div 100 + 1"), F.col("cents"))).alias("hi"),
    )
    clipped = F.when(F.col("cents") > F.col("hi"), F.col("hi")).when(
        F.col("cents") < F.col("lo"), F.col("lo")
    ).otherwise(F.col("cents"))
    out = (
        df.join(cuts, "k")
        .agg(F.avg("cents").alias("raw"), F.avg(clipped).alias("wins"))
        .collect()[0]
    )
    assert out.wins < out.raw  # the 100k outlier is clipped to ~p95
    assert out.wins < 14000 * 1.1  # mean lands near the bulk (cents)


def test_zipf_fit_recovers_power_law_exponent(spark):
    """The micro-unit log-log OLS must recover the exponent of an exact
    synthetic power law: freq = C / rank^1.5 → slope ≈ -1.5 (rounding the
    log coordinates to micro-units perturbs the fit by < 1e-3)."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(r, int(round(1e9 / r**1.5))) for r in range(1, 501)], "rank INT, freq BIGINT"
    ).select(
        F.round(F.lit(1000000.0) * F.log(F.col("rank").cast("double"))).cast("bigint").alias("x"),
        F.round(F.lit(1000000.0) * F.log(F.col("freq").cast("double"))).cast("bigint").alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    n, sx, sy, sxx, sxy = (float(m[c]) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope - (-1.5)) < 1e-3
