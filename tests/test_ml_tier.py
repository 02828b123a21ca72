"""Invariant tests for the in-engine ML tier (round-4 closing additions).

The DuckDB oracle suite (test_oracle_parity) proves cross-engine
equality; these tests pin the MATHEMATICAL invariants the oracles cannot
see — so a fixture regeneration or refactor that broke the algorithm
while staying self-consistent across engines still fails loudly.
"""

from __future__ import annotations

from map_reduce_engine_spark.queries import REGISTRY

import pytest

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


def test_pca_power_iteration_invariants(spark, sf_dir):
    rows = REGISTRY["pca_power_iteration"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, 9))
    # one eigenvalue/share per result set, positive, share within (0, 1]
    eigs = {r["eigenvalue"] for r in rows}
    shares = {r["explained_share"] for r in rows}
    assert len(eigs) == 1 and len(shares) == 1
    assert eigs.pop() > 0.0
    assert 0.0 < shares.pop() <= 1.0
    # ranked by |loading| descending
    mags = [abs(r["loading"]) for r in by_rank]
    assert mags == sorted(mags, reverse=True)


def test_naive_bayes_langid_structure(spark, sf_dir):
    # NOTE: the fixture assigns `lang` independently of text content (every
    # language shares one vocabulary), so NO classifier can beat the prior
    # here and accuracy is not a testable invariant. What IS invariant: the
    # confusion matrix partitions exactly the odd-doc_id test docs, and
    # predictions only ever come from languages seen in training.
    from pyspark.sql import functions as F

    rows = REGISTRY["naive_bayes_langid"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_test = docs.where(
        (F.length(F.trim("text")) >= 3) & (F.col("doc_id") % 2 == 1)
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_test
    train_langs = {
        r["lang"]
        for r in docs.where(
            (F.length(F.trim("text")) >= 3) & (F.col("doc_id") % 2 == 0)
        )
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r["pred_lang"] for r in rows} <= train_langs


def test_kmeans_segments_partition_and_bounds(spark, sf_dir):
    segs = REGISTRY["kmeans_1d_value_segments"].fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r["n_orders"] for r in segs) == orders.count()
    for r in segs:
        assert r["min_cents"] <= r["mean_cents"] <= r["max_cents"]
    # 1-D Lloyd's from sorted quartile seeds keeps clusters as ordered,
    # non-overlapping intervals
    by_id = sorted(segs, key=lambda r: r["cluster_id"])
    for lo, hi in zip(by_id, by_id[1:]):
        assert lo["max_cents"] <= hi["min_cents"]
        assert lo["centroid_cents"] <= hi["centroid_cents"]


def test_silhouette_bounds_and_coverage(spark, sf_dir):
    sil = REGISTRY["silhouette_1d_kmeans"].fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r["n_points"] for r in sil) == orders.count()
    for r in sil:
        # silhouette lives in [-1, 1] -> micro-units in [-1e6, 1e6]
        assert -1_000_000 <= r["min_sil_micro"] <= r["mean_sil_micro"]
        assert r["mean_sil_micro"] <= r["max_sil_micro"] <= 1_000_000


def test_sssp_seed_zero_and_no_negatives(spark, sf_dir):
    # weights are clamped >= 1, so the metric is a true distance: exactly
    # the seed sits at 0 and nothing is negative
    from pyspark.sql import functions as F

    dist = REGISTRY["supply_chain_sssp"].fn(spark, sf_dir)
    zero = dist.where(F.col("dist") == 0).collect()
    assert len(zero) == 1 and zero[0]["node"].startswith("c")
    assert dist.where(F.col("dist") < 0).count() == 0


def test_sssp_isolated_seed_keeps_distance_zero(spark):
    """A seed with no incident edges must still appear at distance 0 —
    'seeds carry distance 0' is unconditional (ADVICE r04)."""
    from map_reduce_engine_spark.operators.graph import sssp

    edges = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w int")
    seeds = spark.createDataFrame([("z",), ("a",)], "node string")
    rows = {r["node"]: r["dist"] for r in sssp(edges, seeds, iterations=1).collect()}
    assert rows["z"] == 0 and rows["a"] == 0 and rows["b"] == 1


def test_hits_rejects_zero_iterations(spark):
    """iterations=0 used to crash with AttributeError at the final join;
    it must be a clear ValueError instead (ADVICE r04)."""
    import pytest as _pytest

    from map_reduce_engine_spark.operators.graph import hits

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError, match="iterations >= 1"):
        hits(edges, iterations=0)


def test_hits_scores_normalized(spark, sf_dir):
    import math

    rows = REGISTRY["hits_hubs_authorities"].fn(spark, sf_dir).collect()
    # bipartite purchase graph: customers are pure hubs, suppliers pure
    # authorities; each score vector is unit 2-norm (rounded at 1e-6)
    for r in rows:
        if r["node"].startswith("c"):
            assert r["auth"] == 0.0
        else:
            assert r["hub"] == 0.0
    assert math.isclose(sum(r["hub"] ** 2 for r in rows), 1.0, rel_tol=1e-3)
    assert math.isclose(sum(r["auth"] ** 2 for r in rows), 1.0, rel_tol=1e-3)
