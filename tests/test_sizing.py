"""operators/sizing.py: the grow-with-corpus rules are executable, not prose.

The 100 TB claim behind the bucketed ANN/dedup operators is that per-cell
population stays bounded as the corpus grows; these tests pin the helper's
contract with hypothesis and then drive the real auto-sized assignment
through Spark at two corpus sizes 100x apart.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_engine_spark.operators.sizing import (
    bands_rows_for_threshold,
    cells_for_corpus,
    planes_for_corpus,
)

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


@given(n=st.integers(min_value=0, max_value=1 << 32))
def test_cells_population_bounded(n):
    """Below the max_cells ceiling, expected per-cell population never
    exceeds rows_per_cell — the invariant that keeps bucket-local work
    linear in corpus size."""
    cells = cells_for_corpus(n, rows_per_cell=4096)
    assert 8 <= cells <= 1 << 20
    if cells < 1 << 20:
        assert n / cells <= 4096


@given(n=st.integers(min_value=1, max_value=1 << 24))
def test_cells_monotone_under_100x_growth(n):
    """Growing the corpus 100x never shrinks the cell count, and the
    population bound holds at BOTH scales (the scale-up contract)."""
    small, big = cells_for_corpus(n), cells_for_corpus(100 * n)
    assert big >= small
    if big < 1 << 20:
        assert (100 * n) / big <= 4096


@given(
    n=st.integers(min_value=0, max_value=1 << 28),
    rpc=st.integers(min_value=1, max_value=100_000),
)
def test_cells_respects_custom_target(n, rpc):
    cells = cells_for_corpus(n, rows_per_cell=rpc)
    if cells < 1 << 20:
        assert n / cells <= rpc


def test_cells_rejects_bad_args():
    with pytest.raises(ValueError):
        cells_for_corpus(-1)
    with pytest.raises(ValueError):
        cells_for_corpus(10, rows_per_cell=0)
    with pytest.raises(ValueError):
        cells_for_corpus(10, min_cells=0)


@given(t=st.floats(min_value=0.05, max_value=0.95))
@settings(max_examples=200)
def test_bands_rows_midpoint_is_best_factorization(t):
    """The returned factorization's S-curve midpoint beats every other
    (bands>=2, rows>=2) factorization of 64."""
    b, r = bands_rows_for_threshold(t, 64)
    assert b * r == 64 and b >= 2 and r >= 2
    got = abs((1 / b) ** (1 / r) - t)
    for rows in (2, 4, 8, 16, 32):
        bands = 64 // rows
        assert got <= abs((1 / bands) ** (1 / rows) - t) + 1e-12


def test_bands_rows_direction():
    """Lower threshold -> more bands (recall); higher -> more rows/band
    (precision). The repo's default (16, 4) is the 0.5 midpoint:
    (1/16)^(1/4) = 0.5 exactly."""
    b_lo, r_lo = bands_rows_for_threshold(0.3, 64)
    b_hi, r_hi = bands_rows_for_threshold(0.9, 64)
    assert b_lo > b_hi and r_lo < r_hi
    assert bands_rows_for_threshold(0.5, 64) == (16, 4)


def test_bands_rows_rejects_degenerate():
    with pytest.raises(ValueError):
        bands_rows_for_threshold(0.0)
    with pytest.raises(ValueError):
        bands_rows_for_threshold(1.0)
    with pytest.raises(ValueError):
        bands_rows_for_threshold(0.5, n_perm=7)  # prime — no factorization


@given(n=st.integers(min_value=0, max_value=1 << 40))
def test_planes_population_bounded(n):
    """Below the max_planes ceiling, the expected per-bucket population
    n / 2^planes never exceeds rows_per_bucket — the invariant that keeps
    the sign-LSH bucket equi-join's pair volume linear in corpus size."""
    p = planes_for_corpus(n, rows_per_bucket=32)
    assert 2 <= p <= 24
    if p < 24:
        assert n / (1 << p) <= 32 or n <= 32


@given(n=st.integers(min_value=1, max_value=1 << 32))
def test_planes_monotone_under_100x_growth(n):
    """Growing the corpus 100x never shrinks the plane count (more planes
    for bigger corpora), and the population bound holds at both scales."""
    small, big = planes_for_corpus(n), planes_for_corpus(100 * n)
    assert big >= small
    if big < 24:
        assert 100 * n / (1 << big) <= 32


def test_planes_pin_matches_driver_fixture():
    """embedding_similarity_reliability_lsh pins n_planes=4 because its
    static oracle inlines the seeded plane set; the pin must equal what
    the sizing rule yields at the driver fixture (500 embedding rows) —
    if the fixture grows, this fails and the pin + oracle get regenerated
    together."""
    assert planes_for_corpus(500) == 4


def test_planes_rejects_bad_args():
    with pytest.raises(ValueError):
        planes_for_corpus(-1)
    with pytest.raises(ValueError):
        planes_for_corpus(10, rows_per_bucket=0)
    with pytest.raises(ValueError):
        planes_for_corpus(10, min_planes=5, max_planes=4)


def test_auto_sized_hyperplane_buckets_path(spark):
    """random_hyperplane_buckets(n_planes=None) sizes from the corpus
    count: bucket ids stay inside [0, 2^planes) and the bucket count
    follows the rule at two corpus sizes 64x apart."""
    from pyspark.sql import functions as F

    from map_reduce_engine_spark.operators.similarity import random_hyperplane_buckets

    for n in (100, 6400):
        planes = planes_for_corpus(n)
        out = random_hyperplane_buckets(
            _synthetic_vectors(spark, n), "id", "vec", n_planes=None, dim=4
        )
        mx = out.agg(F.max("bucket").alias("m")).collect()[0].m
        assert 0 <= mx < (1 << planes), (n, planes, mx)


def _synthetic_vectors(spark, n: int):
    """Deterministic pseudo-random 4-dim unit-ish vectors from pure JVM
    hash arithmetic — no data files, layout-independent content."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(F.col("id"))
    comps = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000)) / 500.0 - 1.0).alias(f"x{d}")
        for d in range(4)
    ]
    return df.select("id", F.array(*[c for c in comps]).alias("vec"))


@pytest.mark.parametrize("n", [1_000, 100_000])
def test_auto_sized_semantic_dedup_cells_stay_bounded(spark, n):
    """Drive the real auto-sizing path end-to-end: semantic_dedup with
    n_cells=None at 1x and 100x corpus size. Cell count must follow the
    rule and the OBSERVED max cell population must stay within a small
    constant of the target (uniform synthetic vectors -> near-balanced
    cells), i.e. the candidate space stays linear at both scales."""
    from pyspark.sql import functions as F

    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    rows_per_cell = 4096
    out = semantic_dedup(_synthetic_vectors(spark, n), "id", "vec", n_cells=None)
    pops = [r.c for r in out.groupBy("cell").agg(F.count("*").alias("c")).collect()]
    expected_cells = cells_for_corpus(n, rows_per_cell=rows_per_cell)
    assert len(pops) <= expected_cells
    assert sum(pops) == n
    # balance: max observed population within 8x of the sizing target
    # (floor-clamped corpora have fewer rows than 8 full cells — skip)
    if n >= 8 * rows_per_cell:
        assert max(pops) <= 8 * rows_per_cell, (n, expected_cells, max(pops))


def test_auto_sized_bands_threshold_path(spark):
    """minhash_candidate_pairs(bands=None) sizes from the threshold and
    still produces the same pairs as the explicit (16, 4) default at the
    0.5 threshold whose S-curve midpoint (16, 4) is."""
    from map_reduce_engine_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + ("xx " * (i % 3)))
         for i in range(20)],
        "id long, text string",
    )
    sigs = minhash_signatures(docs, "id", "text")
    explicit = {
        (r.id1, r.id2)
        for r in minhash_candidate_pairs(sigs, 16, 4, materialize=False).collect()
    }
    auto = {
        (r.id1, r.id2)
        for r in minhash_candidate_pairs(
            sigs, None, None, materialize=False, threshold=0.5
        ).collect()
    }
    assert auto == explicit
