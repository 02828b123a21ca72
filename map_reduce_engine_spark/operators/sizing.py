"""Grow-with-corpus sizing rules for the bucketed ANN / dedup operators.

The 100 TB posture of ``ivf_topk`` / ``semantic_dedup`` / MinHash LSH rests
on one invariant: per-bucket population stays BOUNDED as the corpus grows,
so the bucket-local work (equi-join fan-out, Σ|cell|² candidate pairs)
scales linearly with rows, never quadratically. The operators' docstrings
state the rule ("grown n_cells ∝ corpus size"); this module makes it
executable, so callers that don't hand-tune knobs still get the bounded
shape at any scale.

Two rules live here:

- ``cells_for_corpus``: cell count for the clustered operators (IVF,
  SemDeDup). Linear in rows (ceil(n / rows_per_cell)), clamped to a
  floor (tiny corpora still want a few cells so the equi-join has keys)
  and a ceiling (past ~1M centroids the driver-side Lloyd's trainer and
  the literal-centroid broadcast stop being "a few hundred KB"; real
  deployments shard the index first).
- ``bands_rows_for_threshold``: (bands, rows_per_band) for MinHash LSH
  from the target Jaccard threshold. The S-curve midpoint of banding is
  t ≈ (1/b)^(1/r); this picks the factorization of ``n_perm`` whose
  midpoint lands closest to the requested threshold. Band count is
  threshold-driven, not corpus-driven — population per (band, bucket)
  self-regulates because the bucket key space is 2^31.
"""

from __future__ import annotations

import math


def cells_for_corpus(
    n_rows: int,
    rows_per_cell: int = 4096,
    min_cells: int = 8,
    max_cells: int = 1 << 20,
) -> int:
    """Cell count keeping expected per-cell population <= ``rows_per_cell``.

    Monotone non-decreasing in ``n_rows``; for any corpus below the
    ``max_cells`` ceiling, ``n_rows / cells_for_corpus(n_rows) <=
    rows_per_cell`` — the property test's contract. Above the ceiling the
    bound degrades linearly (documented driver-side-trainer limit).
    """
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    if not (0 < min_cells <= max_cells):
        raise ValueError(f"need 0 < min_cells <= max_cells, got {min_cells}, {max_cells}")
    if rows_per_cell <= 0:
        raise ValueError(f"rows_per_cell must be > 0, got {rows_per_cell}")
    return max(min_cells, min(max_cells, math.ceil(n_rows / rows_per_cell)))


def planes_for_corpus(
    n_rows: int,
    rows_per_bucket: int = 32,
    min_planes: int = 2,
    max_planes: int = 24,
) -> int:
    """Hyperplane count for sign-LSH bucketing (random_hyperplane_buckets)
    keeping the EXPECTED per-bucket population n / 2^planes <=
    ``rows_per_bucket`` — "more planes for bigger corpora", executable.

    Monotone non-decreasing in ``n_rows``; wherever the ``max_planes``
    ceiling is not hit, ``n_rows / 2**planes_for_corpus(n_rows) <=
    rows_per_bucket`` (the property test's contract). Above the ceiling
    the bound degrades linearly — past 2^24 buckets the plane count stops
    being "a handful of inlined literal arrays" and a deployment shards
    the corpus before bucketing (the cells_for_corpus posture). Per-bucket
    pair volume is then ~(rows_per_bucket)²/2 — bounded, so total
    candidate volume grows LINEARLY with the corpus.
    """
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    if rows_per_bucket <= 0:
        raise ValueError(f"rows_per_bucket must be > 0, got {rows_per_bucket}")
    if not (0 < min_planes <= max_planes):
        raise ValueError(f"need 0 < min_planes <= max_planes, got {min_planes}, {max_planes}")
    need = math.ceil(math.log2(n_rows / rows_per_bucket)) if n_rows > rows_per_bucket else 0
    return max(min_planes, min(max_planes, need))


def bands_rows_for_threshold(threshold: float, n_perm: int = 64) -> tuple[int, int]:
    """(bands, rows_per_band) with ``bands * rows_per_band == n_perm`` whose
    LSH S-curve midpoint (1/bands)^(1/rows) is closest to ``threshold``.

    Lower thresholds -> more bands of fewer rows (higher recall); higher
    thresholds -> fewer bands of more rows (higher precision). Ties prefer
    the more-bands (recall-leaning) factorization, matching the usual
    near-dup-removal bias: a false candidate costs one exact-verify row, a
    missed duplicate stays in the corpus.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if n_perm < 2:
        raise ValueError(f"n_perm must be >= 2, got {n_perm}")
    best: tuple[float, int, int] | None = None
    for rows in range(1, n_perm + 1):
        if n_perm % rows:
            continue
        bands = n_perm // rows
        if bands < 2 or rows < 2:
            # degenerate ends: 1 row/band buckets on single hashes
            # (threshold ~1/bands -> everything collides), 1 band is
            # signature-exact match only
            continue
        midpoint = (1.0 / bands) ** (1.0 / rows)
        score = abs(midpoint - threshold)
        if best is None or score < best[0] - 1e-12:
            best = (score, bands, rows)
        elif abs(score - best[0]) <= 1e-12 and bands > best[1]:
            best = (score, bands, rows)
    if best is None:
        # prime n_perm admits no (bands>=2, rows>=2) factorization
        raise ValueError(
            f"n_perm={n_perm} has no bands*rows factorization with both >= 2; "
            "use a composite signature length (64 is the convention)"
        )
    return best[1], best[2]
