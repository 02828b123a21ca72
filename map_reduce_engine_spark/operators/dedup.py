"""Deduplication operators: exact, MinHash-LSH, exact Jaccard, SimHash.

The reference has no dedup (its only aggregate machinery is the map/reduce
UDF pair, SURVEY.md §2 Part B); these are the north-star LLM-pipeline
operators (§2 Part C). All are pure DataFrame expressions — hashing with
``xxhash64`` (64-bit, JVM-side, deterministic across partitioning), no
Python in the hot path — so each stage is one shuffle-bounded distributed
pass that scales to 100 TB:

- exact dedup          : 1 shuffle (window or agg on the dedup key)
- minhash signatures   : 1 shuffle (explode tokens → N min-aggregates)
- LSH candidate pairs  : 1 shuffle (band-bucket self-join; no O(n^2))
- jaccard verification : shuffle on token for the inverted-index join,
                         restricted to candidates when provided
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.text import tokens_col


def dedup_exact(df: DataFrame, subset: list[str], order_by: list[str]) -> DataFrame:
    """Keep one canonical row per distinct ``subset`` value.

    The survivor is the first row under ``order_by`` (deterministic, unlike
    ``dropDuplicates`` whose survivor is arbitrary — important for oracle
    comparison and for reproducible pipelines). One shuffle on ``subset``.
    """
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_clusters(df: DataFrame, subset: list[str], id_col: str) -> DataFrame:
    """Groups of exact duplicates: (subset..., n_dups, min_id)."""
    return (
        df.groupBy(*subset)
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_id"))
        .where(F.col("n_dups") > 1)
    )


def shingles_col(text_col: str, n: int = 3) -> Column:
    """Array of word n-gram shingles for a text column (JVM-side transform).

    Shingles are the standard MinHash unit: token sets treat documents as
    bags of words (two docs with the same vocabulary in different order
    look identical), while n-gram shingles encode local word order. Texts
    shorter than ``n`` tokens contribute their full token sequence as one
    shingle.
    """
    ts = tokens_col(text_col)
    short = F.array(F.concat_ws(" ", ts))
    full = F.transform(
        F.sequence(F.lit(0), F.size(ts) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(ts, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(ts) < n, short).otherwise(full)


_MASK31 = (1 << 31) - 1


def minhash_family(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic 31-bit affine hash-family constants (a_i odd, b_i).

    Derived from fixed multiplicative-hash constants so the family is the
    same on every engine, run, and language — the property that lets the
    DuckDB oracle recompute identical signatures. 31-bit operands keep
    ``a*base + b`` under 2^62: no bigint overflow under ANSI mode anywhere.
    """
    a = [((2654435761 * (i + 1)) & _MASK31) | 1 for i in range(num_hashes)]
    b = [((2246822519 * (i + 1) + 40503) & _MASK31) for i in range(num_hashes)]
    return a, b


def portable_base31(col: Column) -> Column:
    """31-bit engine-portable string hash: first 8 hex chars of md5, masked.

    The common denominator across engines (Spark, DuckDB, Python all expose
    md5); every approximate-dedup sketch in this module derives its per-slot
    hashes from this one base via ``minhash_family`` affine re-hashes, which
    is what makes the whole family oracle-recomputable. DuckDB twin:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT & 2147483647``.
    """
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_MASK31))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int | None = None,
) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash over the document's token set.

    One distributed pass: explode (id, token) → ``num_hashes`` min-aggregates
    in a single hash aggregate (partial+final, one shuffle on id). Tokens are
    deduped per-document BEFORE the explode (``array_distinct`` — row-local,
    no extra shuffle): min() is duplicate-insensitive, so repeated tokens
    only add md5 work and aggregate input. Each token string is hashed ONCE
    to a 31-bit
    base (md5-prefix — engine-portable, unlike xxhash64 which only Spark
    has); the per-slot family hashes are affine re-hashes of that base
    (``(a_i*base + b_i) & (2^31-1)``, ``minhash_family``) — integer ops are
    cheaper than per-slot string hashing AND let the DuckDB oracle recompute
    bit-identical signatures, making the whole LSH pipeline oracle-checkable.

    ``shingle_n`` switches the hashed unit from unigram tokens to word
    n-gram shingles (order-sensitive near-dup, the classic formulation).
    """
    unit = tokens_col(text_col) if shingle_n is None else shingles_col(text_col, shingle_n)
    # Physical-strategy note (measured at sf0.1): this explode + 64-min
    # groupBy formulation IS the fast one. The tempting "row-local, zero
    # shuffle" alternatives — 64 array_min(transform(hs)) columns, or one
    # F.aggregate walking the token array with a zip_with accumulator —
    # both lose: the first re-inlines the md5 transform into every slot
    # (CollapseProject → 64x hash work), and higher-order-function lambdas
    # run INTERPRETED per element (no whole-stage codegen) with a fresh
    # 64-element array allocated per token step — 3x slower end-to-end.
    # The groupBy's exchange is NOT corpus-sized: map-side partial
    # aggregation collapses each document's tokens to one 64-column row
    # before the shuffle, so the exchange carries ~|documents| rows while
    # every expression stays inside codegen.
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(unit)).alias("token")
    ).select("id", portable_base31(F.col("token")).alias("h"))
    av, bv = minhash_family(num_hashes)
    mins = [
        F.min((F.lit(av[i]) * F.col("h") + F.lit(bv[i])).bitwiseAND(F.lit(_MASK31))).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    sig = toks.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_candidate_pairs(
    sig_df: DataFrame,
    bands: int | None = 16,
    rows_per_band: int | None = 4,
    materialize: bool = True,
    threshold: float = 0.5,
    n_perm: int = 64,
) -> DataFrame:
    """(id1, id2) candidate near-dup pairs via LSH banding.

    Two docs are candidates iff any band of ``rows_per_band`` consecutive
    signature slots hashes identically. The bucket key is a portable affine
    combination of the band's slots — ``(sum_r m_r*s_r & 2^31-1) & 2^31-1``
    with ``m_r`` from ``minhash_family`` — one bigint instead of a
    ``rows_per_band``-element array slice: 4x fewer shuffle key bytes at
    scale, and the oracle recomputes the identical bucket (a rare 2^-31
    collision adds a candidate pair in BOTH engines, and exact verification
    filters it the same way). Buckets are small, so the join output stays
    near-linear instead of the O(n^2) all-pairs blowup. This is the
    100 TB-safe step; exact verification (``jaccard_pairs``) runs only on
    these candidates.

    ``materialize`` persists the signature input (MEMORY_AND_DISK) before
    the self-join: both join sides share one lineage, so without it Spark
    recomputes the whole corpus-scan → 64-min-aggregate pipeline once PER
    SIDE. Signatures are ~64 bigints/doc — orders of magnitude smaller than
    the corpus — so materializing them once is the right trade at any scale
    (the classic MinHash formulation writes the signature matrix out); the
    candidate output is persisted too since the caller invariably feeds it
    to exact verification.
    """
    if bands is None or rows_per_band is None:
        # threshold-driven sizing (operators/sizing.py): pick the
        # factorization of the signature length whose LSH S-curve midpoint
        # (1/b)^(1/r) is closest to the target Jaccard threshold
        from map_reduce_engine_spark.operators.sizing import bands_rows_for_threshold

        bands, rows_per_band = bands_rows_for_threshold(threshold, n_perm)
    if materialize:
        sig_df = sig_df.persist()
    buckets = band_buckets(sig_df, bands, rows_per_band)
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    return pairs.persist() if materialize else pairs


def band_buckets(sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """(id, band, bucket) LSH band-bucket entries for a signature table.

    The bucket is the portable affine combination of the band's slots (see
    ``minhash_candidate_pairs``) — the key the stored signature index is
    partitioned on in an incremental deployment.
    """
    mix, _ = minhash_family(rows_per_band)
    mask = F.lit(_MASK31)

    def bucket_col(b: int) -> Column:
        acc: Column = F.lit(0).cast("bigint")
        for r in range(rows_per_band):
            acc = acc + (F.lit(mix[r]) * F.col("sig")[b * rows_per_band + r]).bitwiseAND(mask)
        return acc.bitwiseAND(mask)

    band_entries = F.array(
        *[
            F.struct(F.lit(b).alias("band"), bucket_col(b).alias("bucket"))
            for b in range(bands)
        ]
    )
    return sig_df.select(F.col("id"), F.explode(band_entries).alias("e")).select(
        "id", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
    )


def build_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bucket) — the corpus's MinHash band-bucket index: every
    document's LSH band entries, the table an incremental near-dup probe
    equi-joins on (band, bucket). One signature pass over the corpus when
    built; :func:`write_band_index` persists it bucketed on the join key so
    daily batches probe the STORED table and the history text/signatures
    are never recomputed (the MinHash twin of
    :func:`build_substring_index`). Rolling a deduplicated batch in is the
    batch's own band entries unioned on — mergeable state, no rebuild.

    The banding knobs are ANNOTATED on the returned frame (column metadata
    on ``band``) so they travel WITH the build: :func:`write_band_index`
    records exactly what the index was built with, never a caller's
    re-statement of it (ADVICE r10 — a writer re-asking for the knobs can
    record defaults for a non-default build, arming the read-time
    assertion against the CORRECT probe)."""
    return band_buckets(
        minhash_signatures(df, id_col, text_col, num_hashes), bands, rows_per_band
    ).withMetadata(
        "band",
        {
            "mre.bands": int(bands),
            "mre.rows_per_band": int(rows_per_band),
            "mre.num_hashes": int(num_hashes),
        },
    )


def _resolve_build_params(
    embedded: dict,
    requested: dict[str, int | None],
    defaults: dict[str, int],
    what: str,
) -> dict[str, int]:
    """Reconcile a writer's keyword overrides against the knob metadata the
    build annotated on the frame (ADVICE r10): embedded values win; an
    explicit override that CONTRADICTS them is a loud error (recording the
    wrong provenance would arm the read-time assertion against the correct
    probe); with no annotation (a hand-built frame) the overrides — else
    the documented defaults — are taken at the caller's word."""
    out = {}
    for key, default in defaults.items():
        got = embedded.get(key)
        want = requested.get(key)
        if got is not None and want is not None and int(got) != int(want):
            raise ValueError(
                f"{what} was BUILT with {key}={int(got)} but the writer was "
                f"told {int(want)} — the build's annotation is authoritative; "
                "drop the writer override or rebuild with the intended knobs"
            )
        out[key] = int(got) if got is not None else (
            int(want) if want is not None else default
        )
    return out


def _set_tblproperties(spark, table: str, props: dict[str, str]) -> None:
    """ALTER TABLE SET TBLPROPERTIES, with the half-written-state hazard
    closed (ADVICE r10): if the ALTER fails after ``saveAsTable``
    succeeded, the table would persist WITHOUT its parameter provenance —
    indistinguishable from a legacy table, so ``read_*`` would silently
    bless any probe. Drop the registration (files at an external path
    survive; :func:`register_bucketed_table` restores them) and re-raise
    so the failure is loud and the unprotected state never persists."""
    kv = ", ".join(f"'{k}' = '{v}'" for k, v in props.items())
    try:
        spark.sql(f"ALTER TABLE {_quote_ident(table)} SET TBLPROPERTIES ({kv})")
    except Exception:
        spark.sql(f"DROP TABLE IF EXISTS {_quote_ident(table)}")
        raise


def write_band_index(
    index_df: DataFrame,
    table: str,
    path: str | None = None,
    n_buckets: int = 32,
    *,
    bands: int | None = None,
    rows_per_band: int | None = None,
    num_hashes: int | None = None,
) -> None:
    """Persist a band-bucket index as a parquet table BUCKETED on
    (band, bucket) — the probe join's exact key, so the stored side is
    hash-clustered on disk. Catalog-addressed for the same reason as
    :func:`write_substring_index` (Spark bucketing lives in the catalog).

    The banding parameters the index was BUILT with are recorded as table
    properties: a probe banded differently from the stored side silently
    lands in a disjoint bucket space (zero candidates), so the parameters
    travel WITH the table and :func:`read_band_index` asserts them at
    probe time — the band twin of the tile index pinning its ``k``.

    The values come from the BUILD, not the caller: :func:`build_band_index`
    (and :func:`read_band_index` on read-back, so roll-forward unions keep
    provenance) annotates its knobs on the ``band`` column's metadata, and
    this writer records those. The keyword overrides exist only for
    hand-built frames with no annotation; passing one that contradicts the
    annotation is a loud error (ADVICE r10 — recording a caller's
    re-statement instead of the build's truth turns the read-time
    assertion into an authoritative-looking wrong answer)."""
    _quote_ident(table)  # fail on a bad name BEFORE any files move
    params = _resolve_build_params(
        dict(index_df.schema["band"].metadata),
        {
            "mre.bands": bands,
            "mre.rows_per_band": rows_per_band,
            "mre.num_hashes": num_hashes,
        },
        {"mre.bands": 16, "mre.rows_per_band": 4, "mre.num_hashes": 64},
        f"band index {table!r}",
    )
    writer = (
        index_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "band", "bucket")
        .sortBy("band", "bucket")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    _set_tblproperties(
        index_df.sparkSession, table, {k: str(v) for k, v in params.items()}
    )


def read_band_index(
    spark,
    table: str,
    bands: int = 16,
    rows_per_band: int = 4,
    num_hashes: int = 64,
) -> DataFrame:
    """Read a persisted band-bucket index back, ASSERTING that the banding
    the caller is about to probe with matches what the index was built
    with (recorded by :func:`write_band_index` as table properties).
    A mismatch is the silent-zero-candidates failure mode — this turns it
    into a loud ValueError at read time. Tables written before the
    properties existed (or registered by hand via
    :func:`register_bucketed_table`) have no recorded parameters and pass
    through with the caller's word taken — LOUDLY (a ``UserWarning``), so
    an unprotected table is never mistaken for an asserted one (ADVICE
    r10). The recorded parameters are re-annotated on the returned frame's
    ``band`` column metadata, so a roll-forward union headed by this frame
    carries the build's provenance into :func:`write_band_index`."""
    props = {
        r["key"]: r["value"]
        for r in spark.sql(
            f"SHOW TBLPROPERTIES {_quote_ident(table)}"
        ).collect()
    }
    expected = {
        "mre.bands": bands,
        "mre.rows_per_band": rows_per_band,
        "mre.num_hashes": num_hashes,
    }
    for key, want in expected.items():
        got = props.get(key)
        if got is not None and int(got) != int(want):
            raise ValueError(
                f"band index {table!r} was built with {key}={got}, "
                f"probe requested {int(want)} — mismatched banding probes a "
                "disjoint bucket space (zero candidates)"
            )
    df = spark.table(table)
    if all(k in props for k in expected):
        return df.withMetadata(
            "band", {k: int(props[k]) for k in expected}
        )
    warnings.warn(
        f"band index {table!r} has no recorded banding parameters "
        "(legacy or hand-registered table) — the probe's banding is taken "
        "at the caller's word, a mismatch would silently yield zero "
        "candidates",
        UserWarning,
        stacklevel=2,
    )
    return df


def build_token_table(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int | None = None
) -> DataFrame:
    """(id, toks) — every document's DISTINCT token (or ``shingle_n``-gram)
    array: the verify-side companion of the band index. The exact-Jaccard
    verify joins candidate pairs to the two sides' token arrays; building
    this table once and persisting it (:func:`write_token_table`, bucketed
    on ``id`` — the verify join's key) means a daily batch's verify never
    re-tokenizes the history text — the cost that made the ingest verify
    history-sized (VERDICT r09 #1). Mergeable state like the band index:
    rolling a deduplicated batch in is the batch's own rows unioned on.

    The tokenization unit is ANNOTATED on the returned frame (column
    metadata on ``toks``) so :func:`write_token_table` records what the
    table was actually built with, never a caller's re-statement of it
    (ADVICE r10)."""
    unit = tokens_col(text_col) if shingle_n is None else shingles_col(text_col, shingle_n)
    return df.select(
        F.col(id_col).alias("id"), F.array_distinct(unit).alias("toks")
    ).withMetadata(
        "toks",
        {"mre.shingle_n": "none" if shingle_n is None else str(int(shingle_n))},
    )


_UNSPECIFIED = object()  # distinguishes "no override" from shingle_n=None


def write_token_table(
    tok_df: DataFrame,
    table: str,
    path: str | None = None,
    n_buckets: int = 32,
    *,
    shingle_n: object = _UNSPECIFIED,
) -> None:
    """Persist a verify token table as a parquet table BUCKETED on ``id``
    (the verify join's key). The tokenization unit the table was built
    with (``shingle_n`` — None = whitespace tokens) is recorded as a table
    property and asserted by :func:`read_token_table`: verifying
    word-token Jaccard against a shingle-built table silently reports
    wrong similarities, the same failure family as mismatched banding.

    The recorded value comes from :func:`build_token_table`'s annotation
    on the ``toks`` column metadata (re-attached by
    :func:`read_token_table`, so roll-forward unions keep it) — the
    ``shingle_n`` keyword exists only for hand-built frames with no
    annotation, and contradicting the annotation is a loud error
    (ADVICE r10)."""
    _quote_ident(table)  # fail on a bad name BEFORE any files move
    embedded = dict(tok_df.schema["toks"].metadata).get("mre.shingle_n")
    if shingle_n is _UNSPECIFIED:
        unit = embedded if embedded is not None else "none"
    else:
        unit = "none" if shingle_n is None else str(int(shingle_n))  # type: ignore[arg-type]
        if embedded is not None and str(embedded) != unit:
            raise ValueError(
                f"token table {table!r} was BUILT with shingle_n={embedded} "
                f"but the writer was told {unit} — the build's annotation is "
                "authoritative; drop the writer override or rebuild with the "
                "intended unit"
            )
    writer = (
        tok_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "id")
        .sortBy("id")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    _set_tblproperties(
        tok_df.sparkSession, table, {"mre.shingle_n": str(unit)}
    )


def read_token_table(
    spark, table: str, shingle_n: int | None = None
) -> DataFrame:
    """Read a persisted verify token table back, asserting the caller's
    tokenization unit matches what the table was built with (recorded by
    :func:`write_token_table`). Tables without the property
    (hand-registered via :func:`register_bucketed_table`) pass through
    with a ``UserWarning`` (ADVICE r10 — unprotected is never silent).
    The recorded unit is re-annotated on the returned frame's ``toks``
    column metadata so roll-forward unions keep the provenance."""
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {_quote_ident(table)}").collect()
    }
    got = props.get("mre.shingle_n")
    want = "none" if shingle_n is None else str(int(shingle_n))
    if got is not None and got != want:
        raise ValueError(
            f"token table {table!r} was built with shingle_n={got}, "
            f"verify requested {want} — mismatched tokenization units make "
            "every Jaccard value silently wrong"
        )
    df = spark.table(table)
    if got is not None:
        return df.withMetadata("toks", {"mre.shingle_n": str(got)})
    warnings.warn(
        f"token table {table!r} has no recorded tokenization unit (legacy "
        "or hand-registered table) — the verify's unit is taken at the "
        "caller's word, a mismatch would make every Jaccard silently wrong",
        UserWarning,
        stacklevel=2,
    )
    return df


def roll_forward_guard(
    new_df: DataFrame, stored_df: DataFrame, key_cols: list[str]
) -> DataFrame:
    """``new_df`` minus the rows whose key already exists in ``stored_df``
    — the re-run/id-reuse guard every index roll-forward needs, built so
    the STORED side is never shuffled.

    The naive forms both pay a corpus-sized wide exchange every day: a
    ``new_df.join(stored_df, key, "left_anti")`` hash-shuffles the whole
    stored index (LeftAnti can only broadcast its right side, and the
    stored side is the big one), and a ``distinct()`` over the rolled
    union re-clusters the union. Instead: (1) semi-join the stored side
    against a BROADCAST of the batch's (tiny, distinct) key set — one
    linear scan of the stored table with an in-memory probe, no exchange;
    the result is only the overlap, at most batch-sized; (2) anti-join
    ``new_df`` against that small overlap — also broadcastable. Total
    wide work is batch-sized; the stored table is read once, moved never.
    """
    overlap = stored_df.select(*key_cols).join(
        F.broadcast(new_df.select(*key_cols).distinct()), key_cols, "left_semi"
    )
    return new_df.join(F.broadcast(overlap), key_cols, "left_anti")


def minhash_cross_candidates(
    sig_new: DataFrame,
    sig_hist: DataFrame | None,
    bands: int = 16,
    rows_per_band: int = 4,
    hist_index_df: DataFrame | None = None,
) -> DataFrame:
    """(id1=new, id2=historical) candidate pairs across two signature sets.

    The incremental formulation of LSH banding: the historical side is the
    stored band-bucket index, and the NEW batch's entries equi-join it —
    candidate volume scales with the batch, never the history size, and
    the history is never self-joined. Pass ``hist_index_df`` (a
    :func:`build_band_index` frame, usually the persisted bucketed table)
    to probe WITHOUT recomputing the history's signatures at all —
    ``sig_hist`` may then be ``None``; without it the index is recomputed
    from ``sig_hist`` inline (the self-contained registry form).
    ``bands``/``rows_per_band`` still band the NEW side and MUST equal the
    values the stored index was built with — mismatched banding silently
    probes disjoint bucket spaces (zero candidates), so a deployment pins
    them next to the index, exactly like the tile index pins its ``k``.
    """
    a = band_buckets(sig_new, bands, rows_per_band).alias("a")
    if hist_index_df is not None:
        b = hist_index_df.select("id", "band", "bucket").alias("b")
    elif sig_hist is not None:
        b = band_buckets(sig_hist, bands, rows_per_band).alias("b")
    else:
        raise ValueError("minhash cross probe needs either sig_hist or hist_index_df")
    return (
        a.join(b, ["band", "bucket"])
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float,
    candidates: DataFrame | None = None,
    max_id: int | None = None,
    shingle_n: int | None = None,
    hist_toks_df: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set Jaccard similarity join: (id1, id2, jaccard).

    Two physical strategies, picked by whether a candidate set exists:

    - With ``candidates`` (the MinHash-LSH scale path): join each candidate
      pair to the two docs' distinct-token arrays and compute
      ``|A∩B| / (|A|+|B|-|A∩B|)`` with ``array_intersect`` — cost is
      O(candidates), never quadratic in corpus size. This is the 100 TB path:
      an inverted-index self-join would explode on high-document-frequency
      tokens (a token present in f docs contributes f^2 join rows).
    - Without candidates (oracle-sized exact runs bounded by ``max_id``):
      inverted-index formulation — explode distinct tokens, self-join on
      token, count intersections. Exact and shuffle-co-located, but
      quadratic in per-token document frequency; keep the corpus bounded.

    ``hist_toks_df`` (requires ``candidates``) is the incremental verify's
    scale knob: a stored ``(id, toks)`` table (:func:`build_token_table` /
    :func:`read_token_table`) supplying the ``id2`` side's token arrays, so
    ``df`` need only hold the NEW batch and the history text is never
    re-tokenized — the verify's cost scales with the day, not the corpus
    (the same contract as ``hist_index_df`` on the candidate side). Every
    ``candidates.id2`` must be covered by the stored table (the band-index
    probe guarantees it: candidates only arise from stored entries)."""
    base = df
    if max_id is not None:
        base = base.where(F.col(id_col) < max_id)

    unit = tokens_col(text_col) if shingle_n is None else shingles_col(text_col, shingle_n)
    if hist_toks_df is not None and candidates is None:
        raise ValueError("hist_toks_df is only meaningful with candidates")
    if candidates is not None:
        toks_arr = base.select(
            F.col(id_col).alias("id"), F.array_distinct(unit).alias("toks")
        )
        toks2 = (
            hist_toks_df.select("id", "toks") if hist_toks_df is not None else toks_arr
        )
        joined = (
            candidates.join(
                toks_arr.select(F.col("id").alias("id1"), F.col("toks").alias("t1")), "id1"
            ).join(
                toks2.select(F.col("id").alias("id2"), F.col("toks").alias("t2")), "id2"
            )
        )
        inter = F.size(F.array_intersect("t1", "t2"))
        union = F.size("t1") + F.size("t2") - inter
        return (
            joined.select(
                "id1", "id2", F.round(inter / union, 6).alias("jaccard")
            )
            .where(F.col("jaccard") >= min_jaccard)
        )

    # Not persisted: the explode+distinct ends in an exchange, so Spark's
    # ReuseExchange already shares it across the self-join sides and sizes;
    # caching here measured slower than the reuse.
    toks = (
        base.select(F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("token"))
        .distinct()
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, "token")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    pairs = (
        inter.join(sizes.withColumnsRenamed({"id": "id1", "n": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n": "n2"}), "id2")
        .select(
            "id1",
            "id2",
            F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6).alias("jaccard"),
        )
    )
    return pairs.where(F.col("jaccard") >= min_jaccard)


SIMHASH_BITS = 63


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: bigint) — 63-bit SimHash over the token multiset.

    Classic Charikar sketch: each token votes +1/-1 on each bit lane; the
    sketch bit is the vote sign. Hamming distance between sketches
    approximates cosine distance between token vectors. Implemented as 63
    conditional-sum aggregates in one hash aggregate (one shuffle) — no
    Python, no per-row UDF.

    Lane i's vote is bit 30 of the i-th affine re-hash of the portable
    31-bit token base (``portable_base31`` + ``minhash_family``) — all
    integer arithmetic, so the DuckDB oracle recomputes identical sketches.
    63 lanes, not 64: the sketch stays in the positive signed-bigint range,
    which both engines shift/mask identically (DuckDB raises on 1<<63).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("id", portable_base31(F.col("tok")).alias("h"))
    av, bv = minhash_family(SIMHASH_BITS)
    half = F.lit(1 << 30)
    votes = [
        F.sum(
            F.when(
                (F.lit(av[i]) * F.col("h") + F.lit(bv[i])).bitwiseAND(F.lit(_MASK31)) >= half,
                1,
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sketch: Column = F.lit(0).cast("bigint")
    for bit in range(SIMHASH_BITS):
        sketch = sketch.bitwiseOR(
            F.when(F.col(f"v{bit}") > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)).otherwise(F.lit(0).cast("bigint"))
        )
    return agg.select("id", sketch.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Scale path: block on 4 sketch segments of 16 bits (the top one holds 15
    live bits under the 63-bit sketch; pigeonhole — any pair within Hamming
    distance 3 shares at least one exact segment), self-join per segment,
    then verify with ``bit_count(xor)``. Linear-ish like LSH banding; never
    all-pairs.

    Sketches are materialized once before the self-join: both sides share
    one lineage, so without it the corpus-scan + 63-vote aggregate runs
    once per side. A sketch is one bigint per doc — materializing it is the
    right trade at any corpus size. localCheckpoint (not persist) so the
    ContextCleaner reclaims it when the result goes out of scope — a
    persist() here leaks a cache entry per invocation for the life of the
    session (the registry sweep runs 200+ queries in one session).
    """
    sk = simhash(df, id_col, text_col).localCheckpoint(eager=True)
    segs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seg"),
                F.shiftright(F.col("simhash"), s * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for s in range(4)
        ]
    )
    blocked = sk.select("id", "simhash", F.explode(segs).alias("e")).select(
        "id", "simhash", F.col("e.seg").alias("seg"), F.col("e.key").alias("key")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, ["seg", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def repeated_span_coverage(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """(id, n_tokens, covered_tokens, coverage_bp) — substring-level dedup
    signal: the fraction of each document's token positions covered by a
    ``k``-token span that also occurs in ANOTHER document.

    The span-granular complement of whole-document MinHash/SimHash (Lee et
    al., "Deduplicating Training Data Makes Language Models Better", ACL'22:
    repeated SPANS — boilerplate, licenses, templates — survive document
    dedup and measurably hurt LMs). Exact suffix-array substring dedup
    doesn't distribute; fixed-k shingle coverage is the scalable proxy: a
    repeated substring of length >= k is covered exactly, shorter ones are
    ignored.

    Scale shape: one explode to (doc, pos, k-gram-hash) rows; document
    frequency per hash with a map-side distinct BEFORE the shuffle (the
    shuffle carries unique (doc, hash) pairs); the k-fold position explode
    runs only on occurrences of REPEATED shingles (for clean corpora a small
    minority); coverage is a distinct + count per doc. Every shuffle keys on
    the k-gram hash or the doc id — no all-pairs anything. The md5-prefix
    hash family keeps the whole pipeline engine-portable (the DuckDB twin
    recomputes it bit-identically).
    """
    from map_reduce_engine_spark.operators.packing import winnow_hashes_col
    from map_reduce_engine_spark.operators.text import tokens_col

    base = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("l")
    ).select("id", "l", F.size("l").cast("bigint").alias("n_tokens"))
    occ = (
        base.where(F.size("l") >= k)
        .select("id", F.posexplode(winnow_hashes_col("l", k=k)).alias("pos0", "h"))
        .select("id", (F.col("pos0") + 1).alias("i"), "h")
    )
    covered = (
        _repeated_positions(occ, 2)
        .select("id", F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))).alias("p"))
        .distinct()
        .groupBy("id")
        .agg(F.count("*").alias("covered_tokens"))
    )
    return (
        base.select("id", "n_tokens")
        .join(covered, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.expr("(10000 * coalesce(covered_tokens, 0)) div greatest(n_tokens, 1)").alias("coverage_bp"),
        )
    )


def _substring_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """((id, n_tokens) base, (id, i, h) k-gram occurrences) shared by the
    exact-substring dedup tier. Positions ``i`` are 1-based token offsets;
    ``h`` is the engine-portable md5-prefix hash of the k-gram starting at
    ``i`` (operators/packing.py::winnow_hashes_col), so the DuckDB oracle
    recomputes identical tiles."""
    from map_reduce_engine_spark.operators.packing import winnow_hashes_col

    # the tile explode fans each doc out k-fold md5 evaluations wide — make
    # sure that stage is at least core-parallel. A single small input file
    # otherwise serializes the whole hash pipeline into one task (the
    # operators/bootstrap.py precedent; measured ~1 s/pass single-task at
    # sf0.1). At production scale input partitions exceed cores and this is
    # a no-op — the guard never triggers, so no corpus-wide shuffle is added.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    base = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("l")
    ).select("id", "l", F.size("l").cast("bigint").alias("n_tokens"))
    occ = (
        base.where(F.size("l") >= k)
        .select("id", F.posexplode(winnow_hashes_col("l", k=k)).alias("pos0", "h"))
        .select("id", (F.col("pos0") + 1).cast("bigint").alias("i"), "h")
    )
    return base, occ


def _repeated_positions(
    occ: DataFrame, min_df: int, exclude_canon: bool = False
) -> DataFrame:
    """(id, i) occurrences of tiles repeated in >= ``min_df`` distinct docs,
    computed with windows over the tile hash in ONE pass over ``occ``.

    The previous form (distinct (id,h) → groupBy(h) count → equi-join the
    survivors back onto ``occ``) embeds the tokenize→md5 ``occ`` subtree
    once per join side — Spark shares no common subplans, so the corpus was
    scanned and tile-hashed TWICE per run (guide §2.4). Here ``occ`` is
    exchanged on ``h`` once; ``dense_rank`` over ids then counts distinct
    documents per tile exactly like the old distinct-pairs aggregate
    (``max(dense_rank) == count(distinct id)``), and the canonical holder
    (min id, survivor accounting) rides the same window. Trade-off: a hot
    tile's occurrences sort in one window task where the old join could be
    AQE-skew-split — acceptable because the old shape ALSO shuffled the
    full ``occ`` by ``h`` for the join-back, and tile hashes are md5-high-
    cardinality (a pathological corpus-wide tile is bounded by
    |docs|·positions of ONE k-gram).
    """
    who = Window.partitionBy("h").orderBy("id")
    wh = Window.partitionBy("h")
    out = (
        occ.withColumn("_rk", F.dense_rank().over(who))
        .withColumn("_df", F.max("_rk").over(wh))
        .where(F.col("_df") >= min_df)
    )
    if exclude_canon:
        out = out.withColumn("_canon", F.min("id").over(wh)).where(
            F.col("id") != F.col("_canon")
        )
    # (id, i) is unique by construction (one row per posexplode position and
    # the per-h annotation is row-preserving), so no distinct is needed —
    # the old join-back needed one only as a safeguard.
    return out.select("id", "i")


def _merge_spans(positions: DataFrame, k: int) -> DataFrame:
    """(id, span_start, span_end, span_tokens) — merge the k-token intervals
    [i, i+k-1] of a (id, i) position frame into maximal spans (classic
    gaps-and-islands). Two intervals merge iff the later start is within
    ``k`` of the earlier (equal-length intervals overlap or touch exactly
    then). Both windows partition by the DOCUMENT id — per-doc state only,
    never a single-partition exchange; a document contributes at most
    n_tokens positions, so the window state is document-bounded."""
    w = Window.partitionBy("id").orderBy("i")
    isl = (
        positions.withColumn("prev_i", F.lag("i").over(w))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev_i").isNull() | (F.col("i") - F.col("prev_i") > k), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_isl").over(w))
    )
    return isl.groupBy("id", "island").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + F.lit(k - 1)).cast("bigint").alias("span_end"),
        (F.max("i") + F.lit(k) - F.min("i")).cast("bigint").alias("span_tokens"),
    ).select("id", "span_start", "span_end", "span_tokens")


def substring_dedup_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 50, min_df: int = 2
) -> DataFrame:
    """(id, span_start, span_end, span_tokens) — maximal duplicated token
    spans per document: every position covered by a ``k``-token run that
    also occurs verbatim in at least ``min_df`` distinct documents, merged
    into maximal intervals.

    The EXACT-substring dedup tier (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22 — their ExactSubstr with
    k=50 tokens): whole-document MinHash/SimHash misses a 50-token license
    block pasted into two otherwise-distinct documents; this catches it
    exactly. A true suffix array doesn't distribute; overlapping fixed-k
    tile hashes give the same guarantee band — a shared run of length
    L >= k is found exactly (its L-k+1 tiles all repeat, and the merged
    island reconstructs the full [start, start+L-1] span); a shared run of
    length < k is invisible by design (below the memorization-hazard
    threshold the k parameter encodes).

    Scale shape (every stage an equi-keyed shuffle, no all-pairs anything):
    tokenize -> one posexplode to (doc, pos, tile-hash) -> repeated-tile
    document frequency via windows over the tile hash in the SAME pass
    (``_repeated_positions`` — one exchange on ``h``; the former
    aggregate+join-back re-tokenized the corpus once per join side) ->
    per-DOCUMENT interval merge (windows
    keyed by doc id). Cross-document repetition only (min_df counts
    distinct docs): within-doc repeats are the self-similarity measured by
    repeated_span_coverage / repetition_stats.
    """
    base, occ = _substring_occurrences(df, id_col, text_col, k)
    return _merge_spans(_repeated_positions(occ, min_df), k)


def substring_dedup_survivors(
    df: DataFrame, id_col: str, text_col: str, k: int = 50, min_df: int = 2
) -> DataFrame:
    """(id, n_tokens, removed_tokens, kept_tokens, removed_bp) — per-document
    removal accounting for exact-substring dedup, mirroring ``dedup_exact``'s
    deterministic keep-best rule at span granularity.

    For each duplicated ``k``-token tile, the CANONICAL holder is the
    document with the smallest id (the same first-under-order survivorship
    rule as dedup_exact); every occurrence of that tile in any OTHER
    document is removable. Removable positions merge into maximal spans
    per document (see substring_dedup_spans) and roll up to integer token
    counts + basis points — nothing for engines to round differently. All
    documents appear (left join, zero-coalesced), so the output is a full
    corpus token-retention ledger: sum(kept_tokens) is the post-dedup
    corpus size the training pipeline actually feeds the tokenizer.
    """
    base, occ = _substring_occurrences(df, id_col, text_col, k)
    rem = _repeated_positions(occ, min_df, exclude_canon=True)
    removed = _merge_spans(rem, k).groupBy("id").agg(
        F.sum("span_tokens").alias("removed_tokens")
    )
    return (
        base.select("id", "n_tokens")
        .join(removed, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("removed_tokens", F.lit(0)).cast("bigint").alias("removed_tokens"),
            (F.col("n_tokens") - F.coalesce("removed_tokens", F.lit(0)))
            .cast("bigint")
            .alias("kept_tokens"),
            F.expr("(10000 * coalesce(removed_tokens, 0)) div greatest(n_tokens, 1)").alias(
                "removed_bp"
            ),
        )
    )


def substring_dedup_rewrite(
    df: DataFrame, id_col: str, text_col: str, k: int = 50, min_df: int = 2
) -> DataFrame:
    """(id, text, n_tokens, removed_tokens) — the corpus with duplicated
    spans EXCISED: every non-canonical occurrence of a duplicated
    ``k``-token run (see substring_dedup_survivors' keep-best rule) is cut
    out of the document text; the canonical copy survives verbatim.

    This is the actual rewrite step of Lee et al. ACL'22 (their ExactSubstr
    removes the span, not the document — most documents are mostly unique
    and deleting them wholesale over one shared license block throws away
    good tokens). Reassembly is JVM-side end to end via the shared
    per-SPAN excision (``_excise_spans``): removable tile starts merge
    into maximal per-doc spans first, the spans collect to one array per
    document, and an in-row filter-by-index keeps surviving tokens in
    order — the token stream itself is never exploded, shuffled, or
    re-sorted. Documents with nothing to remove pass through
    byte-identical (modulo the tokenizer's whitespace normalization,
    applied uniformly so downstream fingerprints agree).
    """
    base, occ = _substring_occurrences(df, id_col, text_col, k)
    rem = _repeated_positions(occ, min_df, exclude_canon=True)
    return _excise_spans(base, _merge_spans(rem, k))


def build_substring_index(
    corpus_df: DataFrame, id_col: str, text_col: str, k: int = 50
) -> DataFrame:
    """(h) — the corpus's canonical tile-hash index: the DISTINCT set of
    ``k``-token tile hashes occurring anywhere in ``corpus_df``. ONE hash
    aggregate over the corpus; the table every incremental substring probe
    equi-joins (:func:`incremental_substring_dedup` /
    :func:`incremental_substring_rewrite` via their ``index_df`` knob).

    At 100 TB this frame is built once and PERSISTED
    (:func:`write_substring_index` — parquet bucketed on ``h``), then every
    daily batch probes the stored table and the corpus text is never
    rescanned. Appending a deduplicated batch to the index is the same
    aggregate over the batch alone unioned in (distinct-of-union == union
    of distincts — the index is mergeable state, the
    operators/incremental.py contract)."""
    _, occ = _substring_occurrences(corpus_df, id_col, text_col, k)
    return occ.select("h").distinct()


def write_substring_index(
    index_df: DataFrame, table: str, path: str | None = None, n_buckets: int = 32
) -> None:
    """Persist a canonical tile-hash index as a parquet table BUCKETED on
    ``h`` (``n_buckets`` files, hash-clustered, sorted within buckets) —
    the artifact form of the "persisted at 100 TB, never rescanned" claim:
    a probe read back through :func:`read_substring_index` carries the
    bucketing metadata, so the index side of the probe equi-join is
    already hash-clustered on disk and AQE sizes the join off the stored
    table, not a corpus rescan.

    Spark exposes bucketing only through the catalog (``bucketBy`` +
    ``saveAsTable``), so the index is addressed by ``table`` name; pass
    ``path`` to pin the files to an external location (the job-output-dir
    convention — cf. the reference's job-directory persistence contract,
    ``Communicator.java:264-267``, which this replaces with a real
    columnar table)."""
    writer = (
        index_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "h")
        .sortBy("h")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_substring_index(spark, table: str) -> DataFrame:
    """Read a persisted canonical tile-hash index back WITH its bucketing
    metadata (``spark.table``, never a bare parquet-path read, which would
    drop the bucket spec) — the probe side of build-once/probe-daily.

    Catalog durability: the table registration lives in the SESSION's
    catalog. On a cluster with a persistent metastore (Hive/derby — works
    in this repo via ``enableHiveSupport()``, verified cross-JVM — Glue,
    Unity, ...) tomorrow's session reads it directly; under Spark's
    default in-memory catalog only the registration dies with the session
    while the parquet FILES persist at the external path —
    :func:`register_bucketed_table` re-registers them (metadata-only DDL,
    no data rewrite)."""
    return spark.table(table)


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quote_ident(name: str) -> str:
    """Backtick-quote a (possibly dot-qualified) SQL identifier, validating
    each part against the plain-identifier grammar — these names are
    interpolated into DDL strings, so a hostile or merely odd name must
    not be able to alter the statement."""
    parts = name.split(".")
    for p in parts:
        if not _IDENT_RE.match(p):
            raise ValueError(f"invalid SQL identifier: {name!r}")
    return ".".join(f"`{p}`" for p in parts)


_TYPE_CHARS_RE = re.compile(r"^[A-Za-z0-9_<>(), ]+$")


def _validate_columns_sql(columns_sql: str) -> None:
    """Validate a ``CREATE TABLE`` column-list fragment as a comma-separated
    list of ``ident TYPE`` pairs before it is interpolated into DDL.

    Statement punctuation (``;'"`` and backticks) is banned outright, but
    parentheses and angle brackets are ALLOWED where a type legitimately
    needs them — ``DECIMAL(10,2)``, ``VARCHAR(64)``, ``ARRAY<DOUBLE>``,
    ``MAP<STRING,INT>`` — as long as they are balanced (ADVICE r10: the
    previous blanket ``(``/``)`` ban over-blocked every parameterized type
    from the documented catalog-recovery path). Splitting on commas at
    nesting depth 0 keeps ``DECIMAL(10,2)``'s comma inside its own column
    entry; an unbalanced bracket (the injection shape — closing the DDL's
    own column list early) is a loud error."""
    if any(ch in columns_sql for ch in ";'\"`"):
        raise ValueError(
            "columns_sql must be a plain column list of `ident TYPE` pairs "
            f'(e.g. "h BIGINT, score DECIMAL(10,2)"), got {columns_sql!r}'
        )
    entries, depth, cur = [], 0, []
    for ch in columns_sql:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
            if depth < 0:
                raise ValueError(
                    f"unbalanced brackets in columns_sql: {columns_sql!r}"
                )
        if ch == "," and depth == 0:
            entries.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if depth != 0:
        raise ValueError(f"unbalanced brackets in columns_sql: {columns_sql!r}")
    entries.append("".join(cur))
    for entry in entries:
        parts = entry.strip().split(None, 1)
        if len(parts) != 2 or not _IDENT_RE.match(parts[0]) or not _TYPE_CHARS_RE.match(parts[1]):
            raise ValueError(
                f"columns_sql entry {entry.strip()!r} is not an "
                "`ident TYPE` pair"
            )


def table_location(spark, table: str) -> str | None:
    """The storage location of a catalog table (normalized: scheme prefix
    and trailing slashes stripped), or None for a managed table with no
    explicit location row. Used by the example jobs' overwrite guards: a
    prebuilt (day-2+) run must never write tomorrow's index over the very
    files backing the stored table it is reading in the same plan
    (ADVICE r10 — mid-read file deletion at best, loss of the only dedup
    state at worst)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {_quote_ident(table)}").collect():
        if (r["col_name"] or "").strip() == "Location":
            return _normalize_location(r["data_type"])
    return None


def _normalize_location(loc: str) -> str:
    loc = (loc or "").strip()
    if "://" in loc:
        loc = loc.split("://", 1)[1]
    elif loc.startswith("file:"):
        loc = loc[len("file:"):]
    return loc.rstrip("/")


def assert_fresh_write_target(spark, table: str, write_path: str) -> None:
    """Raise if ``write_path`` is the very location backing catalog
    ``table`` — the guard the prebuilt loops run BEFORE any overwrite
    (reads of ``table`` are lazy; overwriting its files mid-plan deletes
    them out from under the scan)."""
    loc = table_location(spark, table)
    if loc is not None and loc == _normalize_location(write_path):
        raise ValueError(
            f"refusing to overwrite {write_path!r}: it backs the stored "
            f"table {table!r} being read in this run — prebuilt (day-2+) "
            "runs need a FRESH output_dir per day (yesterday's files are "
            "the only copy of the rolled index state)"
        )


def register_bucketed_table(
    spark,
    table: str,
    path: str,
    columns_sql: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """Re-register existing bucketed parquet files under the current
    catalog: ``CREATE TABLE ... USING parquet CLUSTERED BY ... LOCATION`` —
    metadata-only DDL, zero data movement. The recovery/migration path
    when the catalog that held an index is gone (an in-memory-catalog
    session ended; a metastore migration): the index FILES are durable at
    the external path, and this restores the bucket spec over them.

    ``n_buckets`` and ``bucket_cols`` MUST match the original writer's
    (``write_substring_index``/``write_band_index``/``write_ivf_index``
    defaults: 32) — bucket ids are baked into the file layout, and a
    mismatched registration would make bucket-pruned reads silently
    wrong. ``columns_sql`` is the column-list DDL, e.g. ``"h BIGINT"``.

    This is the documented by-hand recovery path, so every interpolated
    fragment is validated before it reaches the DDL string: identifiers
    are backtick-quoted (plain-identifier grammar enforced), the path may
    not contain quotes, and ``columns_sql`` may not smuggle statement
    punctuation."""
    if "'" in path or '"' in path:
        raise ValueError(f"path may not contain quote characters: {path!r}")
    _validate_columns_sql(columns_sql)
    cluster = ", ".join(_quote_ident(c) for c in bucket_cols)
    spark.sql(
        f"CREATE TABLE {_quote_ident(table)} ({columns_sql}) USING parquet "
        f"CLUSTERED BY ({cluster}) SORTED BY ({cluster}) "
        f"INTO {int(n_buckets)} BUCKETS LOCATION '{path}'"
    )
    return spark.table(table)


def _excise_spans(base: DataFrame, spans: DataFrame) -> DataFrame:
    """(id, text, n_tokens, removed_tokens) — rebuild every document of
    ``base`` (id, l, n_tokens) with all 1-based token positions inside any
    ``spans`` interval [span_start, span_end] cut out, WITHOUT exploding
    the token stream: the merged spans collect to one per-doc array (a
    document has few MAXIMAL spans — they are disjoint by construction),
    equi-join back to ``base`` on the doc id, and one in-row
    filter-by-index higher-order function keeps the surviving tokens in
    their original order. Versus the position-explode form it replaced
    (explode every removed [i, i+k-1] position, distinct, anti-join the
    posexploded token stream, re-sort per doc — 13.8 s vs 4.2 s at the
    adversarial 16x-replication smoke on the symmetric rewrite,
    byte-identical output): no k-fold position fan-out, no corpus-sized
    position distinct, no token-stream anti-join, no per-doc re-sort
    window — the only shuffled rows are tile starts and span structs.
    Per-row cost is n_tokens × n_spans short-circuit interval tests.
    Output is byte-identical (same positions removed: the union of merged
    maximal spans IS the union of the [i, i+k-1] tiles they merged)."""
    spans_arr = spans.groupBy("id").agg(
        F.expr("array_sort(collect_list(struct(span_start, span_end)))").alias("sp"),
        F.sum("span_tokens").cast("bigint").alias("removed_tokens"),
    )
    return base.join(spans_arr, "id", "left").select(
        "id",
        F.when(F.col("sp").isNull(), F.concat_ws(" ", F.col("l")))
        .otherwise(
            F.expr(
                "concat_ws(' ', filter(l, (tok, p0) -> NOT exists(sp,"
                " s -> p0 + 1 >= s.span_start AND p0 + 1 <= s.span_end)))"
            )
        )
        .alias("text"),
        "n_tokens",
        F.coalesce("removed_tokens", F.lit(0)).cast("bigint").alias("removed_tokens"),
    )


def incremental_substring_dedup(
    corpus_df: DataFrame | None,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, removed_tokens, kept_tokens, removed_bp) — the
    exact-substring survivorship ledger for a NEW batch probed against an
    EXISTING corpus, without re-deduplicating the corpus.

    The incremental twin of :func:`substring_dedup_survivors` — the
    daily-crawl shape ``operators/incremental.py`` gives MinHash, applied
    to the exact-substring tier (Lee et al. ACL'22): the historical corpus
    reduces to its DISTINCT ``k``-token tile-hash set (at 100 TB this is
    the PERSISTED canonical-tile index — one hash aggregate when first
    built, then a stored table bucketed on the hash; the history is never
    rescanned per batch), the batch's tile occurrences equi-join that
    index, and matched positions merge into maximal spans per batch
    document (doc-keyed windows). The corpus side always holds the
    canonical copy — every batch occurrence of an indexed tile is
    removable — so no survivorship tiebreak crosses the boundary; a batch
    document sharing a run of length L >= k with ANY corpus document has
    the full [start, start+L-1] span excised, while L < k overlaps are
    invisible by design (the memorization-hazard threshold k encodes).
    Batch-INTERNAL duplication is deliberately out of scope here: it is
    the symmetric tier (``substring_dedup_survivors``) run on the batch
    alone, and a pipeline chains the two.

    Scale shape: candidate volume scales with the BATCH (tile joins key on
    the hash; the index side is pre-distinct), mirroring
    ``incremental_near_dup``'s band-bucket probe posture.

    Pass ``index_df`` (a :func:`build_substring_index` frame, usually read
    back from the persisted bucketed table via
    :func:`read_substring_index`) to probe WITHOUT touching the corpus
    text at all — ``corpus_df`` may then be ``None``. Without it, the
    index is recomputed from ``corpus_df`` inline (the self-contained
    registry form).
    """
    index = _resolve_substring_index(corpus_df, id_col, text_col, k, index_df)
    base, occ = _substring_occurrences(batch_df, id_col, text_col, k)
    rem = occ.join(index, "h").select("id", "i").distinct()
    removed = _merge_spans(rem, k).groupBy("id").agg(
        F.sum("span_tokens").alias("removed_tokens")
    )
    return (
        base.select("id", "n_tokens")
        .join(removed, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("removed_tokens", F.lit(0)).cast("bigint").alias("removed_tokens"),
            (F.col("n_tokens") - F.coalesce("removed_tokens", F.lit(0)))
            .cast("bigint")
            .alias("kept_tokens"),
            F.expr("(10000 * coalesce(removed_tokens, 0)) div greatest(n_tokens, 1)").alias(
                "removed_bp"
            ),
        )
    )


def _resolve_substring_index(
    corpus_df: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int,
    index_df: DataFrame | None,
) -> DataFrame:
    """The probe functions' shared index resolution: a supplied prebuilt
    index wins (corpus text untouched); otherwise build inline from the
    corpus. Supplying neither is a usage error."""
    if index_df is not None:
        return index_df.select("h")
    if corpus_df is None:
        raise ValueError(
            "incremental substring probe needs either corpus_df or index_df"
        )
    return build_substring_index(corpus_df, id_col, text_col, k)


def incremental_substring_rewrite(
    corpus_df: DataFrame | None,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """(id, text, n_tokens, removed_tokens) — the NEW batch with every
    occurrence of a corpus-indexed ``k``-token run EXCISED from its text:
    the output a crawl pipeline actually appends to the training corpus.

    The rewrite companion of :func:`incremental_substring_dedup` (same
    probe: history reduces once to its distinct tile-hash index, batch
    occurrences equi-join it; same ``index_df`` knob for probing the
    persisted index without touching corpus text), with the shared
    per-SPAN excision tail (``_excise_spans``): matched tile starts merge
    into maximal spans per document first, and tokens are filtered
    in-row — the batch token stream is never exploded or shuffled.
    Fully-indexed batch documents empty rather than vanish, so the batch
    row set is stable.
    """
    index = _resolve_substring_index(corpus_df, id_col, text_col, k, index_df)
    base, occ = _substring_occurrences(batch_df, id_col, text_col, k)
    rem = occ.join(index, "h").select("id", "i").distinct()
    return _excise_spans(base, _merge_spans(rem, k))


def cross_corpus_contamination_spans(
    test_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 13,
) -> DataFrame:
    """(id, span_start, span_end, span_tokens) — maximal spans of each TEST
    document covered by a ``k``-token run that appears verbatim anywhere in
    the TRAIN corpus.

    The GPT-3 decontamination tier (Brown et al. 2020, appendix C: 13-gram
    overlap against the training set, contaminated spans removed from eval
    sets): where substring_dedup_spans is symmetric within one corpus, this
    is the ASYMMETRIC probe an eval-suite pipeline runs before trusting a
    benchmark number. Scale shape: the train side reduces to its DISTINCT
    tile-hash set via one hash aggregate (map-side distinct on (doc, hash)
    is skipped — only hash identity matters, so the distinct is on the
    hash alone, strictly smaller); test occurrences equi-join that set and
    merge per-document (doc-keyed windows). Train tiles are corpus-scale
    but the join keys on the hash — never all-pairs, and the test side is
    typically orders of magnitude smaller.
    """
    _, test_occ = _substring_occurrences(test_df, id_col, text_col, k)
    _, train_occ = _substring_occurrences(train_df, id_col, text_col, k)
    train_tiles = train_occ.select("h").distinct()
    hits = test_occ.join(train_tiles, "h").select("id", "i").distinct()
    return _merge_spans(hits, k)
