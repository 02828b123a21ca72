"""Invariant tests for the newest training-pipeline queries.

The oracle-parity test already proves value equality with DuckDB; these pin
the STRUCTURAL guarantees downstream consumers rely on (funnel monotonicity,
chunk tiling, sample-size bounds) so a future refactor that happens to agree
with a refactored oracle still can't break the contract.
"""

from __future__ import annotations

from collections import defaultdict

from map_reduce_engine_spark.queries import REGISTRY


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
