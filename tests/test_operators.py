"""Operator-level tests: dedup quality, similarity recall, multimodal
plumbing, and property-based wordcount (hypothesis)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_engine_spark.io import read_table
from map_reduce_engine_spark.operators import (
    cosine_topk,
    ann_topk,
    ivf_topk,
    dedup_exact,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash,
    wordcount,
)
from map_reduce_engine_spark.operators.multimodal import (
    attach_media_meta,
    extract_features,
    frame_sample_plan,
)


# ---------------------------------------------------------------- dedup


def test_dedup_exact_deterministic_survivor(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out1 = {r.doc_id for r in dedup_exact(docs, ["text"], ["doc_id"]).collect()}
    out2 = {r.doc_id for r in dedup_exact(docs.repartition(13), ["text"], ["doc_id"]).collect()}
    assert out1 == out2  # survivor choice independent of partitioning
    n_distinct = docs.select("text").distinct().count()
    assert len(out1) == n_distinct


def test_minhash_candidates_superset_of_exact_dups(spark, sf_dir):
    """Exact duplicates have identical signatures → every band collides →
    they MUST appear among LSH candidates."""
    docs = read_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    dup_pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.text") == F.col("b.text"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    cands = minhash_candidate_pairs(sigs, bands=16, rows_per_band=4)
    missing = dup_pairs.join(cands, ["id1", "id2"], "left_anti").count()
    assert missing == 0


def test_results_invariant_under_repartitioning(spark, sf_dir):
    """Partitioning is an execution detail — dedup survivors, MinHash
    signatures, and SimHash sketches must be identical whether the input
    arrives in 1 partition or 16 (the AddInterface merge-associativity
    contract, SURVEY.md A11, generalized)."""
    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators import dedup as dd

    docs = read_table(spark, sf_dir, "documents").where(F.trim("text") != "")

    def survivors(shaped):
        return {
            r.doc_id
            for r in dd.dedup_exact(shaped, subset=["text"], order_by=["doc_id"]).collect()
        }

    assert survivors(docs.coalesce(1)) == survivors(docs.repartition(16))
    sig1 = {
        (r.id, tuple(r.sig))
        for r in dd.minhash_signatures(docs.coalesce(1), "doc_id", "text", 16).collect()
    }
    sig16 = {
        (r.id, tuple(r.sig))
        for r in dd.minhash_signatures(docs.repartition(16), "doc_id", "text", 16).collect()
    }
    assert sig1 == sig16


def test_shingles_are_order_sensitive(spark):
    """Two texts with identical vocabulary in different order: token-set
    Jaccard is 1.0 (indistinguishable) but shingle Jaccard must drop —
    the reason shingled MinHash is the classic near-dup formulation."""
    from map_reduce_engine_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "f e d c b a")], "doc_id BIGINT, text STRING"
    )
    pairs = spark.createDataFrame([(1, 2)], "id1 BIGINT, id2 BIGINT")
    tok = dd.jaccard_pairs(df, "doc_id", "text", 0.0, candidates=pairs).collect()[0]
    shi = dd.jaccard_pairs(df, "doc_id", "text", 0.0, candidates=pairs, shingle_n=3).collect()[0]
    assert tok.jaccard == 1.0
    assert shi.jaccard == 0.0  # no common 3-gram between the two orders

    # shingled signatures of the two docs must differ (token ones cannot)
    sig = {r.id: tuple(r.sig) for r in dd.minhash_signatures(df, "doc_id", "text", 16, shingle_n=3).collect()}
    assert sig[1] != sig[2]
    sig_tok = {r.id: tuple(r.sig) for r in dd.minhash_signatures(df, "doc_id", "text", 16).collect()}
    assert sig_tok[1] == sig_tok[2]


def test_connected_components_transitive(spark):
    """A path graph (1-2, 2-3, 3-4) plus a disjoint edge (10-11) must yield
    two components with min-id labels — proves transitive closure beyond
    the clique case the oracle covers."""
    from map_reduce_engine_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id1 BIGINT, id2 BIGINT"
    )
    got = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_scd2_and_merge_delete(spark):
    from map_reduce_engine_spark.operators import cdc

    dim = spark.createDataFrame(
        [
            (1, "alice", "2020-01-01", None, True),
            (2, "bob", "2020-01-01", None, True),
            (2, "rob", "2019-01-01", "2020-01-01", False),  # prior version
        ],
        "k INT, name STRING, valid_from STRING, valid_to STRING, is_current BOOLEAN",
    )
    updates = spark.createDataFrame(
        [(2, "bobby", "2021-06-01")], "k INT, name STRING, eff STRING"
    )
    out = cdc.scd2_apply(dim, updates, key="k", effective_col="eff").collect()
    rows = {(r.k, r.name): (r.valid_from, r.valid_to, r.is_current) for r in out}
    assert rows[(1, "alice")] == ("2020-01-01", None, True)        # untouched current
    assert rows[(2, "rob")] == ("2019-01-01", "2020-01-01", False)  # old history kept
    assert rows[(2, "bob")] == ("2020-01-01", "2021-06-01", False)  # closed out
    assert rows[(2, "bobby")] == ("2021-06-01", None, True)         # new current
    assert len(rows) == 4

    target = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k INT, v STRING")
    tomb = spark.createDataFrame([(2,)], "k INT")
    left = {r.k for r in cdc.merge_delete(target, tomb, ["k"]).collect()}
    assert left == {1, 3}


def test_minhash_signatures_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    s1 = {(r.id, tuple(r.sig)) for r in minhash_signatures(docs, "doc_id", "text").collect()}
    s2 = {(r.id, tuple(r.sig)) for r in minhash_signatures(docs.repartition(7), "doc_id", "text").collect()}
    assert s1 == s2  # deterministic under partitioning


def test_simhash_identical_texts_equal_sketches(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "totally different words here")],
        ["id", "text"],
    )
    out = {r.id: r.simhash for r in simhash(df, "id", "text").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


# ---------------------------------------------------------------- similarity


def test_ann_recall_against_brute_force(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ann_topk(emb, queries, "vec_id", "embedding", k=5, n_planes=6)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 6 planes + Hamming-1 multi-probe on 64-dim near-uniform vectors;
    # the contract is approximate — quality, not equality.
    assert recall >= 0.3, f"ANN recall collapsed: {recall}"
    # every approx neighbor must be a real corpus vector, never the query itself
    assert all(q != n for q, n in approx_set)


def test_ivf_recall_against_brute_force(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_cells=16, n_probe=4)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 4/16 cells; centroids adapt to the corpus so recall should
    # beat data-independent LSH at comparable candidate volume
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"
    assert all(q != n for q, n in approx_set)


def test_int8_quantization_preserves_cosine(spark, sf_dir):
    """int8 quantization must keep pairwise cosine within 2% absolute of the
    float value (the storage/bandwidth-for-accuracy trade at 100 TB)."""
    from map_reduce_engine_spark.operators.similarity import (
        cosine_int8,
        cosine_topk,
        quantize_int8,
    )

    emb = read_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    q = quantize_int8(emb, "embedding")
    # quantized schema: tinyint array + one float scale
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    a = q.select(F.col("vec_id").alias("id1"), F.col("qvec").alias("v1"), F.col("qscale").alias("s1"))
    b = q.select(F.col("vec_id").alias("id2"), F.col("qvec").alias("v2"), F.col("qscale").alias("s2"))
    pairs = a.crossJoin(b).where(F.col("id1") < F.col("id2")).select(
        "id1", "id2", cosine_int8(F.col("v1"), F.col("s1"), F.col("v2"), F.col("s2")).alias("qcos")
    )
    exact = cosine_topk(emb, emb, "vec_id", "embedding", k=49)
    ex = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    for r in pairs.collect():
        want = ex.get((r.id1, r.id2)) or ex.get((r.id2, r.id1))
        assert want is not None
        assert abs(r.qcos - want) < 0.02, (r.id1, r.id2, r.qcos, want)


def test_cosine_topk_self_excluded_and_k_bounded(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    out = cosine_topk(emb, queries, "vec_id", "embedding", k=7).collect()
    per_q = Counter(r.query_id for r in out)
    assert all(v <= 7 for v in per_q.values())
    assert all(r.query_id != r.neighbor_id for r in out)
    assert all(-1.000001 <= r.cosine <= 1.000001 for r in out)


# ---------------------------------------------------------------- multimodal


def test_media_meta_and_features(spark):
    df = spark.createDataFrame([(1, b"payload-bytes"), (2, b"")], ["id", "payload"])
    meta = attach_media_meta(df, "payload", kind="image", mime="image/png")
    rows = {r.id: r.media for r in meta.collect()}
    assert rows[1].n_bytes == len(b"payload-bytes")
    assert rows[1].kind == "image" and rows[1].mime == "image/png"
    assert len(rows[1].sha256) == 64
    feats = {r.id: r.features for r in extract_features(df, "id", "payload").collect()}
    assert len(feats[1]) == 8
    assert all(0.0 <= v <= 1.0 for v in feats[1])
    # deterministic fake: same payload → same features
    feats2 = {r.id: r.features for r in extract_features(df, "id", "payload").collect()}
    assert feats == feats2


def test_real_decoder_is_stubbed(spark):
    df = spark.createDataFrame([(1, b"x")], ["id", "payload"])
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(df, "id", "payload", decoder="image").collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"x" * 5000)], ["id", "payload"])
    rows = frame_sample_plan(df, "id", "payload", every_n=2).collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]


# ---------------------------------------------------------------- property


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab -\t", min_size=0, max_size=30),
        min_size=0,
        max_size=20,
    )
)
def test_wordcount_property(spark_global, lines):
    """wordcount(engine) == collections.Counter(tokens) for arbitrary
    whitespace-ridden input (SURVEY.md §5 property 3)."""
    golden = Counter(w for line in lines for w in line.split())
    if lines:
        df = spark_global.createDataFrame([(s,) for s in lines], "value string")
    else:
        df = spark_global.createDataFrame([], "value string")
    got = {r.word: r.cnt for r in wordcount(df, "value").collect()}
    assert got == dict(golden)


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def test_pagerank_two_cycle_converges_to_one(spark):
    """A ⇄ B: rank = 0.15 + 0.85*rank fixpoint → 1.0 for both."""
    from map_reduce_engine_spark.operators import pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(e, iterations=30).collect()}
    assert got.keys() == {"a", "b"}
    for v in got.values():
        assert abs(v - 1.0) < 1e-6


def test_pagerank_chain_closed_form(spark):
    """a → b: a has no in-links (rank 0.15); b = 0.15 + 0.85*0.15."""
    from map_reduce_engine_spark.operators import pagerank

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(e, iterations=10).collect()}
    assert abs(got["a"] - 0.15) < 1e-9
    assert abs(got["b"] - (0.15 + 0.85 * 0.15)) < 1e-9


def test_pagerank_star_ranks_hub_highest(spark):
    """Three spokes pointing at a hub: the hub out-ranks every spoke."""
    from map_reduce_engine_spark.operators import pagerank

    e = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub")], ["src", "dst"]
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=10).collect()}
    assert got["hub"] > got["s1"] == got["s2"] == got["s3"]
    assert abs(got["hub"] - (0.15 + 0.85 * 3 * 0.15)) < 1e-9


def test_resize_images_batch_plumbing(spark):
    """Stubbed resize: deterministic output bytes, exact target-dim length,
    Arrow-batched (no row pickling) — the plumbing a PIL decode drops into."""
    from map_reduce_engine_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"imgbytes-1"), (2, b"imgbytes-2")], ["doc_id", "payload"]
    )
    out = resize_images(df, "doc_id", "payload", width=32, height=32).collect()
    assert {r.id for r in out} == {1, 2}
    for r in out:
        assert (r.width, r.height) == (32, 32)
        assert len(r.payload) == (32 * 32) // 64
    # determinism: same payload → same resized bytes
    again = {r.id: bytes(r.payload) for r in resize_images(df, "doc_id", "payload", 32, 32).collect()}
    assert {r.id: bytes(r.payload) for r in out} == again


def test_audio_chunk_plan_windows(spark):
    """30 s chunking over a 75 s blob: 3 windows, last one clipped, byte
    ranges contiguous and bounded by the payload size."""
    from map_reduce_engine_spark.operators.multimodal import audio_chunk_plan

    bps = 16_000 * 2
    payload = b"\0" * (75 * bps)  # 75 seconds of fake PCM
    df = spark.createDataFrame([(7, payload)], ["doc_id", "payload"])
    rows = sorted(
        audio_chunk_plan(df, "doc_id", "payload").collect(), key=lambda r: r.chunk_idx
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert [(r.start_s, r.end_s) for r in rows] == [(0, 30.0), (30, 60.0), (60, 75.0)]
    assert rows[0].byte_start == 0 and rows[-1].byte_end == 75 * bps
    for a, b in zip(rows, rows[1:]):
        assert a.byte_end == b.byte_start


def test_cms_sketch_overestimates_and_bounded(spark):
    """CMS invariants: every point estimate >= the true count, the counter
    grid never exceeds depth*width rows, and the grid total per depth row
    equals the number of item occurrences (additive counters)."""
    from map_reduce_engine_spark.operators.sketch import cms_point_estimates, cms_table

    items = spark.createDataFrame(
        [(w,) for w in (["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 5 + ["delta"] * 1)],
        ["token"],
    )
    sketch = cms_table(items, "token", depth=4, width=64).cache()
    assert sketch.count() <= 4 * 64
    per_depth = {r.d: r.total for r in sketch.groupBy("d").agg(F.sum("c").alias("total")).collect()}
    assert per_depth == {0: 86, 1: 86, 2: 86, 3: 86}
    probes = items.select("token").distinct()
    est = {
        r.item: r.cms_estimate
        for r in cms_point_estimates(sketch, probes, "token", depth=4, width=64).collect()
    }
    truth = {"alpha": 50, "beta": 30, "gamma": 5, "delta": 1}
    for tok, n in truth.items():
        assert est[tok] >= n


def test_repeated_span_coverage_exact_counts(spark):
    """Known-answer check: docs 1 and 2 share one exact 8-token span, doc 3
    shares nothing — coverage counts exactly the shared span's positions."""
    from map_reduce_engine_spark.operators.dedup import repeated_span_coverage

    span = "a b c d e f g h"  # 8 shared tokens
    df = spark.createDataFrame(
        [
            (1, f"{span} x1 y1 z1"),          # 11 tokens, 8 covered
            (2, f"p2 q2 {span}"),             # 10 tokens, 8 covered
            (3, "unique words only here none repeated at all now ok"),  # 10, 0
        ],
        ["doc_id", "text"],
    )
    got = {
        r.id: (r.n_tokens, r.covered_tokens, r.coverage_bp)
        for r in repeated_span_coverage(df, "doc_id", "text", k=8).collect()
    }
    assert got[1] == (11, 8, 10000 * 8 // 11), got
    assert got[2] == (10, 8, 8000), got
    assert got[3] == (10, 0, 0), got


def test_substring_dedup_k50_catches_60_not_40(spark):
    """The exact-substring tier's defining property (Lee et al. ACL'22): a
    planted 60-token verbatim copy inside two otherwise-distinct documents
    is caught at k=50 — with the FULL 60-token span recovered exactly from
    the merged tile islands — while a 40-token overlap (below k) is
    invisible by design."""
    from map_reduce_engine_spark.operators.dedup import (
        substring_dedup_spans,
        substring_dedup_survivors,
    )

    shared60 = " ".join(f"s{i}" for i in range(60))
    shared40 = " ".join(f"t{i}" for i in range(40))
    pre_a = " ".join(f"a{i}" for i in range(10))
    post_b = " ".join(f"b{i}" for i in range(15))
    df = spark.createDataFrame(
        [
            # doc 1: 10 unique + 60 shared -> span must be [11, 70]
            (1, f"{pre_a} {shared60}"),
            # doc 2: 60 shared + 15 unique -> span must be [1, 60]
            (2, f"{shared60} {post_b}"),
            # docs 3/4 share only a 40-token run: below k=50, invisible
            (3, f"{shared40} " + " ".join(f"c{i}" for i in range(20))),
            (4, " ".join(f"d{i}" for i in range(20)) + f" {shared40}"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r.id: (r.span_start, r.span_end, r.span_tokens)
        for r in substring_dedup_spans(df, "doc_id", "text", k=50).collect()
    }
    assert spans == {1: (11, 70, 60), 2: (1, 60, 60)}, spans

    # Survivorship: doc 1 (smallest id) keeps its copy; doc 2 sheds the
    # full 60-token span; docs 3/4 keep everything.
    surv = {
        r.id: (r.n_tokens, r.removed_tokens, r.kept_tokens, r.removed_bp)
        for r in substring_dedup_survivors(df, "doc_id", "text", k=50).collect()
    }
    assert surv[1] == (70, 0, 70, 0), surv
    assert surv[2] == (75, 60, 15, 10000 * 60 // 75), surv
    assert surv[3] == (60, 0, 60, 0) and surv[4] == (60, 0, 60, 0), surv

    # Rewrite: doc 2's shared block is EXCISED (its unique suffix survives
    # in order), doc 1 (canonical) and docs 3/4 pass through verbatim.
    from map_reduce_engine_spark.operators.dedup import substring_dedup_rewrite

    rw = {
        r.id: (r.text, r.n_tokens, r.removed_tokens)
        for r in substring_dedup_rewrite(df, "doc_id", "text", k=50).collect()
    }
    assert rw[1] == (f"{pre_a} {shared60}", 70, 0), rw[1]
    assert rw[2] == (post_b, 75, 60), rw[2]
    assert rw[3][2] == 0 and rw[4][2] == 0

    # a document that is NOTHING but a duplicated span empties, not vanishes
    df2 = spark.createDataFrame(
        [(1, f"{pre_a} {shared60}"), (2, shared60)], ["doc_id", "text"]
    )
    rw2 = {
        r.id: (r.text, r.removed_tokens)
        for r in substring_dedup_rewrite(df2, "doc_id", "text", k=50).collect()
    }
    assert rw2[2] == ("", 60) and rw2[1][1] == 0, rw2


@pytest.mark.indexes
def test_incremental_substring_dedup_probes_corpus_index(spark):
    """The batch-vs-corpus probe (VERDICT r07 ask #2): a batch document
    sharing a 60-token run with the CORPUS is excised (full span), a
    40-token overlap (below k=50) survives untouched, batch-internal
    duplication is out of scope (two batch docs sharing 60 tokens absent
    from the corpus keep everything), and the history side is never
    reported."""
    from map_reduce_engine_spark.operators.dedup import incremental_substring_dedup

    shared60 = " ".join(f"s{i}" for i in range(60))
    shared40 = " ".join(f"t{i}" for i in range(40))
    batch_only60 = " ".join(f"u{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(10)) + f" {shared60}"),
            (2, f"{shared40} " + " ".join(f"b{i}" for i in range(20))),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # shares the 60-run with corpus doc 1 -> full span excised
            (10, f"{shared60} " + " ".join(f"c{i}" for i in range(15))),
            # shares only 40 tokens with corpus doc 2 -> invisible at k=50
            (11, " ".join(f"d{i}" for i in range(20)) + f" {shared40}"),
            # batch-internal pair, absent from the corpus -> untouched here
            (12, batch_only60),
            (13, f"{batch_only60} " + " ".join(f"e{i}" for i in range(5))),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.id: (r.n_tokens, r.removed_tokens, r.kept_tokens, r.removed_bp)
        for r in incremental_substring_dedup(
            corpus, batch, "doc_id", "text", k=50
        ).collect()
    }
    assert set(got) == {10, 11, 12, 13}, got  # corpus docs never reported
    assert got[10] == (75, 60, 15, 10000 * 60 // 75), got
    assert got[11] == (60, 0, 60, 0), got
    assert got[12] == (60, 0, 60, 0) and got[13] == (65, 0, 65, 0), got

    # the REWRITE leg: doc 10's shared block excised (unique suffix
    # survives in order), everything else passes through verbatim
    from map_reduce_engine_spark.operators.dedup import incremental_substring_rewrite

    rw = {
        r.id: (r.text, r.n_tokens, r.removed_tokens)
        for r in incremental_substring_rewrite(
            corpus, batch, "doc_id", "text", k=50
        ).collect()
    }
    assert set(rw) == {10, 11, 12, 13}, rw
    assert rw[10] == (" ".join(f"c{i}" for i in range(15)), 75, 60), rw[10]
    assert rw[11][2] == 0 and rw[12][2] == 0 and rw[13][2] == 0
    assert rw[12][0] == batch_only60


@pytest.mark.indexes
def test_substring_index_build_persist_probe_roundtrip(spark, tmp_path):
    """The canonical-tile index's persist-and-probe contract (VERDICT r08
    ask #2, executable): build writes the distinct tile-hash set as a
    parquet table BUCKETED on h; the probe reads THAT table with
    corpus_df=None — the corpus text is structurally out of reach — and
    both incremental legs match the inline form row-for-row. Supplying
    neither corpus nor index is a usage error."""
    import pytest

    from map_reduce_engine_spark.operators.dedup import (
        build_substring_index,
        incremental_substring_dedup,
        incremental_substring_rewrite,
        read_substring_index,
        write_substring_index,
    )

    shared60 = " ".join(f"s{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(10)) + f" {shared60}"),
            (2, " ".join(f"b{i}" for i in range(55))),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, f"{shared60} " + " ".join(f"c{i}" for i in range(15))),
            (11, " ".join(f"d{i}" for i in range(70))),
        ],
        ["doc_id", "text"],
    )
    idx = build_substring_index(corpus, "doc_id", "text", k=50)
    write_substring_index(
        idx, "tile_index_roundtrip_test", path=str(tmp_path / "tile_index"), n_buckets=4
    )
    try:
        stored = read_substring_index(spark, "tile_index_roundtrip_test")
        cols = {c.name: c for c in spark.catalog.listColumns("tile_index_roundtrip_test")}
        assert "h" in cols and cols["h"].isBucket  # bucket spec survived
        assert sorted(r.h for r in stored.collect()) == sorted(
            r.h for r in idx.collect()
        )
        led_stored = incremental_substring_dedup(
            None, batch, "doc_id", "text", k=50, index_df=stored
        )
        led_inline = incremental_substring_dedup(corpus, batch, "doc_id", "text", k=50)
        assert sorted(map(tuple, led_stored.collect())) == sorted(
            map(tuple, led_inline.collect())
        )
        rw_stored = incremental_substring_rewrite(
            None, batch, "doc_id", "text", k=50, index_df=stored
        )
        rw_inline = incremental_substring_rewrite(corpus, batch, "doc_id", "text", k=50)
        assert sorted(map(tuple, rw_stored.collect())) == sorted(
            map(tuple, rw_inline.collect())
        )
        with pytest.raises(ValueError, match="corpus_df or index_df"):
            incremental_substring_dedup(None, batch, "doc_id", "text", k=50)
    finally:
        spark.sql("DROP TABLE IF EXISTS tile_index_roundtrip_test")


@pytest.mark.indexes
def test_ivf_index_build_persist_probe_roundtrip(spark, sf_dir, tmp_path):
    """The ANN sibling of the tile/band index contract: the trained IVF
    index (centroids + cell assignment) persists as a cell-bucketed table
    plus a centroid companion; serving queries through the STORED index
    (corpus=None — no retrain, no re-assignment) yields exactly the inline
    result, because the training sample is content-deterministic."""
    import pytest
    from pyspark.sql import functions as SF

    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.similarity import (
        ivf_topk,
        ivf_train_assign,
        read_ivf_index,
        write_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(SF.col("vec_id") < 5)
    centers, cb = ivf_train_assign(emb, "vec_id", "embedding", n_cells=16)
    write_ivf_index(
        centers, cb, "ivf_index_roundtrip_test", path=str(tmp_path / "ivf_index")
    )
    try:
        stored = read_ivf_index(spark, "ivf_index_roundtrip_test")
        assert [list(c) for c in stored[0]] == [list(c) for c in centers]
        cols = {c.name: c for c in spark.catalog.listColumns("ivf_index_roundtrip_test")}
        assert cols["cell"].isBucket
        via_stored = sorted(
            map(
                tuple,
                ivf_topk(
                    None, queries, "vec_id", "embedding", k=5, n_probe=4, index=stored
                ).collect(),
            )
        )
        inline = sorted(
            map(
                tuple,
                ivf_topk(
                    emb, queries, "vec_id", "embedding", k=5, n_cells=16, n_probe=4
                ).collect(),
            )
        )
        assert via_stored == inline and via_stored
        with pytest.raises(ValueError, match="corpus or index"):
            ivf_topk(None, queries, "vec_id", "embedding", k=5)
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_index_roundtrip_test")
        spark.sql("DROP TABLE IF EXISTS ivf_index_roundtrip_test_centroids")


@pytest.mark.indexes
def test_ivf_roll_forward_matches_full_assign_and_iterates(spark, sf_dir, tmp_path):
    """The ANN tier's mergeable-state story (VERDICT r09 #3): rolling an
    appended batch into a stored IVF index — batch-only assignment against
    the STORED centroids, unioned on — yields exactly the index a full
    re-assignment of history+batch with the same centroids would, probe
    results included; day-2 rolls iterate; a re-run of the same day cannot
    duplicate entries; and the staleness diagnostic flags a retrain when
    the corpus outgrows the trained cell count."""
    from pyspark.sql import functions as SF

    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_roll_forward,
        ivf_staleness,
        ivf_topk,
        ivf_train_assign,
        read_ivf_index,
        write_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    hist = emb.where(SF.col("vec_id") < 300)
    day1 = emb.where((SF.col("vec_id") >= 300) & (SF.col("vec_id") < 400))
    day2 = emb.where(SF.col("vec_id") >= 400)
    queries = emb.where(SF.col("vec_id") < 5)

    index = ivf_train_assign(hist, "vec_id", "embedding", n_cells=8)
    rolled1 = ivf_roll_forward(index, day1, "vec_id", "embedding")
    # stored-vs-inline equality: the rolled assignment == assigning
    # hist∪day1 wholesale against the SAME centroids
    full1 = ivf_assign(
        index[0], hist.unionByName(day1), "vec_id", "embedding"
    )
    key = lambda df: sorted(  # noqa: E731
        (r.neighbor_id, r.cell, round(r.cnorm, 9)) for r in df.collect()
    )
    assert key(rolled1[1]) == key(full1)
    assert rolled1[0] is index[0]  # centroids untouched — no retrain
    # probe equality through the rolled index
    got = sorted(map(tuple, ivf_topk(
        None, queries, "vec_id", "embedding", k=5, n_probe=3, index=rolled1
    ).collect()))
    want = sorted(map(tuple, ivf_topk(
        None, queries, "vec_id", "embedding", k=5, n_probe=3,
        index=(index[0], full1),
    ).collect()))
    assert got == want and got
    # day-2 iteration + re-run guard: repeating day1 adds NOTHING
    rolled2 = ivf_roll_forward(rolled1, day2, "vec_id", "embedding")
    assert rolled2[1].count() == emb.count()
    rerun = ivf_roll_forward(rolled2, day1, "vec_id", "embedding")
    assert rerun[1].count() == emb.count()
    # the rolled index persists like any other (write path unchanged)
    write_ivf_index(
        rolled2[0], rolled2[1], "ivf_rolled_test", path=str(tmp_path / "ivf_rolled")
    )
    try:
        stored = read_ivf_index(spark, "ivf_rolled_test")
        assert stored[1].count() == emb.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_rolled_test")
    # staleness: 8 cells hold sf-fixture embeddings comfortably at the
    # default bound; shrinking rows_per_cell below n/8 forces capacity
    # retrain; a tiny skew_factor trips the skew trigger independently
    fresh = ivf_staleness(rolled2)
    assert fresh["n_vectors"] == emb.count() and not fresh["capacity_exceeded"]
    due = ivf_staleness(rolled2, rows_per_cell=max(1, emb.count() // 64))
    assert due["cells_needed"] > 8 and due["capacity_exceeded"] and due["retrain_due"]
    skew = ivf_staleness(rolled2, rows_per_cell=1, skew_factor=1)
    assert skew["skewed"] and skew["retrain_due"]


@pytest.mark.indexes
def test_register_bucketed_table_recovers_dropped_index(spark, tmp_path):
    """Catalog-loss recovery: dropping an external index table leaves its
    bucketed parquet files intact, and register_bucketed_table restores
    the registration (bucket spec included) with metadata-only DDL — the
    stored-probe result is identical before and after the recovery."""
    from map_reduce_engine_spark.operators.dedup import (
        build_substring_index,
        incremental_substring_dedup,
        read_substring_index,
        register_bucketed_table,
        write_substring_index,
    )

    shared = " ".join(f"s{i}" for i in range(60))
    corpus = spark.createDataFrame([(1, shared)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, f"{shared} " + " ".join(f"c{i}" for i in range(10)))],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "recoverable_idx")
    write_substring_index(
        build_substring_index(corpus, "doc_id", "text", k=50),
        "recoverable_idx_test",
        path=path,
        n_buckets=4,
    )
    try:
        before = sorted(
            map(
                tuple,
                incremental_substring_dedup(
                    None,
                    batch,
                    "doc_id",
                    "text",
                    k=50,
                    index_df=read_substring_index(spark, "recoverable_idx_test"),
                ).collect(),
            )
        )
        # the catalog entry dies (external table -> files survive) ...
        spark.sql("DROP TABLE recoverable_idx_test")
        # ... and the DDL re-registration restores spec + content
        restored = register_bucketed_table(
            spark, "recoverable_idx_test", path, "h BIGINT", ["h"], n_buckets=4
        )
        cols = {c.name: c for c in spark.catalog.listColumns("recoverable_idx_test")}
        assert cols["h"].isBucket
        after = sorted(
            map(
                tuple,
                incremental_substring_dedup(
                    None, batch, "doc_id", "text", k=50, index_df=restored
                ).collect(),
            )
        )
        # identical results, and the probe genuinely excised the shared run
        assert after == before and before[0][2] == 60, before
    finally:
        spark.sql("DROP TABLE IF EXISTS recoverable_idx_test")


@pytest.mark.indexes
def test_roll_forward_guard_semantics_and_plan(spark, tmp_path):
    """The daily dedup guard never moves the stored side: correct rows
    (new minus already-stored keys; a full re-run yields nothing) AND a
    plan made of two broadcast hash joins — no sort-merge join, no hash
    exchange of the stored table (LeftAnti could only broadcast its right
    side, so the naive anti would shuffle the corpus-sized index)."""
    from map_reduce_engine_spark.operators.dedup import roll_forward_guard

    stored_path = str(tmp_path / "stored_idx")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 101)], ["id", "payload"]
    ).write.parquet(stored_path)
    stored = spark.read.parquet(stored_path)
    new = spark.createDataFrame(
        [(99, "re-run"), (100, "re-run"), (101, "fresh"), (102, "fresh")],
        ["id", "payload"],
    )
    guarded = roll_forward_guard(new, stored, ["id"])
    assert sorted(r.id for r in guarded.collect()) == [101, 102]
    # a pure re-run (everything already stored) contributes nothing
    rerun = roll_forward_guard(new.where("id <= 100"), stored, ["id"])
    assert rerun.count() == 0
    # AQE prints Final + Initial plans; assert on the final one only
    plan = (
        guarded._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan  # semi probe + anti
    assert "SortMergeJoin" not in plan, plan
    # the only repartitioning exchange is the BATCH-key distinct feeding
    # the broadcast (batch-sized by construction); the stored relation
    # reaches its semi join un-exchanged
    assert plan.count("Exchange hashpartitioning") <= 1, plan


@pytest.mark.indexes
def test_register_bucketed_table_rejects_injectable_fragments(spark, tmp_path):
    """The recovery DDL is the one statement users type by hand (ADVICE
    r09): identifiers are validated + backtick-quoted and the path/column
    list may not smuggle statement punctuation — a quote in any fragment
    is a loud ValueError, never an altered statement."""
    import pytest

    from map_reduce_engine_spark.operators.dedup import register_bucketed_table

    ok = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="identifier"):
        register_bucketed_table(spark, "t; DROP TABLE x", ok, "h BIGINT", ["h"])
    with pytest.raises(ValueError, match="identifier"):
        register_bucketed_table(spark, "t", ok, "h BIGINT", ["h`x"])
    with pytest.raises(ValueError, match="quote"):
        register_bucketed_table(spark, "t", ok + "' OPTIONS ('a'='b", "h BIGINT", ["h"])
    with pytest.raises(ValueError, match="plain column list"):
        register_bucketed_table(spark, "t", ok, "h BIGINT); DROP TABLE x; --", ["h"])


@pytest.mark.indexes
def test_ivf_centroid_companion_nested_under_index_path(spark, sf_dir, tmp_path):
    """The centroid half of a persisted IVF index lives INSIDE the index
    directory (``{path}/_centroids`` — ADVICE r09: a sibling directory
    orphans on relocate/delete), and the underscore prefix keeps it out of
    the assignment table's own scan."""
    from pyspark.sql import functions as SF

    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.similarity import (
        ivf_train_assign,
        read_ivf_index,
        write_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings").where(SF.col("vec_id") < 100)
    centers, cb = ivf_train_assign(emb, "vec_id", "embedding", n_cells=4)
    path = tmp_path / "ivf_nested"
    write_ivf_index(centers, cb, "ivf_nested_layout_test", path=str(path))
    try:
        assert (path / "_centroids").is_dir()  # one directory == one index
        stored_centers, stored_cb = read_ivf_index(spark, "ivf_nested_layout_test")
        assert [list(c) for c in stored_centers] == [list(c) for c in centers]
        # the hidden subdir does not pollute the assignment scan
        assert stored_cb.count() == cb.count() == emb.count()
        assert stored_cb.columns == ["neighbor_id", "cv", "cnorm", "cell"]
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_nested_layout_test")
        spark.sql("DROP TABLE IF EXISTS ivf_nested_layout_test_centroids")


@pytest.mark.indexes
def test_rolled_index_catches_next_day_repeats(spark):
    """The roll-forward contract that makes the ingest loop actually
    iterate: after day 1 appends a novel document and unions its tiles
    into the index (distinct-of-union — mergeable state), a day-2 batch
    repeating that document's run is fully excised even though the run
    never appeared in the ORIGINAL corpus; day-2 novelty still passes."""
    from map_reduce_engine_spark.operators.dedup import (
        build_substring_index,
        incremental_substring_dedup,
    )

    k = 50
    corpus_run = " ".join(f"c{i}" for i in range(60))
    day1_novel = " ".join(f"n{i}" for i in range(60))
    day2_novel = " ".join(f"m{i}" for i in range(60))
    corpus = spark.createDataFrame([(1, corpus_run)], ["doc_id", "text"])
    day1_payload = spark.createDataFrame([(10, day1_novel)], ["doc_id", "text"])
    day2 = spark.createDataFrame(
        [(20, day1_novel), (21, day2_novel)], ["doc_id", "text"]
    )

    index0 = build_substring_index(corpus, "doc_id", "text", k=k)
    rolled = index0.unionByName(
        build_substring_index(day1_payload, "doc_id", "text", k=k)
    ).distinct()

    # against the ORIGINAL index, day-1's text is still novel
    led0 = {
        r.id: r.removed_tokens
        for r in incremental_substring_dedup(
            None, day2, "doc_id", "text", k=k, index_df=index0
        ).collect()
    }
    assert led0 == {20: 0, 21: 0}, led0
    # against the ROLLED index, the day-1 repeat is fully excised
    led1 = {
        r.id: r.removed_tokens
        for r in incremental_substring_dedup(
            None, day2, "doc_id", "text", k=k, index_df=rolled
        ).collect()
    }
    assert led1 == {20: 60, 21: 0}, led1


@pytest.mark.indexes
def test_band_index_build_persist_probe_roundtrip(spark, tmp_path):
    """The MinHash twin of the tile-index contract: the history's band
    entries persist as a table bucketed on the probe's exact (band, bucket)
    join key, and probing THROUGH the stored table (sig_hist=None — history
    signatures never recomputed) yields the identical candidate set."""
    import pytest

    from map_reduce_engine_spark.operators.dedup import (
        build_band_index,
        minhash_cross_candidates,
        minhash_signatures,
        read_band_index,
        write_band_index,
    )

    docs = [
        (i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(8)
    ]
    hist = spark.createDataFrame(docs[:5], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100 + i, t) for i, t in docs[4:]], ["doc_id", "text"]
    )
    idx = build_band_index(hist, "doc_id", "text")
    write_band_index(
        idx, "band_index_roundtrip_test", path=str(tmp_path / "band_index"), n_buckets=4
    )
    try:
        # the banding parameters travel WITH the table (ADVICE r09):
        # reading back with matching parameters passes, a mismatch is a
        # loud ValueError instead of a silent zero-candidate probe
        stored = read_band_index(spark, "band_index_roundtrip_test")
        with pytest.raises(ValueError, match="mre.bands"):
            read_band_index(spark, "band_index_roundtrip_test", bands=8)
        with pytest.raises(ValueError, match="rows_per_band"):
            read_band_index(spark, "band_index_roundtrip_test", rows_per_band=8)
        cols = {c.name: c for c in spark.catalog.listColumns("band_index_roundtrip_test")}
        assert cols["band"].isBucket and cols["bucket"].isBucket
        sig_new = minhash_signatures(new, "doc_id", "text")
        sig_hist = minhash_signatures(hist, "doc_id", "text")
        via_stored = sorted(
            map(tuple, minhash_cross_candidates(sig_new, None, hist_index_df=stored).collect())
        )
        inline = sorted(
            map(tuple, minhash_cross_candidates(sig_new, sig_hist).collect())
        )
        assert via_stored == inline and via_stored  # identical, non-trivial
        with pytest.raises(ValueError, match="sig_hist or hist_index_df"):
            minhash_cross_candidates(sig_new, None)
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index_roundtrip_test")


@pytest.mark.indexes
def test_token_table_persist_verify_roundtrip(spark, tmp_path):
    """The verify-side companion of the band index (VERDICT r09 #1): the
    history's (id, toks) arrays persist bucketed on id, and the exact-
    Jaccard verify through the STORED table — batch df only, history text
    structurally out of reach — equals the inline both-sides form
    row-for-row. The plan proof: the stored-verify frame never references
    the history's parquet files."""
    import pytest

    from map_reduce_engine_spark.operators.dedup import (
        build_band_index,
        build_token_table,
        jaccard_pairs,
        minhash_cross_candidates,
        minhash_signatures,
        read_band_index,
        read_token_table,
        write_band_index,
        write_token_table,
    )

    docs = [
        (i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(8)
    ]
    hist_path = str(tmp_path / "hist_docs")
    spark.createDataFrame(docs[:5], ["doc_id", "text"]).write.parquet(hist_path)
    hist = spark.read.parquet(hist_path)
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in docs[4:]], ["id", "text"]
    )
    write_band_index(
        build_band_index(hist, "doc_id", "text"),
        "tok_verify_bands_test",
        path=str(tmp_path / "bands"),
        n_buckets=4,
    )
    write_token_table(
        build_token_table(hist, "doc_id", "text"),
        "tok_verify_toks_test",
        path=str(tmp_path / "toks"),
        n_buckets=4,
    )
    try:
        stored_bands = read_band_index(spark, "tok_verify_bands_test")
        stored_toks = read_token_table(spark, "tok_verify_toks_test")
        cols = {c.name: c for c in spark.catalog.listColumns("tok_verify_toks_test")}
        assert cols["id"].isBucket
        # tokenization-unit contract travels with the table
        with pytest.raises(ValueError, match="shingle_n"):
            read_token_table(spark, "tok_verify_toks_test", shingle_n=3)
        sig_new = minhash_signatures(batch, "id", "text")
        cands = minhash_cross_candidates(sig_new, None, hist_index_df=stored_bands)
        via_stored = jaccard_pairs(
            batch, "id", "text", min_jaccard=0.2, candidates=cands,
            hist_toks_df=stored_toks,
        )
        # the plan never touches the history text files — the verify's
        # cost scales with the batch, not the corpus
        plan = via_stored._jdf.queryExecution().optimizedPlan().toString()
        assert "hist_docs" not in plan, plan
        both = batch.unionByName(
            hist.selectExpr("doc_id AS id", "text")
        )
        inline = jaccard_pairs(
            both, "id", "text", min_jaccard=0.2, candidates=cands
        )
        got = sorted(map(tuple, via_stored.collect()))
        want = sorted(map(tuple, inline.collect()))
        assert got == want and got  # identical, non-trivial
        with pytest.raises(ValueError, match="candidates"):
            jaccard_pairs(
                batch, "id", "text", min_jaccard=0.2, hist_toks_df=stored_toks
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS tok_verify_bands_test")
        spark.sql("DROP TABLE IF EXISTS tok_verify_toks_test")


def test_cross_corpus_contamination_spans_k13(spark):
    """GPT-3-style decontamination probe: a 13-token run shared between a
    test doc and ANY train doc is recovered as an exact span; a 12-token
    overlap is invisible; train-train repetition alone flags nothing."""
    from map_reduce_engine_spark.operators.dedup import (
        cross_corpus_contamination_spans,
    )

    leak13 = " ".join(f"q{i}" for i in range(13))
    leak12 = " ".join(f"w{i}" for i in range(12))
    train = spark.createDataFrame(
        [
            (1, f"{leak13} " + " ".join(f"a{i}" for i in range(10))),
            (2, f"{leak12} " + " ".join(f"b{i}" for i in range(10))),
            # train-train duplication (both contain leak13) must not
            # produce TEST spans by itself
            (3, " ".join(f"c{i}" for i in range(5)) + f" {leak13}"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [
            # 5 unique + the 13-token leak -> span [6, 18]
            (100, " ".join(f"x{i}" for i in range(5)) + f" {leak13}"),
            # only the 12-token overlap: below k, clean
            (101, f"{leak12} " + " ".join(f"y{i}" for i in range(8))),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r.id: (r.span_start, r.span_end, r.span_tokens)
        for r in cross_corpus_contamination_spans(
            test, train, "doc_id", "text", k=13
        ).collect()
    }
    assert spans == {100: (6, 18, 13)}, spans


def test_udtf_sentence_stats_lateral(spark):
    """Python UDTF + LATERAL correlation: per-sentence relations with typed
    columns; empty docs yield no rows, unpunctuated docs one row."""
    from map_reduce_engine_spark.operators.udtf import sentence_stats

    df = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, "no punctuation here"), (3, "  ")],
        ["doc_id", "text"],
    )
    got = sorted(tuple(r) for r in sentence_stats(spark, df, "doc_id", "text").collect())
    assert got == [(1, 1, 2, 11), (1, 2, 3, 11), (1, 3, 1, 4), (2, 1, 3, 19)], got


def test_pq_recall_and_compression_contract(spark, sf_dir):
    """PQ with 16 subspaces must keep recall@10 >= 0.25 aggregate against
    brute force on the fixture embeddings, and every query returns exactly
    k rows ranked by estimated cosine."""
    from map_reduce_engine_spark.operators.similarity import cosine_topk, pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    rows = pq_topk(emb, queries, "vec_id", "embedding", k=10, m=16, n_codes=16).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"PQ recall collapsed: {recall}"
    from collections import Counter
    per_q = Counter(r.query_id for r in rows)
    assert all(v == 10 for v in per_q.values()), per_q
    assert all(q != n for q, n in approx)


def test_bpe_classic_example(spark):
    """The Sennrich et al. toy dictionary: merges must follow the weighted
    pair counts with the deterministic (count desc, lhs, rhs) tiebreak."""
    from map_reduce_engine_spark.operators.bpe import bpe_train

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        ["word", "wcnt"],
    )
    merges = [tuple(r) for r in bpe_train(words, n_merges=4).orderBy("round").collect()]
    # (e,s)=9 from newest+widest, then (es,t)=9, (est,</w>)=9, then (l,o)=7
    assert merges[0] == (1, "e", "s", "es", 9)
    assert merges[1] == (2, "es", "t", "est", 9)
    assert merges[2] == (3, "est", "</w>", "est</w>", 9)
    assert merges[3] == (4, "l", "o", "lo", 7)


def test_bpe_overlapping_pairs_greedy_leftmost(spark):
    """'aaaa' has three overlapping (a,a) pairs: the count is the raw pair
    count (3), but the greedy leftmost merge yields exactly two 'aa'
    symbols — round 2's candidates prove it ((aa,</w>) wins the lexical
    tiebreak against (aa,aa), both count 1)."""
    from map_reduce_engine_spark.operators.bpe import bpe_train

    words = spark.createDataFrame([("aaaa", 1)], ["word", "wcnt"])
    merges = [tuple(r) for r in bpe_train(words, n_merges=2).orderBy("round").collect()]
    assert merges[0] == (1, "a", "a", "aa", 3)
    assert merges[1] == (2, "aa", "</w>", "aa</w>", 1)


def test_skipgram_short_documents(spark):
    """Documents shorter than the window must contribute nothing — Spark's
    sequence(1, 0) is DESCENDING [1, 0] (unlike DuckDB's empty
    generate_series), so an unguarded transform would hit element_at(_, 0)
    and throw on any 1- or 2-token document."""
    from map_reduce_engine_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c d")], ["doc_id", "text"]
    )
    rows = skipgram_pairs(df, "doc_id", "text", window=2, min_count=1).collect()
    got = sorted((r.w1, r.w2, r.pair_cnt) for r in rows)
    assert got == [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("b", "d", 1), ("c", "d", 1)]


def test_semantic_dedup_contract(spark, sf_dir):
    """SemDeDup cluster-local pruning: (a) output exactly partitions the
    input ids, (b) every dropped id's keeper is a genuinely-near smaller id
    (recomputed driver-side in numpy — independent of the JVM join path),
    (c) dropped pairs are a SUBSET of the global brute-force near pairs
    (cluster-locality can only miss pairs, never invent them), and
    (d) deterministic under repartitioning."""
    import numpy as np

    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, "vec_id", "embedding", n_cells=16, threshold=0.4)
    rows = out.collect()
    ids = [r.vec_id for r in rows]
    assert sorted(ids) == sorted(r.vec_id for r in emb.select("vec_id").collect())

    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    def cos(a, b):
        return float(V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b])))

    dropped = [(r.vec_id, r.keeper_id) for r in rows if not r.is_kept]
    assert dropped, "fixture should produce a non-empty drop set at tau=0.4"
    for d, k in dropped:
        assert k < d
        assert cos(d, k) >= 0.4 - 1e-9

    out2 = semantic_dedup(
        emb.repartition(7), "vec_id", "embedding", n_cells=16, threshold=0.4
    )
    assert {tuple(r) for r in out2.collect()} == {tuple(r) for r in rows}


def test_kmv_set_ops_estimate_quality(spark, sf_dir):
    """KMV set-algebra estimates must land near the exact counts (k=64 →
    ~12.5% stderr; assert a loose 3-sigma band) and respect set algebra:
    the oracle equality check alone can't catch a sketch that degenerates
    identically in both engines."""
    from map_reduce_engine_spark.queries import REGISTRY

    row = REGISTRY["kmv_set_ops"].fn(spark, sf_dir).collect()[0]
    for est, exact in (
        (row.a_est, row.exact_a),
        (row.b_est, row.exact_b),
        (row.union_est, row.exact_union),
        (row.intersect_est, row.exact_intersect),
    ):
        assert exact > 0 and abs(est - exact) / exact < 0.4, (est, exact)
    assert row.intersect_est <= row.union_est
    assert max(row.a_est, row.b_est) <= row.union_est * 1.01


def test_kmv_tree_small_group_exact_branch(spark):
    """Regression (ADVICE r02): level-2 merge must NOT explode kmin while
    summing n — that added each shard's count once per kept hash, inflating
    n_hashes to sum(len(kmin)*n) and corrupting the n < k exact branch for
    groups with fewer than k distinct items split across shards."""
    from map_reduce_engine_spark.operators.sketch import kmv_tree_sketch

    # 10 distinct items per group, duplicated, spread across many input
    # partitions so level 1 genuinely produces multiple salt shards.
    rows = [(g, f"item-{g}-{i}") for g in ("a", "b") for i in range(10)] * 3
    df = spark.createDataFrame(rows, "g string, item string").repartition(8)
    out = {r.g: r for r in kmv_tree_sketch(df, "g", "item", k=64, fanout=8).collect()}
    for g in ("a", "b"):
        assert out[g].n_hashes == 10, out[g]
        assert len(out[g].kmin) == 10
        assert out[g].kmin == sorted(out[g].kmin)


def test_semantic_dedup_layout_invariant_above_sampling_threshold(spark):
    """Regression (ADVICE r02): above the training-sample threshold the
    sample must be selected by CONTENT, not df.sample/limit (both
    partition-layout-dependent) — the kept/dropped decision has to be
    identical under repartitioning even when sampling kicks in."""
    import numpy as np

    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(120, 8))
    rows = []
    for i in range(1500):  # > target=1000 for n_cells=4 → sampling engages
        v = base[i % 120] + 0.001 * rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vid bigint, emb array<double>")
    a = {tuple(r) for r in semantic_dedup(df, "vid", "emb", n_cells=4, threshold=0.9).collect()}
    b = {
        tuple(r)
        for r in semantic_dedup(
            df.repartition(13), "vid", "emb", n_cells=4, threshold=0.9
        ).collect()
    }
    assert a == b
    assert any(not r[2] for r in a), "near-dup fixture should drop rows"


def test_semantic_dedup_hot_cell_chunked_matches_full_matrix(spark):
    """r12 (VERDICT r11 #3): the per-cell cosine pass runs in 4096-row
    chunks so worker memory is O(chunk × |cell|), never |cell|² — the
    declared query pins n_cells, so cell population grows with the corpus.
    A deliberately hot cell (all rows in ONE cell, > 2 chunk widths) must
    produce decisions identical to an independent full-matrix reference
    implementing the same first-qualifying-smaller-id rule."""
    import numpy as np

    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(12)
    n, d, threshold = 9000, 6, 0.95
    base = rng.normal(size=(40, d))
    V = base[rng.integers(0, 40, size=n)] + 0.02 * rng.normal(size=(n, d))
    V[17] = 0.0  # zero-norm row: must never qualify and never block others
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in ids],
        "vid bigint, emb array<double>",
    )
    out = {
        r.vid: r
        for r in semantic_dedup(df, "vid", "emb", n_cells=1, threshold=threshold).collect()
    }
    assert len(out) == n and {r.cell for r in out.values()} == {0}

    # independent reference: one full n×n matrix, same sorted-id semantics
    norms = np.sqrt((V**2).sum(axis=1))
    denom = np.outer(norms, norms)
    S = (V @ V.T) / np.where(denom > 0.0, denom, np.inf)
    qual = (S >= threshold) & np.tril(np.ones((n, n), dtype=bool), k=-1)
    has = qual.any(axis=1)
    first = qual.argmax(axis=1)
    assert has.any(), "fixture must exercise the drop path"
    for i in range(n):
        assert out[i].is_kept == (not has[i]), i
        assert out[i].keeper_id == (int(first[i]) if has[i] else None), i
    assert out[17].is_kept and out[17].keeper_id is None


def test_semantic_dedup_rejects_nonpositive_threshold(spark):
    """ADVICE r11: zero-norm/NaN semantics of the vectorized pass only
    match the exact-join form for positive thresholds — fail loudly."""
    import pytest as _pytest

    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vid bigint, emb array<double>")
    with _pytest.raises(ValueError, match="threshold > 0"):
        semantic_dedup(df, "vid", "emb", n_cells=1, threshold=0.0)


def test_semantic_dedup_string_ids_and_empty_schema(spark):
    """Non-bigint id columns: the empty-input early return and the main
    path must emit the SAME schema, carrying the input id type through."""
    from map_reduce_engine_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [1.0, 1e-9]), ("doc-c", [0.0, 1.0])],
        "doc_id string, emb array<double>",
    )
    full = semantic_dedup(df, "doc_id", "emb", n_cells=1, threshold=0.99)
    empty = semantic_dedup(df.where("doc_id = 'nope'"), "doc_id", "emb")
    # nullability may differ (isNull() is non-null); names+types must match
    assert [(f.name, f.dataType) for f in full.schema] == [
        (f.name, f.dataType) for f in empty.schema
    ]
    assert full.unionByName(empty).count() == 3  # union across both paths works
    rows = {r.doc_id: r for r in full.collect()}
    assert not rows["doc-b"].is_kept and rows["doc-b"].keeper_id == "doc-a"
    assert empty.count() == 0


def test_jl_projection_distortion_bound(spark, sf_dir):
    """The JL projection must actually preserve pairwise cosine structure:
    with 16 Gaussian directions the distortion std is ~1/sqrt(16), so the
    mean absolute cosine error over probe pairs stays well under 0.2 and
    no pair is torn apart entirely (oracle equality alone would pass even
    for a useless projection)."""
    from map_reduce_engine_spark.queries import REGISTRY

    rows = REGISTRY["jl_distance_preservation"].fn(spark, sf_dir).collect()
    errs = [r.abs_err for r in rows]
    assert len(errs) == 190
    assert sum(errs) / len(errs) < 0.2, sum(errs) / len(errs)
    assert max(errs) < 0.75, max(errs)


def test_join_size_estimate_unbiased_and_exact_at_full_rate(spark):
    """Coordinated key-sampling: rate_denom=1 keeps every key, so the
    'estimate' must equal the exact join size; at 1/4 on a uniform key
    space the estimate must land within a loose 3-sigma band."""
    from map_reduce_engine_spark.operators.sketch import join_size_estimate

    rows = [(k % 100, i) for i, k in enumerate(range(2000))]
    df = spark.createDataFrame(rows, "key bigint, payload bigint")
    exact = sum(20 * 20 for _ in range(100))  # 100 keys x 20 rows each
    full = join_size_estimate(df, df, "key", "key", rate_denom=1).collect()[0]
    assert full.est_pairs == exact == full.sampled_pairs
    est = join_size_estimate(df, df, "key", "key", rate_denom=4).collect()[0]
    assert est.n_sampled_keys > 0
    assert abs(est.est_pairs - exact) / exact < 0.6, est


def test_maxsim_prefers_duplicate_bag(spark):
    """maxsim semantics: a candidate bag containing near-copies of every
    query vector must outrank a bag matching only one of them."""
    import numpy as np

    from map_reduce_engine_spark.queries import REGISTRY
    from map_reduce_engine_spark.io import read_table

    # registry query at fixture scale: rank-1 candidate per query doc must
    # dominate on summed max-cosine, and ranks must be 1..5 per query
    out = REGISTRY["maxsim_late_interaction"].fn(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_doc, []).append(r)
    for q_doc, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r.score_micro for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)


def test_zorder_tiles_are_compact_rectangles(spark, sf_dir):
    """Each 1024-cell z-tile covers a 32x32 grid rectangle — spans over 31
    on either bucketized dimension would mean the interleave is broken and
    footer-stat pruning on that column is lost."""
    from map_reduce_engine_spark.queries import REGISTRY

    rows = REGISTRY["zorder_locality"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.x_span <= 31, r
        assert 0 <= r.y_span <= 31, r


def test_ams_f2_estimate_quality_and_partition_invariance(spark, sf_dir):
    """The AMS estimate must land near exact F2 (32-mean groups → ~25%
    stderr; assert a loose band) and, being a plain sum, must be
    bit-identical under repartitioning."""
    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.sketch import ams_f2_sketch

    orders = read_table(spark, sf_dir, "orders")
    a = ams_f2_sketch(orders, "o_custkey").collect()[0].f2_group_means
    b = ams_f2_sketch(orders.repartition(13), "o_custkey").collect()[0].f2_group_means
    assert a == b
    exact = (
        orders.groupBy("o_custkey").count().agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    )
    med = a[len(a) // 2 - 1]
    assert exact > 0 and abs(med - exact) / exact < 0.75, (med, exact)


def test_token_dropout_seeded_views_and_determinism(spark, sf_dir):
    """Augmentation contract: ~rate tokens drop, the same seed regenerates
    the identical view under repartitioning, and different seeds give
    genuinely different views (contrastive positives)."""
    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.text import token_dropout

    docs = read_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    v1 = {(r.id, r.aug_text) for r in token_dropout(docs, "doc_id", "text", seed=1).collect()}
    v1b = {
        (r.id, r.aug_text)
        for r in token_dropout(docs.repartition(9), "doc_id", "text", seed=1).collect()
    }
    v2 = {(r.id, r.aug_text) for r in token_dropout(docs, "doc_id", "text", seed=2).collect()}
    assert v1 == v1b
    assert v1 != v2
    rows = token_dropout(docs, "doc_id", "text", drop_permille=100, seed=1).collect()
    total, dropped = sum(r.n_tokens for r in rows), sum(r.n_dropped for r in rows)
    assert 0.06 < dropped / total < 0.14, dropped / total


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )
)
def test_kmv_tree_merge_law_property(spark_global, rows):
    """Property: the tree-merged KMV sketch equals a direct Python
    computation of the k smallest distinct portable hashes AND the true
    distinct count, for arbitrary multisets — the merge law
    (min-k associative over set union) plus the n_hashes contract the
    exploded-merge bug broke."""
    import hashlib

    from map_reduce_engine_spark.operators.sketch import kmv_tree_sketch

    k = 8
    if not rows:
        return
    df = spark_global.createDataFrame(rows, "g string, item bigint").repartition(5)
    got = {r.g: r for r in kmv_tree_sketch(df, "g", "item", k=k, fanout=4).collect()}
    by_group = {}
    for g, item in rows:
        h = int(hashlib.md5(str(item).encode()).hexdigest()[:8], 16) & 2147483647
        by_group.setdefault(g, set()).add(h)
    for g, hashes in by_group.items():
        assert got[g].n_hashes == len(hashes), (g, got[g])
        assert list(got[g].kmin) == sorted(hashes)[:k], (g, got[g])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab x", min_size=1, max_size=30),
        min_size=1,
        max_size=10,
    )
)
def test_token_dropout_subsequence_property(spark_global, texts):
    """Property: the augmented text is always an ordered subsequence of the
    original tokens, and n_dropped accounts exactly for the removals."""
    from map_reduce_engine_spark.operators.text import token_dropout

    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    for r in token_dropout(df, "doc_id", "text", drop_permille=300, seed=3).collect():
        orig = r.text.split()
        aug = r.aug_text.split() if r.aug_text else []
        assert r.n_tokens == len(orig)
        assert r.n_dropped == len(orig) - len(aug)
        it = iter(orig)
        assert all(any(tok == o for o in it) for tok in aug), (orig, aug)


def test_polymorphic_udtf_schema_follows_argument(spark):
    """analyze() must compute the output schema from the constant n: the
    SAME call site yields different column sets for different n."""
    from map_reduce_engine_spark.operators.udtf import ngram_columns

    df = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    two = ngram_columns(spark, df, "doc_id", "text", n=2)
    three = ngram_columns(spark, df, "doc_id", "text", n=3)
    assert two.columns == ["id", "pos", "w1", "w2"]
    assert three.columns == ["id", "pos", "w1", "w2", "w3"]
    assert two.count() == 3 and three.count() == 2
    got = {(r.pos, r.w1, r.w2, r.w3) for r in three.collect()}
    assert got == {(1, "a", "b", "c"), (2, "b", "c", "d")}


def test_binary_hamming_cascade_recall(spark, sf_dir):
    """The binary tier is a first-stage FILTER: its top-30 by Hamming must
    retain a usable share of the exact cosine top-10 (the rerank cascade
    contract), and codes must be partition-invariant."""
    from map_reduce_engine_spark.operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.hamming_topk(emb, q, "vec_id", "embedding", k=30).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall
    c1 = {tuple(r) for r in sim.binary_quantize(emb, "vec_id", "embedding").collect()}
    c2 = {tuple(r) for r in sim.binary_quantize(emb.repartition(7), "vec_id", "embedding").collect()}
    assert c1 == c2


def test_scd2_build_intervals_and_ties(spark):
    """Full-history build: contiguous valid_from/valid_to chain per key, one
    open current row, deterministic version order under an order-col tie
    (the tiebreak column decides)."""
    from map_reduce_engine_spark.operators.cdc import scd2_build

    log = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 20, 101, "b"), (1, 20, 99, "tie-first"), (2, 5, 50, "x")],
        "k INT, ts INT, id INT, attr STRING",
    )
    out = scd2_build(log, key="k", order_cols=["ts", "id"]).collect()
    by_seq = {(r.k, r.version_seq): r for r in out}
    assert by_seq[(1, 1)].attr == "a" and by_seq[(1, 1)].valid_to == 20
    assert by_seq[(1, 2)].attr == "tie-first" and by_seq[(1, 2)].valid_to == 20
    assert by_seq[(1, 3)].attr == "b" and by_seq[(1, 3)].valid_to is None
    assert by_seq[(1, 3)].is_current and not by_seq[(1, 1)].is_current
    assert by_seq[(2, 1)].is_current and by_seq[(2, 1)].valid_from == 5
    assert sum(1 for r in out if r.k == 1 and r.is_current) == 1


def test_pareto_frontier_matches_bruteforce_any_layout(spark):
    """Two-phase skyline equals the quadratic definition, including kept
    duplicate points and same-price ties, under different partitionings."""
    import random

    from map_reduce_engine_spark.operators.frontier import pareto_frontier_2d

    rng = random.Random(7)
    pts = [(i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(120)]
    # cheaper than every random point -> undominatable from the left
    pts += [(900, -1.0, 15), (901, -1.0, 15)]  # exact duplicate pair, both kept
    pts += [(902, -1.0, 14)]                   # same price, smaller size -> dominated by 900

    def dominated(r):
        return any(
            s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
            for s in pts
        )

    expect = {p[0] for p in pts if not dominated(p)}
    assert 900 in expect and 901 in expect and 902 not in expect
    df = spark.createDataFrame(pts, "id BIGINT, price DOUBLE, size INT")
    for parts in (1, 7):
        out = pareto_frontier_2d(df.repartition(parts), "price", "size")
        assert {r.id for r in out.collect()} == expect


def test_rrf_fuse_integer_scores_and_absence(spark):
    """A candidate on both lists outranks a better-single-list candidate;
    absent entries contribute zero; scores are exact integer nano-units."""
    from map_reduce_engine_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id INT, neighbor_id INT, rank INT"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id INT, neighbor_id INT, rank INT"
    )
    out = {r.neighbor_id: (r.rrf_nano, r.fused_rank) for r in rrf_fuse([a, b], k=10).collect()}
    n61, n62 = 1000000000 // 61, 1000000000 // 62
    assert out[11] == (n61 + n62, 1)      # on both lists -> wins
    assert out[10] == (n61, 2)            # rank-1 on one list only
    assert out[12] == (n62, 3)


def test_label_propagation_two_cliques(spark):
    """Two disjoint triangles converge to their min-member labels; the
    result is identical under repartitioning (deterministic tie-breaks)."""
    from map_reduce_engine_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "id1 BIGINT, id2 BIGINT",
    )
    got = {(r.node, r.community) for r in label_propagation(edges, rounds=4).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}
    got7 = {
        (r.node, r.community)
        for r in label_propagation(edges.repartition(7), rounds=4).collect()
    }
    assert got7 == got


def test_grid_radius_pairs_matches_bruteforce(spark):
    """Grid-bucketed radius join finds exactly the brute-force pair set,
    including pairs straddling a cell boundary."""
    import math
    import random

    from map_reduce_engine_spark.operators.spatial import grid_radius_pairs

    rng = random.Random(3)
    pts = [(i, rng.uniform(-2.0, 2.0), rng.uniform(-2.0, 2.0)) for i in range(80)]
    pts += [(100, 0.9999, 0.0), (101, 1.0001, 0.0)]  # straddle the cy=0/1 boundary

    def hav(a, b):
        rl1, rl2 = math.radians(a[1]), math.radians(b[1])
        dlat = math.radians(b[1] - a[1]) / 2.0
        dlon = math.radians(b[2] - a[2]) / 2.0
        h = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
        return 2.0 * 6371.0 * math.asin(math.sqrt(h))

    expect = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if round(hav(a, b) if a[0] < b[0] else hav(b, a), 4) <= 100.0
    }
    assert (100, 101) in expect  # boundary pair is within ~0.02 km
    df = spark.createDataFrame(pts, "id BIGINT, lat DOUBLE, lon DOUBLE")
    for parts in (1, 7):
        got = {
            (r.id1, r.id2)
            for r in grid_radius_pairs(
                df.repartition(parts), "id", "lat", "lon", radius_km=100.0, cell_deg=1.0
            ).collect()
        }
        assert got == expect


def test_burstiness_constant_gaps_is_minus_one(spark):
    """A perfectly regular event train has σ=0 → Goh-Barabási B = -1 and
    CV = 0; the registry query computes both from integer-second moments."""
    import datetime as dt

    from map_reduce_engine_spark.queries.base import REGISTRY

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=60 * i), 7, "click", 1.0, "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    )
    # drive the same computation shape directly (the registry fn reads files)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    g = df.select("user_id", (us - F.lag(us).over(w)).alias("gap_raw")).select(
        "user_id", F.expr("gap_raw div 1000000").alias("gap_s")
    )
    m = g.where(F.col("gap_s").isNotNull()).groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("gap_s").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
    ).collect()[0]
    n, s1, s2 = m.n, m.s1, m.s2
    var = (s2 - s1 * s1 / n) / (n - 1)
    mu = s1 / n
    assert var == 0.0 and mu == 60.0  # σ=0 ⇒ CV=0, B=(0-μ)/(0+μ) = -1


def test_rrf_fuse_three_lists(spark):
    """Fusion generalizes beyond two rankers: a candidate on all three
    lists beats one on two, which beats one on one."""
    from map_reduce_engine_spark.operators.retrieval import rrf_fuse

    def lst(*ids):
        return spark.createDataFrame(
            [(1, nid, r + 1) for r, nid in enumerate(ids)],
            "query_id INT, neighbor_id INT, rank INT",
        )

    out = {r.neighbor_id: r.fused_rank for r in
           rrf_fuse([lst(5, 6, 7), lst(5, 6, 8), lst(5, 9, 10)], k=10).collect()}
    assert out[5] == 1      # on all three lists at rank 1
    assert out[6] == 2      # on two lists


def test_bloom_filter_mergeable_and_no_false_negatives(spark):
    """operators/bloom.py: (1) shard filters bit_or-merge into exactly the
    filter built over the union (the sketch partial-aggregation law); (2)
    every inserted key probes True — Bloom filters never false-negative."""
    from pyspark.sql import functions as F

    from map_reduce_engine_spark.operators.bloom import bloom_probe, bloom_words

    m_bits = 63 * 17
    keys = spark.range(100).select(F.col("id").alias("key")).withColumn(
        "m_bits", F.lit(m_bits)
    )
    whole = {
        (r.word_idx, r.word) for r in bloom_words(keys, "key", "m_bits").collect()
    }
    merged = {
        (r.word_idx, r.word)
        for r in (
            bloom_words(keys.where("key < 50"), "key", "m_bits")
            .union(bloom_words(keys.where("key >= 50"), "key", "m_bits"))
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
            .collect()
        )
    }
    assert whole == merged

    words = bloom_words(keys, "key", "m_bits")
    probes = spark.range(200).select(F.col("id").alias("key")).withColumn(
        "m_bits", F.lit(m_bits)
    )
    got = {r.key: r.maybe_member for r in bloom_probe(probes, "key", words, "m_bits").collect()}
    assert all(got[k] for k in range(100)), "false negative!"
    # with 100 keys in 1071 bits the filter is saturated enough that SOME
    # of the 100 absent keys must miss — i.e. the filter actually filters
    assert not all(got[k] for k in range(100, 200))


def test_table_checksum_partition_invariant(spark, sf_dir):
    """The table fingerprint must be identical under any physical layout —
    the property that makes it a valid replication-equality check."""
    from map_reduce_engine_spark.queries.base import REGISTRY

    fn = REGISTRY["table_checksum"].fn
    base = fn(spark, sf_dir).collect()[0].asDict()

    from map_reduce_engine_spark.queries.base import t as load

    import pyspark.sql.functions as F

    cust = load(spark, sf_dir, "customer")
    for layout in (cust.repartition(13), cust.coalesce(1), cust.orderBy(F.desc("c_acctbal"))):
        rh = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("c_custkey").cast("string"),
                            F.col("c_mktsegment"),
                            F.col("c_nationkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .bitwiseAND(F.lit((1 << 31) - 1))
        )
        got = (
            layout.select(rh.alias("rh"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("rh").cast("bigint").alias("checksum_sum"),
                F.expr("bit_xor(rh)").cast("bigint").alias("checksum_xor"),
                F.min("rh").alias("checksum_min"),
                F.max("rh").alias("checksum_max"),
            )
            .collect()[0]
            .asDict()
        )
        assert got == base, got


def test_prefix_filter_exact_recall_vs_bruteforce(spark):
    """Prefix filtering must have EXACT recall: every pair with Jaccard >=
    0.7 over random small-vocab token sets appears in the operator's
    output, and nothing below threshold does (the Chaudhuri et al.
    prefix-length guarantee, checked against brute force)."""
    import itertools
    import random

    from map_reduce_engine_spark.queries.base import REGISTRY

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(3, 8))))
        for i in range(30)
    ]
    # brute-force truth over distinct token sets
    sets = {i: frozenset(text.split()) for i, text in docs}
    truth = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 10 * inter >= 7 * union:
            truth.add((a, b))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("__pf_docs")
    # drive the registry implementation against this frame via a shim dir:
    # reuse its internals directly instead (the query reads documents)
    from pyspark.sql import functions as F

    from map_reduce_engine_spark.queries import dedup as qd

    # call the registered function body on a monkeypatched loader
    import map_reduce_engine_spark.queries.base as base_mod

    orig_t = base_mod.t
    try:
        base_mod.t = lambda _s, _d, _n: df  # noqa: ARG005
        qd.t = base_mod.t
        out = REGISTRY["prefix_filter_simjoin"].fn(spark, "ignored")
        got = {(r.id1, r.id2) for r in out.collect()}
    finally:
        base_mod.t = orig_t
        qd.t = orig_t
    assert got == truth, (sorted(got - truth)[:5], sorted(truth - got)[:5])


def test_k_core_peel_known_graph(spark):
    """Triangle {1,2,3} + pendant path 3-4-5: the 2-core is exactly the
    triangle (peeling 5 then 4 is the cascade the loop must follow), and
    every surviving degree is >= k."""
    from map_reduce_engine_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "u BIGINT, v BIGINT"
    )
    got = {(r.node, r.core_degree) for r in k_core(edges, k=2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}
    # 3-core of the same graph is empty (no node has degree 3 after peeling)
    assert k_core(edges, k=3).count() == 0


def test_k_core_idempotent_and_degree_floor(spark, sf_dir):
    """k-core of the k-core is itself, and all in-core degrees >= k —
    the two defining invariants, on the real co-purchase graph."""
    from pyspark.sql import functions as SF

    from map_reduce_engine_spark.io import read_table
    from map_reduce_engine_spark.operators.graph import k_core

    li = read_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(SF.col("a.l_partkey") < SF.col("b.l_partkey"))
        .groupBy(SF.col("a.l_partkey").alias("u"), SF.col("b.l_partkey").alias("v"))
        .agg(SF.count("*").alias("s"))
        .where(SF.col("s") >= 2)
        .select("u", "v")
    )
    core = k_core(edges, k=3)
    rows = core.collect()
    assert all(r.core_degree >= 3 for r in rows)
    # restrict the edge list to core nodes; its 3-core must be the same set
    nodes = core.select(SF.col("node").alias("u"))
    core_edges = edges.join(nodes, "u", "left_semi").join(
        nodes.select(SF.col("u").alias("v")), "v", "left_semi"
    )
    again = {(r.node, r.core_degree) for r in k_core(core_edges, k=3).collect()}
    assert again == {(r.node, r.core_degree) for r in rows}


def test_hits_known_bipartite_graph(spark):
    """Two hubs pointing at one shared authority: the authority converges
    to score 1 and both hubs to 1/sqrt(2) after a single round (and stay
    there — HITS is exact on this graph, no eigen-gap slack needed)."""
    import math

    from map_reduce_engine_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("a", "d")], ["src", "dst"]
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(edges, iterations=5).collect()}
    # auth: c gets both hubs, d only hub a; hub: a points at both auths.
    assert got["c"][1] > got["d"][1] > 0.0
    assert got["a"][0] > got["b"][0] > 0.0
    assert got["c"][0] == 0.0 and got["d"][0] == 0.0  # pure authorities
    assert got["a"][1] == 0.0 and got["b"][1] == 0.0  # pure hubs
    # normalization invariant: both score vectors are unit 2-norm
    for idx in (0, 1):
        assert math.isclose(
            sum(v[idx] ** 2 for v in got.values()), 1.0, rel_tol=1e-9
        )


def test_sssp_known_weighted_graph(spark):
    """Diamond with a cheap 2-hop detour: a->b (1), b->c (1), a->c (5),
    c->d (1). 4 rounds must find the 2-hop path (dist c = 2, not 5), and
    an unreachable isolated edge keeps NULL distance."""
    from map_reduce_engine_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 5), ("c", "d", 1),
         ("x", "y", 1)],
        "src STRING, dst STRING, w BIGINT",
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in sssp(edges, seeds, iterations=4).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "x": None, "y": None}


def test_unigram_train_planted_dominant_piece(spark):
    """A dictionary dominated by 'abab' repetitions must learn 'abab' as
    the cheapest piece and segment 'ababab' as 'ab abab' (min-plus Viterbi
    with the (cost, path) tiebreak) — the planted-structure check for the
    unigram-LM trainer."""
    from map_reduce_engine_spark.operators import unigram_lm

    words = spark.createDataFrame(
        [("abab", 50), ("abx", 10), ("zq", 3), ("ababab", 20)], ["word", "wcnt"]
    )
    kw = dict(n_seed_multi=6, target_multi=4, n_prune_rounds=2, seed_count_floor=1)
    vocab = unigram_lm.unigram_train(words, **kw)
    by_cost = sorted((r.cost, r.piece) for r in vocab.collect())
    assert by_cost[0][1] == "abab", by_cost[:3]
    # the prune schedule reached its target multi-char vocabulary size
    assert sum(len(r.piece) > 1 for r in vocab.collect()) <= 4
    seg = {r.word: r.path for r in unigram_lm.unigram_segment(words, **kw).collect()}
    assert seg["abab"] == "abab"
    assert seg["ababab"] == "ab abab"
    assert seg["zq"] == "z q"  # single-char coverage fallback


def test_unigram_paths_cover_and_reconstruct(spark):
    """Every trainable word gets exactly ONE best path; concatenating the
    path's pieces reconstructs the word; the path cost equals the sum of
    its pieces' costs under the trained vocabulary; words beyond the
    16-char training cap are excluded."""
    from map_reduce_engine_spark.operators import unigram_lm

    words = spark.createDataFrame(
        [("hello", 5), ("help", 4), ("lop", 2), ("x" * 17, 9)], ["word", "wcnt"]
    )
    kw = dict(n_seed_multi=5, target_multi=3, n_prune_rounds=1, seed_count_floor=1)
    vocab = unigram_lm.unigram_train(words, **kw)
    seg = unigram_lm.unigram_segment(words, vocab=vocab)
    rows = seg.collect()
    assert sorted(r.word for r in rows) == ["hello", "help", "lop"]  # cap excludes x*17
    costs = {r.piece: r.cost for r in vocab.collect()}
    for r in rows:
        pieces = r.path.split(" ")
        assert "".join(pieces) == r.word
        assert all(1 <= len(p) <= unigram_lm.PIECE_MAX_LEN for p in pieces)
        assert r.cost == sum(costs[p] for p in pieces)


def test_unigram_prune_schedule_derivation(spark):
    """The prune-round count is a pure function of (seed cap, target):
    prune_rounds_for simulates the exact keep schedule, the module default
    must equal it (the unrolled DuckDB oracle hardcodes the same count —
    a knob change must regenerate both together), the schedule always
    lands EXACTLY on the target when the seed exceeds it, and the trainer
    reaches the target end-to-end without an explicit round count."""
    from map_reduce_engine_spark.operators import unigram_lm
    from map_reduce_engine_spark.queries.retrieval import _UNI_PRUNE_ROUNDS

    assert (
        unigram_lm.prune_rounds_for(unigram_lm.N_SEED_MULTI, unigram_lm.TARGET_MULTI)
        == unigram_lm.N_PRUNE_ROUNDS
        == _UNI_PRUNE_ROUNDS
    )
    for seed, target in [(70, 40), (50_000, 32_000), (12, 5), (5, 5), (3, 8), (1, 1)]:
        r = unigram_lm.prune_rounds_for(seed, target)
        n = seed
        for _ in range(r):
            n = unigram_lm.keep_count(n, target)
        assert n == (target if seed > target else seed), (seed, target, r, n)
        if r > 0:  # minimality: one fewer round must NOT reach the target
            n = seed
            for _ in range(r - 1):
                n = unigram_lm.keep_count(n, target)
            assert n > target, (seed, target, r, n)
    # end-to-end: derived schedule, no explicit n_prune_rounds
    words = spark.createDataFrame(
        [("spark", 7), ("spar", 3), ("park", 5), ("ark", 2), ("rka", 2)],
        ["word", "wcnt"],
    )
    vocab = unigram_lm.unigram_train(
        words, n_seed_multi=12, target_multi=5, seed_count_floor=1
    )
    assert sum(len(r.piece) > 1 for r in vocab.collect()) <= 5


def test_unigram_nbest_rank1_is_viterbi(spark):
    """k-best enumeration consistency: rank-1 rows of nbest_paths equal
    viterbi_paths exactly; every path reconstructs its word from vocab
    pieces with cost = sum of piece costs; rank-2 is (cost, path)-greater
    than rank-1 and distinct; at most k rows per word."""
    from map_reduce_engine_spark.operators import unigram_lm

    words = spark.createDataFrame(
        [("abab", 50), ("abx", 10), ("zq", 3), ("ababab", 20), ("a", 9)],
        ["word", "wcnt"],
    )
    kw = dict(n_seed_multi=6, target_multi=4, n_prune_rounds=2, seed_count_floor=1)
    vocab = unigram_lm.unigram_train(words, **kw)
    tw = unigram_lm.trainable_words(words)
    vit = {r.word: (r.cost, r.path) for r in unigram_lm.viterbi_paths(tw, vocab).collect()}
    rows = unigram_lm.nbest_paths(tw, vocab, k=2).collect()
    costs = {r.piece: r.cost for r in vocab.collect()}
    by_word: dict = {}
    for r in rows:
        by_word.setdefault(r.word, {})[r.rank] = (r.cost, r.path)
        pieces = r.path.split(" ")
        assert "".join(pieces) == r.word
        assert r.cost == sum(costs[p] for p in pieces)
    for w, ranked in by_word.items():
        assert ranked[1] == vit[w], (w, ranked, vit[w])
        assert len(ranked) <= 2
        if 2 in ranked:
            assert ranked[2] > ranked[1]
            assert ranked[2][1] != ranked[1][1]
    # 'ababab' has many segmentations -> a genuine 2nd best must exist
    assert 2 in by_word["ababab"]
    # 'a' has exactly one segmentation -> only rank 1
    assert list(by_word["a"]) == [1]


def test_unigram_sampled_segmentation_draw(spark):
    """The regularization draw is a pure function of the word string:
    sampled path equals the chosen rank's path; single-segmentation words
    always keep rank 1 with p1_micro = 1e6; p1_micro lives in
    [500000, 1000000] (rank 1 is never the less-likely candidate; exactly
    500000 on an equal-cost tie, where only the path string ranked); the
    decision rule is exactly draw >= p1 -> rank 2; and two runs are
    identical."""
    from map_reduce_engine_spark.operators import unigram_lm

    words = spark.createDataFrame(
        [("abab", 50), ("abx", 10), ("zq", 3), ("ababab", 20), ("a", 9)],
        ["word", "wcnt"],
    )
    kw = dict(n_seed_multi=6, target_multi=4, n_prune_rounds=2, seed_count_floor=1)
    vocab = unigram_lm.unigram_train(words, **kw)
    tw = unigram_lm.trainable_words(words)
    nb = unigram_lm.nbest_paths(tw, vocab, k=2).localCheckpoint(eager=True)
    ranked = {}
    for r in nb.collect():
        ranked.setdefault(r.word, {})[r.rank] = (r.cost, r.path)
    a = {r.word: tuple(r) for r in unigram_lm.sampled_segmentations(nb).collect()}
    b = {r.word: tuple(r) for r in unigram_lm.sampled_segmentations(nb).collect()}
    assert a == b  # deterministic
    for w, (word, wcnt, p1, draw, srank, cost, path) in a.items():
        assert 500_000 <= p1 <= 1_000_000, (w, p1)
        assert 0 <= draw < 1_000_000
        if 2 in ranked[w]:
            assert srank == (2 if draw >= p1 else 1), (w, draw, p1, srank)
        else:
            assert srank == 1 and p1 == 1_000_000
        assert (cost, path) == ranked[w][srank], (w, srank)
    assert a["a"][4] == 1  # single segmentation -> rank 1


def test_unigram_sampled_segmentation_salt(spark):
    """The per-epoch re-salt knob (VERDICT r08 ask #3): salt=0 is exactly
    the unsalted draw (the registry pin); different salts produce
    different draws for some word; and across many salts the rank-1
    pick frequency approximates the softmax weight p1 (the distribution
    Kudo §3 samples from), since the salted md5 draws are uniform."""
    from map_reduce_engine_spark.operators import unigram_lm

    # words chosen to have genuine 2-candidate lists under a tiny vocab
    rows = [(w, 10 + i) for i, w in enumerate(
        ["abab", "ababab", "abx", "abba", "baba", "aabb", "bbaa", "abab" + "a"]
    )]
    words = spark.createDataFrame(rows, ["word", "wcnt"])
    kw = dict(n_seed_multi=6, target_multi=4, n_prune_rounds=2, seed_count_floor=1)
    vocab = unigram_lm.unigram_train(words, **kw)
    tw = unigram_lm.trainable_words(words)
    nb = unigram_lm.nbest_paths(tw, vocab, k=2).localCheckpoint(eager=True)

    base = {r.word: tuple(r) for r in unigram_lm.sampled_segmentations(nb).collect()}
    zero = {
        r.word: tuple(r)
        for r in unigram_lm.sampled_segmentations(nb, salt=0).collect()
    }
    assert base == zero  # default pin preserved

    two_cand = {w for w, t in base.items() if t[2] < 1_000_000}  # p1 < 1e6
    assert two_cand, "fixture must produce 2-candidate words"
    n_salts = 24
    picks, p1s = [], []
    seen_diff = False
    for s in range(1, n_salts + 1):
        drawn = {
            r.word: (r.p1_micro, r.sampled_rank)
            for r in unigram_lm.sampled_segmentations(nb, salt=s).collect()
        }
        for w in two_cand:
            p1, rank = drawn[w]
            picks.append(1 if rank == 1 else 0)
            p1s.append(p1 / 1e6)
            if rank != base[w][4]:
                seen_diff = True
    assert seen_diff, "no draw ever differed from the unsalted pick across 24 salts"
    share = sum(picks) / len(picks)
    expect = sum(p1s) / len(p1s)
    # ~100+ uniform draws: binomial std < 0.05, so 0.15 is a safe band
    assert abs(share - expect) < 0.15, (share, expect)


def test_unigram_train_deterministic(spark):
    """Two independent trainings on the same dictionary produce the
    identical vocabulary (counts, costs) — the engine/run/partitioning
    independence the oracle comparison relies on."""
    from map_reduce_engine_spark.operators import unigram_lm

    words = spark.createDataFrame(
        [("spark", 7), ("spar", 3), ("park", 5), ("ark", 2)], ["word", "wcnt"]
    )
    kw = dict(n_seed_multi=8, target_multi=4, n_prune_rounds=2, seed_count_floor=1)
    a = sorted(map(tuple, unigram_lm.unigram_train(words, **kw).collect()))
    b = sorted(
        map(tuple, unigram_lm.unigram_train(words.repartition(7), **kw).collect())
    )
    assert a == b


@pytest.mark.indexes
def test_index_params_travel_with_the_build_not_the_writer(spark, tmp_path):
    """ADVICE r10 (medium): a NON-DEFAULT build written without forwarding
    its knobs must record the build's true parameters — the build
    annotates them on the frame and the writer consumes the annotation.
    The exact failure this closes: defaults recorded for a (8,8)-banded
    index, so the read-time assertion rejected the CORRECT probe and
    silently blessed a default-banded one."""
    from map_reduce_engine_spark.operators.dedup import (
        build_band_index,
        build_token_table,
        read_band_index,
        read_token_table,
        write_band_index,
        write_token_table,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(5)],
        ["doc_id", "text"],
    )
    try:
        # non-default banding, writer NOT told about it
        write_band_index(
            build_band_index(docs, "doc_id", "text", bands=8, rows_per_band=8),
            "prov_bands_test",
            path=str(tmp_path / "bands"),
            n_buckets=4,
        )
        # the CORRECT probe passes; the default-banded probe is rejected
        read_band_index(spark, "prov_bands_test", bands=8, rows_per_band=8)
        with pytest.raises(ValueError, match="mre.bands"):
            read_band_index(spark, "prov_bands_test")
        # a writer override CONTRADICTING the build annotation is loud
        with pytest.raises(ValueError, match="annotation is authoritative"):
            write_band_index(
                build_band_index(docs, "doc_id", "text", bands=8, rows_per_band=8),
                "prov_bands_test2",
                path=str(tmp_path / "bands2"),
                bands=16,
            )
        # same contract for the token table's tokenization unit
        write_token_table(
            build_token_table(docs, "doc_id", "text", shingle_n=3),
            "prov_toks_test",
            path=str(tmp_path / "toks"),
            n_buckets=4,
        )
        read_token_table(spark, "prov_toks_test", shingle_n=3)
        with pytest.raises(ValueError, match="shingle_n"):
            read_token_table(spark, "prov_toks_test")
        with pytest.raises(ValueError, match="annotation is authoritative"):
            write_token_table(
                build_token_table(docs, "doc_id", "text", shingle_n=3),
                "prov_toks_test2",
                path=str(tmp_path / "toks2"),
                shingle_n=None,
            )
    finally:
        for t in ("prov_bands_test", "prov_bands_test2", "prov_toks_test", "prov_toks_test2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.indexes
def test_index_params_survive_read_rollforward_union_rewrite(spark, tmp_path):
    """The roll-forward loop keeps provenance: day 2 reads the stored
    (non-default) index, unions a guarded batch in, and writes tomorrow's
    table WITHOUT restating any knobs — the read-back re-annotation must
    carry the build's parameters through the union into the new table."""
    from map_reduce_engine_spark.operators.dedup import (
        build_band_index,
        read_band_index,
        roll_forward_guard,
        write_band_index,
    )

    day1 = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(5)],
        ["doc_id", "text"],
    )
    day2 = spark.createDataFrame(
        [(100 + i, " ".join(f"z{(i * 5 + j) % 37}" for j in range(30))) for i in range(3)],
        ["doc_id", "text"],
    )
    try:
        write_band_index(
            build_band_index(day1, "doc_id", "text", bands=8, rows_per_band=8),
            "prov_roll_test",
            path=str(tmp_path / "roll"),
            n_buckets=4,
        )
        stored = read_band_index(spark, "prov_roll_test", bands=8, rows_per_band=8)
        batch = build_band_index(day2, "doc_id", "text", bands=8, rows_per_band=8)
        rolled = stored.unionByName(roll_forward_guard(batch, stored, ["id"]))
        write_band_index(
            rolled, "prov_roll_test_next", path=str(tmp_path / "roll_next"), n_buckets=4
        )
        # tomorrow's table still records the (8,8) build — NOT the defaults
        read_band_index(spark, "prov_roll_test_next", bands=8, rows_per_band=8)
        with pytest.raises(ValueError, match="mre.bands"):
            read_band_index(spark, "prov_roll_test_next")
    finally:
        for t in ("prov_roll_test", "prov_roll_test_next"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.indexes
def test_register_bucketed_table_allows_parameterized_types(spark, tmp_path):
    """ADVICE r10: the recovery DDL must accept parameterized column types
    (DECIMAL(10,2), ARRAY<DOUBLE>, MAP<STRING,INT>) — the previous blanket
    paren ban over-blocked legitimate schemas — while unbalanced brackets
    (the injection shape) and statement punctuation stay loud errors."""
    from map_reduce_engine_spark.operators.dedup import (
        register_bucketed_table,
    )

    # a real round-trip with a DECIMAL column
    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], "h BIGINT, score DOUBLE").selectExpr(
        "h", "CAST(score AS DECIMAL(10,2)) AS score"
    )
    path = str(tmp_path / "decidx")
    df.write.format("parquet").bucketBy(4, "h").sortBy("h").option(
        "path", path
    ).saveAsTable("dec_idx_test")
    try:
        spark.sql("DROP TABLE dec_idx_test")  # registration lost, files remain
        back = register_bucketed_table(
            spark,
            "dec_idx_test",
            path,
            "h BIGINT, score DECIMAL(10,2)",
            ["h"],
            n_buckets=4,
        )
        assert back.count() == 2
        cols = {c.name: c for c in spark.catalog.listColumns("dec_idx_test")}
        assert cols["h"].isBucket
        # nested generics with inner commas are fine too (validation only)
        from map_reduce_engine_spark.operators.dedup import _validate_columns_sql

        _validate_columns_sql("id BIGINT, emb ARRAY<DOUBLE>, m MAP<STRING,INT>")
        _validate_columns_sql("v VARCHAR(64), d DECIMAL(10,2)")
        for bad in (
            "h BIGINT) LOCATION '/x'",   # quote + unbalanced
            "h BIGINT)",                  # unbalanced close
            "h DECIMAL(10,2",             # unbalanced open
            "h BIGINT; DROP TABLE x",     # statement punctuation
            "h",                          # not an ident TYPE pair
            "1h BIGINT",                  # bad identifier
        ):
            with pytest.raises(ValueError):
                _validate_columns_sql(bad)
    finally:
        spark.sql("DROP TABLE IF EXISTS dec_idx_test")


@pytest.mark.indexes
def test_read_index_warns_on_unprotected_tables(spark, tmp_path):
    """ADVICE r10: a property-less (legacy / hand-registered) table passes
    through at the caller's word — but LOUDLY, with a UserWarning, so the
    unprotected state is never mistaken for an asserted one."""
    import warnings as _w

    from map_reduce_engine_spark.operators.dedup import (
        build_band_index,
        build_token_table,
        read_band_index,
        read_token_table,
        register_bucketed_table,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(5)],
        ["doc_id", "text"],
    )
    bpath, tpath = str(tmp_path / "wb"), str(tmp_path / "wt")
    build_band_index(docs, "doc_id", "text").write.format("parquet").bucketBy(
        4, "band", "bucket"
    ).sortBy("band", "bucket").option("path", bpath).saveAsTable("warn_bands_raw")
    build_token_table(docs, "doc_id", "text").write.format("parquet").bucketBy(
        4, "id"
    ).sortBy("id").option("path", tpath).saveAsTable("warn_toks_raw")
    try:
        spark.sql("DROP TABLE warn_bands_raw")
        spark.sql("DROP TABLE warn_toks_raw")
        register_bucketed_table(
            spark, "warn_bands_raw", bpath,
            "id BIGINT, band INT, bucket BIGINT", ["band", "bucket"], n_buckets=4,
        )
        register_bucketed_table(
            spark, "warn_toks_raw", tpath,
            "id BIGINT, toks ARRAY<STRING>", ["id"], n_buckets=4,
        )
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            read_band_index(spark, "warn_bands_raw")
            read_token_table(spark, "warn_toks_raw")
        msgs = [str(r.message) for r in rec if issubclass(r.category, UserWarning)]
        assert any("no recorded banding parameters" in m for m in msgs)
        assert any("no recorded tokenization unit" in m for m in msgs)
    finally:
        for t in ("warn_bands_raw", "warn_toks_raw"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.indexes
def test_ivf_dim_mismatch_is_loud(spark, sf_dir):
    """A batch/query set whose vectors don't match the trained centroids'
    dimensionality must fail with a diagnosis naming both dims — not a
    numpy reshape traceback in an executor, and never a silent corrupt
    roll (the ANN twin of the mismatched-banding loud error)."""
    from py4j.protocol import Py4JJavaError

    from map_reduce_engine_spark.operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    centers, cb = sim.ivf_train_assign(
        emb.where(F.col("vec_id") >= 100), "vec_id", "embedding", n_cells=8
    )
    bad = emb.where(F.col("vec_id") < 5).select(
        "vec_id", F.slice("embedding", 1, 8).alias("embedding")
    )
    with pytest.raises(Exception, match="dim-64"):
        try:
            sim.ivf_topk(
                None, bad, "vec_id", "embedding", k=3, index=(centers, cb)
            ).collect()
        except Py4JJavaError as e:  # surface the executor-side ValueError text
            raise AssertionError(str(e)) from e
    with pytest.raises(Exception, match="dim-64"):
        try:
            sim.ivf_roll_forward((centers, cb), bad, "vec_id", "embedding")[1].count()
        except Py4JJavaError as e:
            raise AssertionError(str(e)) from e
