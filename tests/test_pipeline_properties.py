"""Property tests for the training-pipeline operators (hypothesis).

These pin the GUARANTEES the conformance queries rely on, over arbitrary
inputs — not just the fixture corpus:
- winnowing: any two documents sharing a contiguous token run of length
  ≥ w + k - 1 share at least one selected fingerprint (Schleimer et al.,
  SIGMOD'03 — the property that makes winnowed fingerprints a sound
  near-dup blocking key);
- packing: bins respect the budget up to the last item's overhang, and bin
  ids are contiguous from 0 per group.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


@settings(max_examples=10, deadline=None)
@given(
    prefix_a=st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
    shared=st.lists(st.sampled_from(WORDS), min_size=7, max_size=10),  # ≥ w+k-1 = 7
    suffix_b=st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
)
def test_winnowing_shared_run_guarantee(spark_global, prefix_a, shared, suffix_b):
    """Docs built around a shared ≥7-token run must share a fingerprint."""
    from map_reduce_engine_spark.operators.packing import winnow_fingerprints

    doc_a = " ".join(prefix_a + shared)
    doc_b = " ".join(shared + suffix_b)
    df = spark_global.createDataFrame([(1, doc_a), (2, doc_b)], ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
    set_a = {r.fp for r in fps if r.id == 1}
    set_b = {r.fp for r in fps if r.id == 2}
    assert set_a & set_b, (doc_a, doc_b)


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=150), min_size=1, max_size=40),
    budget=st.integers(min_value=150, max_value=300),  # every item fits the budget
)
def test_packing_budget_and_contiguity(spark_global, sizes, budget):
    """With every item within budget: each bin's total < budget + its max
    item (boundary-straddle bound) and bin ids are contiguous from 0
    (oversized items legitimately skip ids — see pack_bins docstring)."""
    from pyspark.sql import functions as F

    from map_reduce_engine_spark.operators.packing import pack_bins

    df = spark_global.createDataFrame(
        [("g", i, s) for i, s in enumerate(sizes)], ["grp", "ord", "size"]
    )
    packed = pack_bins(df, "grp", "ord", "size", budget=budget)
    bins = (
        packed.groupBy("bin_id")
        .agg(F.sum("size").alias("total"), F.max("size").alias("mx"))
        .collect()
    )
    ids = sorted(r.bin_id for r in bins)
    assert ids == list(range(len(ids)))  # contiguous from 0
    for r in bins:
        assert r.total < budget + r.mx, (r.bin_id, r.total, budget, r.mx)


@settings(max_examples=10, deadline=None)
@given(
    tokens=st.lists(st.sampled_from(WORDS), min_size=1, max_size=200),
)
def test_cms_never_underestimates(spark_global, tokens):
    """CMS guarantee: for ANY multiset, every point estimate >= the true
    count (counters only ever add), and the total per depth row is exactly
    the occurrence count (additive, mergeable state)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from map_reduce_engine_spark.operators.sketch import cms_point_estimates, cms_table

    items = spark_global.createDataFrame([(w,) for w in tokens], ["token"])
    sketch = cms_table(items, "token", depth=4, width=32).cache()
    per_depth = {
        r.d: r.total
        for r in sketch.groupBy("d").agg(F.sum("c").alias("total")).collect()
    }
    assert set(per_depth.values()) == {len(tokens)}
    probes = items.distinct()
    est = {
        r.item: r.cms_estimate
        for r in cms_point_estimates(sketch, probes, "token", depth=4, width=32).collect()
    }
    truth = Counter(tokens)
    for tok, n in truth.items():
        assert est[tok] >= n
    sketch.unpersist()


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer (Sennrich et al., ACL'16): greedy
    leftmost non-overlapping merges, argmax tiebreak (count desc, lhs, rhs).
    ASCII inputs, so Python string order == Spark/DuckDB binary order."""
    symtab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, cnt in words.items():
            syms = symtab[w]
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        for w, syms in symtab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return merges


@settings(max_examples=8, deadline=None)
@given(
    entries=st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=5,
    ),
)
def test_bpe_matches_reference_trainer(spark_global, entries):
    """The relational BPE loop must produce EXACTLY the merges of a direct
    sequential implementation on any dictionary — same argmax tiebreak,
    same greedy leftmost non-overlapping application (the run-grouping
    window encoding), including overlapping-pair words like 'aaaa'."""
    from map_reduce_engine_spark.operators.bpe import bpe_train

    words = dict(entries)  # last count wins on duplicate words, like a dict
    expected = _ref_bpe(words, 3)
    df = spark_global.createDataFrame(list(words.items()), ["word", "wcnt"])
    got = [tuple(r) for r in bpe_train(df, n_merges=3).orderBy("round").collect()]
    assert got == expected, (words, got, expected)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=4,
    ),
)
def test_skipgram_counts_match_reference(spark_global, texts):
    """Pair counts from the array-transform generation must equal a direct
    Python enumeration of forward window-2 pairs — including empty,
    1-token, and 2-token documents (the descending-sequence edge)."""
    from collections import Counter

    from map_reduce_engine_spark.operators.text import skipgram_pairs

    expected = Counter()
    for text in texts:
        toks = text.split()
        for i, w1 in enumerate(toks):
            for d in (1, 2):
                if i + d < len(toks):
                    expected[(w1, toks[i + d])] += 1
    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = skipgram_pairs(df, "doc_id", "text", window=2, min_count=1).collect()
    got = {(r.w1, r.w2): r.pair_cnt for r in rows}
    assert got == dict(expected), (texts, got, dict(expected))


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abcdxyz", min_size=1, max_size=10),
            st.integers(min_value=1, max_value=99),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
def test_unigram_viterbi_coverage_and_optimality(spark_global, words):
    """Unigram-LM trainer guarantees over arbitrary dictionaries: every
    word gets exactly one best path; the path reconstructs the word from
    <=4-char vocab pieces; its cost equals the sum of piece costs; and NO
    cheaper two-piece split exists at any cut point (local optimality of
    the min-plus DP — a full exactness check would re-run the DP, but the
    single-cut bound already fails on any broken squaring round)."""
    from map_reduce_engine_spark.operators import unigram_lm

    df = spark_global.createDataFrame(words, ["word", "wcnt"])
    vocab = unigram_lm.unigram_train(
        df, n_seed_multi=8, target_multi=4, n_prune_rounds=1, seed_count_floor=1
    )
    seg = unigram_lm.unigram_segment(df, vocab=vocab)
    costs = {r.piece: r.cost for r in vocab.collect()}
    rows = seg.collect()
    assert sorted(r.word for r in rows) == sorted(w for w, _ in words)
    for r in rows:
        pieces = r.path.split(" ")
        assert "".join(pieces) == r.word
        assert r.cost == sum(costs[p] for p in pieces)
        # local optimality: no single piece-pair split beats the DP result
        n = len(r.word)
        if 2 <= n <= 8:
            best_two = min(
                (
                    costs[r.word[:c]] + costs[r.word[c:]]
                    for c in range(1, n)
                    if r.word[:c] in costs and r.word[c:] in costs
                ),
                default=None,
            )
            if best_two is not None:
                assert r.cost <= best_two
