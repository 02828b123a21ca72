"""Conformance tests for the map/reduce UDF compat surface (mapreduce.py) —
the reference's query language (MapRunner/ReduceRunner analogue).

Goldens are computed independently with collections.Counter, mirroring the
reference's implied correctness properties (SURVEY.md §5: output equals the
token multiset count, order-insensitive).
"""

from __future__ import annotations

from collections import Counter

import pytest

from map_reduce_engine_spark import mapreduce
from map_reduce_engine_spark.operators import text as text_ops

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop

# inputdir3-shaped prose fixture (FIXTURES.md §1): repeated words, hyphenated
# words (reference's hyphen-key bug is NOT replicated), multi-space runs.
PROSE = [
    "the quick brown fox jumps over the lazy dog",
    "the  quick\nbrown\tfox",  # whitespace runs: spaces, newline, tab
    "state-of-the-art systems are state-of-the-art",
    "",
    "   ",
    "one",
]


@pytest.fixture(scope="module")
def prose_df(spark):
    return spark.createDataFrame([(s,) for s in PROSE], ["value"])


def golden_wordcount():
    return Counter(w for line in PROSE for w in line.split())


def test_wordcount_compat_matches_counter(spark, prose_df):
    out = {r.key: r.value for r in mapreduce.wordcount_job(prose_df).collect()}
    assert out == dict(golden_wordcount())
    # hyphenated keys survive intact (reference bug §1.3 not replicated)
    assert out["state-of-the-art"] == 2


def test_wordcount_declarative_equals_compat(spark, prose_df):
    declarative = {
        (r.word, r.cnt) for r in text_ops.wordcount(prose_df, "value").collect()
    }
    compat = {(r.key, r.value) for r in mapreduce.wordcount_job(prose_df).collect()}
    assert declarative == compat


def test_wordlength_compat(spark, prose_df):
    golden = Counter(len(w) for line in PROSE for w in line.split())
    out = {r.key: r.value for r in mapreduce.wordlength_job(prose_df).collect()}
    assert out == dict(golden)


def test_map_reduce_custom_job(spark):
    """A custom job exercising flatMap semantics (0..n emissions per record)
    and a reducer that aggregates non-trivially (max)."""
    df = spark.createDataFrame([("a,1 b,2",), ("a,5",), ("skip",)], ["value"])

    def mapper(line):
        for tok in line.split():
            if "," in tok:
                k, v = tok.split(",")
                yield k, int(v)

    def reducer(key, values):
        yield key, max(values)

    out = mapreduce.map_reduce(
        df, mapper, reducer, map_key_type="text", map_value_type="long"
    )
    assert {(r.key, r.value) for r in out.collect()} == {("a", 5), ("b", 2)}


def test_final_merge_add_interface_sum(spark):
    """AddInterface numeric merge (ReduceRunner.java:154-172): reducer emits
    a re-keyed output landing on overlapping keys; final_merge sums them."""
    df = spark.createDataFrame([("x 1", ), ("y 2",), ("z 3",)], ["value"])

    def mapper(line):
        k, v = line.split()
        yield k, int(v)

    def reducer(key, values):
        # re-key everything to one bucket — multiple reduce calls emit 'all'
        yield "all", sum(values)

    merged = mapreduce.map_reduce(
        df, mapper, reducer, map_key_type="text", map_value_type="long", final_merge=True
    )
    assert [(r.key, r.value) for r in merged.collect()] == [("all", 6)]


def test_final_merge_add_interface_concat(spark):
    """AddInterface Text merge is string concatenation (Text.java:28-32)."""
    df = spark.createDataFrame([("k a",), ("k b",)], ["value"])

    def mapper(line):
        k, v = line.split()
        yield k, v

    def reducer(key, values):
        for v in sorted(values):
            yield "out", v

    merged = mapreduce.map_reduce(
        df,
        mapper,
        reducer,
        map_key_type="text",
        map_value_type="text",
        out_value_type="text",
        final_merge=True,
    )
    rows = merged.collect()
    assert len(rows) == 1
    assert rows[0].key == "out"
    assert sorted(rows[0].value) == ["a", "b"]  # concat order unspecified, content exact


def test_num_reducers_repartition(spark, prose_df):
    out = mapreduce.wordcount_job(prose_df.repartition(4))
    out2 = mapreduce.map_reduce(
        prose_df.select("value"),
        mapreduce.wordcount_mapper,
        mapreduce.wordcount_reducer,
        num_reducers=2,
    )
    assert {(r.key, r.value) for r in out.collect()} == {(r.key, r.value) for r in out2.collect()}


def test_writable_type_mapping():
    assert mapreduce.WRITABLES["int"] == ("int", "sum")
    assert mapreduce.WRITABLES["text"] == ("string", "concat")
    assert mapreduce._sql_type("double") == "double"
    assert mapreduce._add_semantics("text") == "concat"
