"""Portable Bloom filter as DataFrame state — the join-prefilter primitive.

Spark ships ``bloom_filter_agg`` internally (used by runtime row-group
skipping) but does not expose it in the public function registry, and its
binary sketch is engine-private anyway. This Bloom filter is built from
the repo's portable hash family instead (31-bit md5 base + affine
re-hashes, exactly like MinHash signatures), with the bit array stored as
rows of ``(word_idx, word)`` BIGINTs — so it is:

- **mergeable**: shard filters union with ``bit_or`` per word (the sketch
  partial-aggregation property — build per partition/day, OR together);
- **engine-portable / oracle-checkable**: DuckDB recomputes the identical
  bits, so membership answers — including which keys false-positive — are
  bit-for-bit reproducible;
- **joinable**: the probe is an equi-join on ``word_idx`` + one bitmask
  check, no UDF, no driver-side filter object.

Words hold 63 usable bits (bit 63 stays clear: DuckDB's checked ``<<``
raises on the sign bit — the activity_bitmap_rollup lesson).

Sizing: ``bits_per_key=10`` with ``k=5`` probes gives FPR ≈ (1-e^{-1/2})^5
≈ 0.94%; the bit count grows linearly with the key count (computed from a
1-row COUNT DISTINCT aggregate, broadcast into the hash expressions), so
the filter keeps its error rate at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.dedup import minhash_family

_MASK31 = (1 << 31) - 1
WORD_BITS = 63


def _base31(key: Column) -> Column:
    """Portable 31-bit hash base of a key (md5-prefix, engine-identical)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_MASK31))
    )


def _positions(df: DataFrame, key_col: str, m_bits_col: str, k: int) -> DataFrame:
    """(key, p) — the k bit positions of each key, given the filter width
    carried in column ``m_bits_col`` (a broadcast-joined 1-row value)."""
    av, bv = minhash_family(k)
    base = _base31(F.col(key_col))
    pos = F.array(
        *[
            ((F.lit(av[i]) * base + F.lit(bv[i])).bitwiseAND(F.lit(_MASK31)))
            % F.col(m_bits_col)
            for i in range(k)
        ]
    )
    return df.select(F.col(key_col).alias("key"), F.explode(pos).alias("p"))


def bloom_words(keys: DataFrame, key_col: str, m_bits_col: str, k: int = 5) -> DataFrame:
    """(word_idx, word) — the filter's bit array from a key DataFrame.

    ``keys`` must already carry the filter width in ``m_bits_col``. One
    explode + one ``bit_or`` hash aggregate; at most ``m_bits/63`` rows
    regardless of key count, and shard filters merge with ``bit_or``.
    """
    pos = _positions(keys, key_col, m_bits_col, k)
    return pos.groupBy(F.expr(f"p div {WORD_BITS}").alias("word_idx")).agg(
        F.bit_or(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT))")
        ).alias("word")
    )


def bloom_probe(
    probes: DataFrame, key_col: str, words: DataFrame, m_bits_col: str, k: int = 5
) -> DataFrame:
    """(key, maybe_member) — membership test for every probe key.

    Probe positions aggregate to per-(key, word) need-masks, equi-join the
    filter's words, and a key passes iff every needed bit is set in every
    touched word (``bool_and``). Missing words mean unset bits: LEFT join
    + coalesce(0).
    """
    pos = _positions(probes, key_col, m_bits_col, k)
    need = pos.groupBy(
        "key", F.expr(f"p div {WORD_BITS}").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT))")
        ).alias("need")
    )
    hit = need.join(words, "word_idx", "left").select(
        "key",
        (
            F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("need"))
            == F.col("need")
        ).alias("ok"),
    )
    return hit.groupBy("key").agg(F.bool_and("ok").alias("maybe_member"))
